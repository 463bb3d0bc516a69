"""$htmlStrip / $entropyScore / $piiStats — markup, entropy and PII-density
signals for corpus curation (r5 additions; DuckDB parity in
test_oracle_parity.py — these are the edge cases parity can't reach)."""

import math

import pytest
from pyspark.sql import Row

from pincette_mongo_streams_spark import Context, compile_pipeline


def _one(spark, stage, text, field):
    df = spark.createDataFrame([Row(doc_id=1, text=text)],
                               "doc_id long, text string")
    out = compile_pipeline([stage], Context(spark=spark))(df)
    return out.collect()[0][field]


# ------------------------------------------------------------- $htmlStrip


def _strip(spark, text):
    return _one(spark, {"$htmlStrip": {"input": "$text", "as": "h"}},
                text, "h")


def test_html_strip_tags_and_entities(spark):
    h = _strip(spark, '<p class="a">Tom &amp; Jerry</p><br/>')
    assert h.clean_text == "Tom & Jerry"
    assert h.n_tags == 3
    assert h.markup_ratio > 0.5


def test_html_strip_drops_script_and_style_bodies(spark):
    h = _strip(spark, "<style>p{x}</style>keep<script>var a=1;\n"
                      "if(a<2){a++}</script>also")
    # the script body (including its '<' comparison) is gone wholesale
    assert h.clean_text == "keep also"


def test_html_strip_plain_text_is_identity(spark):
    h = _strip(spark, "no markup here, just 1 < 2 prose")
    # a bare '<' with no closing '>' on the line is not a tag
    assert h.clean_text == "no markup here, just 1 < 2 prose"
    assert h.n_tags == 0
    assert h.markup_ratio == 0.0


def test_html_strip_empty_and_null(spark):
    h = _strip(spark, "")
    assert h.clean_text == "" and h.n_tags == 0 and h.markup_ratio == 0.0
    h = _strip(spark, None)
    # all three signals propagate null — a null doc must not read as
    # "perfectly clean prose" to a markup_ratio filter
    assert h.clean_text is None and h.n_tags is None
    assert h.markup_ratio is None


def test_html_strip_no_double_decode(spark):
    # "&amp;lt;" is a page DISPLAYING the literal "&lt;" — &amp; decodes
    # last, so it must not collapse to "<"
    h = _strip(spark, "literal &amp;lt; stays, plain &lt; decodes")
    assert h.clean_text == "literal &lt; stays, plain < decodes"


# ---------------------------------------------------------- $entropyScore


def _entropy(spark, text, **opts):
    return _one(
        spark,
        {"$entropyScore": {"input": "$text", "as": "e", **opts}},
        text, "e")


def test_entropy_uniform_chars(spark):
    # 4 distinct chars, equal counts -> exactly 2 bits
    assert _entropy(spark, "aabbccdd") == 2.0


def test_entropy_single_symbol_is_zero(spark):
    assert _entropy(spark, "aaaaaaaa") == 0.0


def test_entropy_matches_python(spark):
    text = "abracadabra"
    n = len(text)
    h = -sum(
        text.count(ch) / n * math.log2(text.count(ch) / n)
        for ch in set(text)
    )
    assert _entropy(spark, text) == pytest.approx(h, abs=1e-6)


def test_entropy_word_unit(spark):
    # 3 words, one repeated: p = (2/3, 1/3)
    h = -(2 / 3 * math.log2(2 / 3) + 1 / 3 * math.log2(1 / 3))
    assert _entropy(spark, "to be  to", unit="word") == \
        pytest.approx(h, abs=1e-6)


def test_entropy_empty_and_null(spark):
    assert _entropy(spark, "") == 0.0
    assert _entropy(spark, None) is None


def test_entropy_rejects_unknown_unit(spark):
    with pytest.raises(ValueError, match="unit"):
        _entropy(spark, "x", unit="byte")


# ------------------------------------------------------------- $piiStats


def _pii(spark, text):
    return _one(spark, {"$piiStats": {"input": "$text", "as": "p"}},
                text, "p")


def test_pii_stats_counts_each_rule(spark):
    p = _pii(spark, "a@b.co and c@d.io via https://x.io from 10.0.0.1 "
                    "call +1 (555) 123-4567")
    assert (p.email, p.url, p.ip) == (2, 1, 1)
    assert p.phone >= 1
    assert p.total == p.email + p.url + p.ip + p.phone
    assert p.has_pii


def test_pii_stats_clean_text(spark):
    p = _pii(spark, "ordinary prose, nothing to see")
    assert (p.email, p.url, p.ip, p.phone, p.total) == (0, 0, 0, 0, 0)
    assert not p.has_pii


def test_pii_stats_counts_are_independent_per_rule(spark):
    # an email inside a URL counts under BOTH rules (unlike $scrubText's
    # ordered rewrite) — documented triage semantics
    p = _pii(spark, "see https://x.io/mail?to=a@b.co now")
    assert p.url == 1 and p.email == 1


# --------------------------------------------- $shuffle / $truncateTokens


def test_shuffle_matches_python_permutation(spark):
    import hashlib

    df = spark.createDataFrame([(i, f"d{i}") for i in range(50)],
                               "doc_id long, text string")
    out = compile_pipeline(
        [{"$shuffle": {"id": "$doc_id", "seed": 3}}],
        Context(spark=spark))(df)
    got = [r.doc_id for r in out.collect()]

    def key(i):
        return int(hashlib.md5(f"3:{i}".encode()).hexdigest()[:15], 16)

    assert got == sorted(range(50), key=key)
    # a different seed is an independent permutation
    out2 = compile_pipeline(
        [{"$shuffle": {"id": "$doc_id", "seed": 4}}],
        Context(spark=spark))(df)
    assert [r.doc_id for r in out2.collect()] != got


def _trunc(spark, text, **opts):
    return _one(spark,
                {"$truncateTokens": {"input": "$text", "as": "t", **opts}},
                text, "t")


def test_truncate_tokens(spark):
    assert _trunc(spark, "a  b\tc d e", max=3) == "a b c"
    assert _trunc(spark, "a b", max=5) == "a b"  # shorter than budget
    assert _trunc(spark, "", max=3) == ""
    assert _trunc(spark, None, max=3) is None


def test_truncate_chars(spark):
    assert _trunc(spark, "abcdef", max=4, unit="chars") == "abcd"
    assert _trunc(spark, None, max=4, unit="chars") is None


def test_truncate_validation(spark):
    with pytest.raises(ValueError, match="max"):
        _trunc(spark, "x", max=0)
    with pytest.raises(ValueError, match="unit"):
        _trunc(spark, "x", max=1, unit="bytes")


def test_unit_spelling_is_forgiving(spark):
    # the family accepts both singular and plural for the same knob
    assert _trunc(spark, "a b c", max=2, unit="token") == "a b"
    assert _trunc(spark, "abc", max=2, unit="char") == "ab"
    assert _entropy(spark, "aabb", unit="chars") == 1.0
    assert _entropy(spark, "x y x y", unit="words") == 1.0


def test_shuffle_ties_break_on_id(spark):
    # duplicate ids (hash ties) still order deterministically across
    # repartitionings — the id string is the secondary sort key
    rows = [(i % 5, f"t{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    p = [{"$shuffle": {"id": "$doc_id", "seed": 1}}]
    a = [(r.doc_id, r.text) for r in
         compile_pipeline(p, Context(spark=spark))(df).collect()]
    b = [(r.doc_id, r.text) for r in
         compile_pipeline(p, Context(spark=spark))(
             df.repartition(7)).collect()]
    assert [x[0] for x in a] == [x[0] for x in b]


# ----------------------------------- randomized differential (vs Python)


def test_html_strip_matches_python_reference(spark):
    """Seeded random markup soup: Spark's regexp chain must equal a
    literal Python re implementation of the same spec (guards regex
    dialect drift beyond the fixed-corpus oracle)."""
    import random
    import re

    rng = random.Random(515)
    pieces = ["plain", "a &amp; b", "&lt;code&gt;", "<b>", "</b>",
              "<script>var x=1;</script>", "<style>p{c}</style>",
              "<p class='x'>", "</p>", "1 < 2", "x > y", "&nbsp;",
              "&#39;q&#39;", "  ", "\n", "word"]
    docs = [" ".join(rng.choice(pieces)
                     for _ in range(rng.randint(0, 12)))
            for _ in range(200)]

    def py_strip(p):
        c = p
        for block in ("script", "style"):
            c = re.sub(rf"(?is)<{block}[^>]*>.*?</{block}>", " ", c)
        c = re.sub(r"<[^>]*>", " ", c)
        for ent, rep in [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                         ("&#39;", "'"), ("&apos;", "'"), ("&nbsp;", " "),
                         ("&amp;", "&")]:
            c = c.replace(ent, rep)
        return re.sub(r"\s+", " ", c).strip()

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string")
    out = compile_pipeline(
        [{"$htmlStrip": {"input": "$text", "as": "h"}}],
        Context(spark=spark))(df)
    for r in out.sort("doc_id").collect():
        d = docs[r.doc_id]
        assert r.h.clean_text == py_strip(d), repr(d)
        assert r.h.n_tags == len(re.findall(r"<[^>]*>", d)), repr(d)


def test_pii_stats_matches_python_reference(spark):
    import random
    import re

    from pincette_mongo_streams_spark.functions.datapipe import SCRUB_RULES

    rng = random.Random(516)
    pieces = ["text", "a.b-c@mail.example.co", "http://x.io/p?q=1",
              "https://y.org", "10.0.0.1", "999.12.1.2",
              "+1 (555) 123-4567", "555 123 4567", "v1.2.3", "x@y",
              "12345678", "@", ".", "-"]
    docs = [" ".join(rng.choice(pieces)
                     for _ in range(rng.randint(0, 10)))
            for _ in range(200)]
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string")
    out = compile_pipeline(
        [{"$piiStats": {"input": "$text", "as": "p"}}],
        Context(spark=spark))(df)
    for r in out.sort("doc_id").collect():
        d = docs[r.doc_id]
        for name, (rx, _tok) in SCRUB_RULES:
            assert r.p[name] == len(re.findall(rx, d)), (name, repr(d))


def test_truncate_tokens_matches_python_reference(spark):
    import random

    rng = random.Random(517)
    docs = ["".join(rng.choice("ab \t\n") for _ in range(rng.randint(0, 30)))
            for _ in range(200)]
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string")
    out = compile_pipeline(
        [{"$truncateTokens": {"input": "$text", "as": "t", "max": 3}}],
        Context(spark=spark))(df)
    for r in out.sort("doc_id").collect():
        assert r.t == " ".join(docs[r.doc_id].split()[:3]), \
            repr(docs[r.doc_id])


# ------------------------------------------------------------ $mixCorpora


def test_mix_corpora_deterministic_and_tagged(spark):
    import hashlib

    base = spark.createDataFrame([(i, f"w{i}") for i in range(100)],
                                 "doc_id long, text string")
    books = spark.createDataFrame([(i, f"b{i}", True) for i in range(100)],
                                  "doc_id long, text string, book boolean")
    ctx = Context(spark=spark, collections={"bk": books})
    p = [{"$mixCorpora": {"id": "$doc_id", "seed": 5,
                          "base": {"name": "web", "rate": 0.5},
                          "extra": {"books": {"from": "bk",
                                              "rate": 0.25}}}}]
    out = compile_pipeline(p, Context(spark=spark,
                                      collections={"bk": books}))(base)
    rows = [(r.doc_id, r.mix_source, r.book) for r in out.collect()]

    def kept(name, i, rate):
        h = int(hashlib.md5(f"5:{name}:{i}".encode()).hexdigest()[:15],
                16) % 1_000_000
        return h < rate * 1_000_000

    exp_web = {i for i in range(100) if kept("web", i, 0.5)}
    exp_books = {i for i in range(100) if kept("books", i, 0.25)}
    assert {i for i, s, _ in rows if s == "web"} == exp_web
    assert {i for i, s, _ in rows if s == "books"} == exp_books
    # missing columns null-fill across parts; tags are exact
    assert all(b is None for i, s, b in rows if s == "web")
    assert all(b is True for i, s, b in rows if s == "books")
    # re-run is identical (retry determinism)
    out2 = compile_pipeline(p, ctx)(base)
    assert sorted(rows) == sorted(
        (r.doc_id, r.mix_source, r.book) for r in out2.collect())


def test_mix_corpora_validation(spark):
    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="rate"):
        compile_pipeline(
            [{"$mixCorpora": {"id": "$doc_id",
                              "base": {"name": "b", "rate": 1.5}}}],
            Context(spark=spark))(df)
    with pytest.raises(ValueError, match="unique"):
        compile_pipeline(
            [{"$mixCorpora": {"id": "$doc_id",
                              "base": {"name": "x", "rate": 0.5},
                              "extra": {"x": {"from": "c",
                                              "rate": 0.5}}}}],
            Context(spark=spark))(df)


def test_mix_corpora_null_ids_share_one_fate(spark):
    import hashlib

    df = spark.createDataFrame(
        [(1, "a"), (None, "b"), (None, "c")], "doc_id long, text string")
    h = int(hashlib.md5("0:web:".encode()).hexdigest()[:15],
            16) % 1_000_000
    out = compile_pipeline(
        [{"$mixCorpora": {"id": "$doc_id",
                          "base": {"name": "web", "rate": 0.5}}}],
        Context(spark=spark))(df)
    texts = sorted(r.text for r in out.collect())
    expect_nulls = ["b", "c"] if h < 500_000 else []
    base = [] if int(hashlib.md5("0:web:1".encode()).hexdigest()[:15],
                     16) % 1_000_000 >= 500_000 else ["a"]
    assert texts == sorted(base + expect_nulls)
    # rate 1.0 keeps EVERY row, null ids included — never silent loss
    out2 = compile_pipeline(
        [{"$mixCorpora": {"id": "$doc_id",
                          "base": {"name": "web", "rate": 1.0}}}],
        Context(spark=spark))(df)
    assert out2.count() == 3


def test_mix_corpora_missing_from_is_clear(spark):
    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match=r"\$mixCorpora extra part"):
        compile_pipeline(
            [{"$mixCorpora": {"id": "$doc_id",
                              "base": {"name": "b", "rate": 0.5},
                              "extra": {"books": {"rate": 0.3}}}}],
            Context(spark=spark))(df)


# ----------------------------------------------------------- $gopherRules


def _gopher(spark, text, **thresholds):
    return _one(
        spark,
        {"$gopherRules": {"input": "$text", "as": "g", **thresholds}},
        text, "g")


def test_gopher_rules_clean_doc_passes(spark):
    text = ("the quick brown fox jumps over the lazy dog and that "
            "sentence will have to repeat with more words of filler "
            "until the word count clears the fifty word floor so here "
            "are some more plain english words that keep the ratios "
            "inside every single one of the published gopher bounds ok")
    g = _gopher(spark, text)
    assert g["pass"] is True
    assert g.n_words >= 50 and g.stop_word_hits >= 2
    assert g.alpha_word_frac == 1.0 and g.bullet_line_frac == 0.0


def test_gopher_rules_signal_math(spark):
    g = _gopher(spark, "aa bb## cc... dd", minWords=1, minStopWords=0)
    assert g.n_words == 4
    # 10 word chars (## and ... count: "bb##" is 4, "cc..." is 5) / 4
    assert g.mean_word_len == round((2 + 4 + 5 + 2) / 4, 6)
    assert g.hash_word_ratio == 0.5      # two '#' over four words
    assert g.ellipsis_word_ratio == 0.25  # one '...' over four words
    assert g.stop_word_hits == 0


def test_gopher_rules_line_fractions(spark):
    text = "• first bullet\n- second bullet\nplain line ends well...\n\n"
    g = _gopher(spark, text, minWords=1, minStopWords=0)
    # 3 non-empty lines: 2 bullets, 1 ellipsis-terminated
    assert g.bullet_line_frac == round(2 / 3, 6)
    assert g.ellipsis_line_frac == round(1 / 3, 6)
    assert g["pass"] is False  # ellipsis_line_frac 0.33 > 0.3


def test_gopher_rules_stop_words_and_alpha(spark):
    g = _gopher(spark, "The cat sat with 12345 67890", minWords=1)
    assert g.stop_word_hits == 2          # the, with
    assert g.alpha_word_frac == round(4 / 6, 6)
    assert g["pass"] is False             # alpha 0.67 < 0.8


def test_gopher_rules_empty_doc_fails(spark):
    g = _gopher(spark, "")
    assert g.n_words == 0 and g.mean_word_len == 0.0
    assert g["pass"] is False


# ------------------------------------------------------------- $dsirScore


def test_dsir_score_prefers_target_like_docs(spark):
    src = spark.createDataFrame(
        [Row(doc_id=1, text="cat purrs on the mat"),
         Row(doc_id=2, text="cat naps on the sofa"),
         Row(doc_id=3, text="dog barks at the van"),
         Row(doc_id=4, text="dog digs in the yard")],
        "doc_id long, text string")
    tgt = spark.createDataFrame(
        [Row(text="cat purrs and the cat naps"),
         Row(text="a cat sits on the mat")],
        "text string")
    out = compile_pipeline(
        [{"$dsirScore": {"input": "$text", "id": "doc_id", "from": "tgt",
                         "buckets": 1000}}],
        Context(spark=spark, collections={"tgt": tgt}))(src)
    scores = {r["doc_id"]: r["dsir_score"] for r in out.collect()}
    assert len(scores) == 4
    # cat documents look more target-like than dog documents
    assert min(scores[1], scores[2]) > max(scores[3], scores[4])


def test_dsir_score_empty_and_null_text(spark):
    src = spark.createDataFrame(
        [Row(doc_id=1, text="shared words here"),
         Row(doc_id=2, text=""), Row(doc_id=3, text=None)],
        "doc_id long, text string")
    tgt = spark.createDataFrame([Row(text="shared words here")],
                                "text string")
    out = compile_pipeline(
        [{"$dsirScore": {"input": "$text", "id": "doc_id", "from": "tgt"}}],
        Context(spark=spark, collections={"tgt": tgt}))(src)
    scores = {r["doc_id"]: r["dsir_score"] for r in out.collect()}
    assert scores[2] == 0.0 and scores[3] == 0.0  # no features -> 0


def test_dsir_score_pins_counts_and_spreads_explode(spark, tmp_path):
    """r13 optimization: the two bucket-count tables are pinned
    (dp_dedup._pin_computed) because each is referenced twice (ratio
    join + its total) and Catalyst re-inlines both — the un-pinned
    plan ran the md5 feature explode 5 times (3 full-corpus + 2
    target-slice, executed-plan audit; 11 s at sf0.1, ~2-3 s after).
    Pinned: counts read as ExistingRDD, the corpus parquet appears
    only twice (scoring-side explode + final re-attach join), and a
    one-row-group corpus fans out through _spread's row-group gate
    before the heavy explode."""
    p = str(tmp_path / "docs")
    spark.createDataFrame(
        [Row(doc_id=1, text="cat purrs on the mat"),
         Row(doc_id=2, text="cat naps on the sofa"),
         Row(doc_id=3, text="dog barks at the van"),
         Row(doc_id=4, text="dog digs in the yard")],
        "doc_id long, text string").coalesce(1).write.parquet(p)
    docs = spark.read.parquet(p)
    tgt = docs.filter("doc_id <= 2")
    out = compile_pipeline(
        [{"$dsirScore": {"input": "$text", "id": "doc_id", "from": "tgt",
                         "buckets": 1000}}],
        Context(spark=spark, collections={"tgt": tgt}))(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan
    assert plan.count("Scan parquet") <= 2
    assert "RoundRobinPartitioning" in plan
    # results unchanged by the pin + fan-out: rows score deterministically
    scores = {r["doc_id"]: r["dsir_score"] for r in out.collect()}
    assert len(scores) == 4
    assert min(scores[1], scores[2]) > max(scores[3], scores[4])


def test_dsir_score_spec_validation(spark):
    ctx = Context(spark=spark)
    with pytest.raises(ValueError, match="smoothing"):
        compile_pipeline(
            [{"$dsirScore": {"input": "$t", "id": "i", "from": "x",
                             "smoothing": 0}}], ctx)
    with pytest.raises(KeyError):
        compile_pipeline([{"$dsirScore": {"input": "$t"}}], ctx)


def test_gopher_rules_matches_python_reference(spark):
    """Seeded random word soup (bullets, ellipses, hashes, digits,
    multi-line): every $gopherRules signal must equal a literal Python
    re-implementation of the spec."""
    import math
    import random
    import re

    rng = random.Random(518)
    pieces = ["the", "and", "with", "zz", "a#b", "##", "...", "x...",
              "12", "•", "- item", "* b", "…", "WORD", "mix3d", "",
              "\tx", "a\x0bb", "e...\r"]
    docs = []
    for _ in range(200):
        nl = rng.choice(["\n", "\r\n"])
        lines = [" ".join(rng.choice(pieces)
                          for _ in range(rng.randint(0, 8)))
                 for _ in range(rng.randint(1, 5))]
        docs.append(nl.join(lines))

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    def ref(text):
        # the operator's documented contract: the explicit [ \t\n\r\f\v]
        # word separator (NOT python/unicode \s) and [ \t]-trimmed
        # \r?\n-split lines
        ws = [w for w in re.split("[ \t\n\r\f\x0b]+", text) if w]
        ls = [l for l in (s.strip(" \t") for s in re.split(r"\r?\n", text))
              if l]
        nw, nl = len(ws), len(ls)
        stop = {"the", "be", "to", "of", "and", "that", "have", "with"}
        return {
            "n_words": nw,
            "mean_word_len": r6(sum(map(len, ws)) / nw) if nw else 0.0,
            "hash_word_ratio": r6(text.count("#") / nw) if nw else 0.0,
            "ellipsis_word_ratio":
                r6(len(re.findall(r"\.\.\.|…", text)) / nw) if nw else 0.0,
            "bullet_line_frac":
                r6(sum(bool(re.match(r"^[•‣▪*-]", l)) for l in ls) / nl)
                if nl else 0.0,
            "ellipsis_line_frac":
                r6(sum(bool(re.search(r"(\.\.\.|…)$", l)) for l in ls) / nl)
                if nl else 0.0,
            "alpha_word_frac":
                r6(sum(bool(re.search("[A-Za-z]", w)) for w in ws) / nw)
                if nw else 0.0,
            "stop_word_hits": len({w.lower() for w in ws} & stop),
        }

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string")
    out = compile_pipeline(
        [{"$gopherRules": {"input": "$text", "as": "g"}}],
        Context(spark=spark))(df)
    for r in out.sort("doc_id").collect():
        want = ref(docs[r.doc_id])
        for k, v in want.items():
            assert r.g[k] == v, (k, v, r.g[k], repr(docs[r.doc_id]))


def test_gopher_rules_null_text_measures_zero(spark):
    g = _gopher(spark, None)
    assert g.n_words == 0 and g.stop_word_hits == 0
    assert g.mean_word_len == 0.0
    assert g["pass"] is False


def test_dsir_score_matches_python_reference(spark):
    """Seeded random corpora: the whole DSIR computation (md5 bucket
    hash, unigram+bigram bag, Laplace-smoothed models, log-ratio sum)
    must equal a literal Python implementation."""
    import hashlib
    import math
    import random

    rng = random.Random(519)
    vocab = ["cat", "dog", "the", "a", "runs", "sleeps", "fast", "12"]
    mk = lambda: " ".join(rng.choice(vocab)
                          for _ in range(rng.randint(0, 12)))
    src_docs = {i: mk() for i in range(60)}
    tgt_docs = [mk() for _ in range(25)]
    buckets, alpha = 97, 0.5  # intentionally small: force collisions

    def feats(text):
        ws = [w for w in text.lower().split(" ") if w]
        grams = ws + [" ".join(ws[i:i + 2]) for i in range(len(ws) - 1)]
        return [int(hashlib.md5(f"0:{g}".encode()).hexdigest()[:15], 16)
                % buckets for g in grams]

    src_f = {i: feats(t) for i, t in src_docs.items()}
    tgt_f = [b for t in tgt_docs for b in feats(t)]
    sc: dict[int, int] = {}
    for bs in src_f.values():
        for b in bs:
            sc[b] = sc.get(b, 0) + 1
    tc: dict[int, int] = {}
    for b in tgt_f:
        tc[b] = tc.get(b, 0) + 1
    ts, tt = sum(sc.values()), len(tgt_f)
    ab = alpha * buckets

    def ref_score(bs):
        raw = sum(
            math.log((tc.get(b, 0) + alpha) / (tt + ab))
            - math.log((sc[b] + alpha) / (ts + ab))
            for b in bs)
        return math.floor(raw * 1e6 + 0.5) / 1e6

    src = spark.createDataFrame(list(src_docs.items()),
                                "doc_id long, text string")
    tgt = spark.createDataFrame([(t,) for t in tgt_docs], "text string")
    out = compile_pipeline(
        [{"$dsirScore": {"input": "$text", "id": "doc_id", "from": "tgt",
                         "buckets": buckets, "smoothing": alpha}}],
        Context(spark=spark, collections={"tgt": tgt}))(src)
    for r in out.collect():
        want = ref_score(src_f[r["doc_id"]])
        assert abs(r["dsir_score"] - want) < 2e-6, (
            r["doc_id"], r["dsir_score"], want)


# ------------------------------------------------------------ $readability


def test_readability_known_text(spark):
    g = _one(spark, {"$readability": {"input": "$text", "as": "r"}},
             "The cat sat. The dog ran away!", "r")
    assert g.n_sentences == 2 and g.n_words == 7
    # syllables: the(1) cat(1) sat(1) the(1) dog(1) ran(1) away(2) = 8
    assert g.n_syllables == 8
    import math

    wps, spw = 7 / 2, 8 / 7
    assert g.flesch == math.floor(
        (206.835 - 1.015 * wps - 84.6 * spw) * 1e6 + 0.5) / 1e6
    assert g.fk_grade == math.floor(
        (0.39 * wps + 11.8 * spw - 15.59) * 1e6 + 0.5) / 1e6


def test_readability_no_terminal_punctuation_counts_one_sentence(spark):
    g = _one(spark, {"$readability": {"input": "$text", "as": "r"}},
             "words without any stops", "r")
    assert g.n_sentences == 1 and g.n_words == 4


def test_readability_empty_and_null(spark):
    for t in ("", None):
        g = _one(spark, {"$readability": {"input": "$text", "as": "r"}},
                 t, "r")
        assert g.n_sentences == 0 and g.n_words == 0
        assert g.n_syllables == 0
        assert g.flesch is None and g.fk_grade is None


def test_readability_numeric_tokens_have_no_syllables(spark):
    g = _one(spark, {"$readability": {"input": "$text", "as": "r"}},
             "a 12345 b.", "r")
    assert g.n_words == 3 and g.n_syllables == 2


def test_readability_matches_python_reference(spark):
    """Seeded random word soup: every $readability signal equals a
    literal Python re-implementation of the documented estimator."""
    import random
    import re

    rng = random.Random(521)
    pieces = ["the", "reading", "ease", "Dr.", "hmm!", "12", "a?",
              "strengths", "IOU", "x...", "", "\tz", "co-op"]
    docs = [" ".join(rng.choice(pieces)
                     for _ in range(rng.randint(0, 15)))
            for _ in range(200)]

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    def ref(text):
        ws = [w for w in re.split("[ \t\n\r\f\x0b]+", text) if w]
        nw = len(ws)
        sruns = len(re.findall(r"[.!?]+", text))
        ns = max(sruns, 1) if nw else 0

        def syl(w):
            if not re.search("[A-Za-z]", w):
                return 0
            return max(len(re.findall("[aeiouy]+", w.lower())), 1)

        s = sum(syl(w) for w in ws)
        if nw and ns:
            wps, spw = nw / ns, s / nw
            fl = r6(206.835 - 1.015 * wps - 84.6 * spw)
            fk = r6(0.39 * wps + 11.8 * spw - 15.59)
        else:
            fl = fk = None
        return ns, nw, s, fl, fk

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string")
    out = compile_pipeline(
        [{"$readability": {"input": "$text", "as": "r"}}],
        Context(spark=spark))(df)
    for r in out.sort("doc_id").collect():
        ns, nw, s, fl, fk = ref(docs[r.doc_id])
        got = (r.r.n_sentences, r.r.n_words, r.r.n_syllables,
               r.r.flesch, r.r.fk_grade)
        assert got == (ns, nw, s, fl, fk), (repr(docs[r.doc_id]), got)


# --------------------------------------------------------- BPE tokenizer


def _ref_bpe(word, ranks):
    """Independent reference BPE (the GPT-2 encoder.py loop shape:
    min-rank pair via set-of-pairs, index-scan merge) — deliberately a
    DIFFERENT implementation from functions/bpe.py's linear-scan merge,
    so the differential test has teeth."""
    w = tuple(word)
    while len(w) > 1:
        pairs = {(w[i], w[i + 1]) for i in range(len(w) - 1)}
        cand = [p for p in pairs if p in ranks]
        if not cand:
            break
        first, second = min(cand, key=lambda p: ranks[p])
        neww = []
        i = 0
        while i < len(w):
            try:
                j = w.index(first, i)
            except ValueError:
                neww.extend(w[i:])
                break
            neww.extend(w[i:j])
            if j < len(w) - 1 and w[j + 1] == second:
                neww.append(first + second)
                i = j + 2
            else:
                neww.append(w[j])
                i = j + 1
        w = tuple(neww)
    return list(w)


# remap-space symbols (r7 byte-level: space is Ġ, the merges.txt alphabet)
_MERGES = [
    ("t", "h", 0), ("th", "e", 1), ("h", "e", 2), ("i", "n", 3),
    ("a", "n", 4), ("an", "d", 5), ("e", "r", 6), ("o", "n", 7),
    ("\u0120", "a", 8), ("r", "e", 9), ("\u0120", "the", 10), ("o", "u", 11),
    ("in", "g", 12), ("e", "d", 13), ("s", "t", 14),
]


def _merges_df(spark):
    return spark.createDataFrame(_MERGES, "left string, right string, rank long")


def _ref_count(text, ranks):
    from pincette_mongo_streams_spark.functions.bpe import (
        pretokenize, to_units,
    )

    return sum(len(_ref_bpe(to_units(pt), ranks))
               for pt in pretokenize(text))


def test_bpe_token_count_differential_on_documents(spark):
    """r6: tokenizer:{merges} BPE counting matches an independent
    reference implementation over the real documents corpus, and the
    encoder round-trips (decode(encode(text)) == text — r7 byte-level:
    tokens live in the GPT-2 remap alphabet)."""
    from pincette_mongo_streams_spark.functions import bpe as bpe_mod

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ctx = Context(spark=spark, collections={"merges": _merges_df(spark)})
    out = compile_pipeline(
        [{"$tokenCount": {"input": "$text", "as": "n_bpe",
                          "tokenizer": {"merges": "merges"}}},
         {"$project": {"doc_id": 1, "text": 1, "n_bpe": 1}}],
        ctx)(docs)
    rows = out.collect()
    assert len(rows) > 100
    ranks = {(l, r): k for l, r, k in _MERGES}
    cache = {}
    for r in rows:
        assert r["n_bpe"] == _ref_count(r["text"], ranks), r["doc_id"]
    # round-trip property on a sample of real texts
    for r in rows[:25]:
        toks = bpe_mod.encode(r["text"], ranks, cache)
        assert bpe_mod.decode(toks) == r["text"]
        # multi-level merges actually fired (e.g. "Ġthe" from
        # t+h -> th+e -> Ġ+the) somewhere in a real corpus
    joined = " the theory and responding "
    assert bpe_mod.encode(joined, ranks, cache)[0] == "\u0120the"


def test_bpe_truncate_exact_prefix(spark):
    """tokenizer truncation keeps whitespace: the output is the exact
    character prefix covered by the first max tokens."""
    from pincette_mongo_streams_spark.functions import bpe as bpe_mod

    ranks = {(l, r): k for l, r, k in _MERGES}
    text = "the  thing and\tother words here"
    ctx = Context(spark=spark, collections={"merges": _merges_df(spark)})
    df = spark.createDataFrame([(text,), (None,)], "text string")
    out = compile_pipeline(
        [{"$truncateTokens": {"input": "$text", "as": "t", "max": 5,
                              "tokenizer": {"merges": "merges"}}}],
        ctx)(df).collect()
    toks = bpe_mod.encode(text, ranks, {})
    assert out[0]["t"] == bpe_mod.decode(toks[:5])
    assert text.startswith(out[0]["t"])
    assert out[1]["t"] is None
    # budget >= length: whole text verbatim (tabs and double spaces kept)
    out2 = compile_pipeline(
        [{"$truncateTokens": {"input": "$text", "as": "t", "max": 999,
                              "tokenizer": {"merges": "merges"}}}],
        ctx)(df).collect()
    assert out2[0]["t"] == text


def test_bpe_merges_table_forms_and_validation(spark):
    space_free = [(l, r, k) for l, r, k in _MERGES
                  if " " not in l and " " not in r]
    ranks = {(l, r): k for l, r, k in space_free}
    pair_df = spark.createDataFrame(
        [(f"{l} {r}", k) for l, r, k in space_free],
        "pair string, rank long")
    ctx = Context(spark=spark, collections={"m": pair_df})
    df = spark.createDataFrame([("the theory",)], "text string")
    out = compile_pipeline(
        [{"$tokenCount": {"input": "$text", "as": "n",
                          "tokenizer": {"merges": "m"}}}],
        ctx)(df).collect()
    assert out[0]["n"] == _ref_count("the theory", ranks)
    with pytest.raises(ValueError, match="unknown collection"):
        compile_pipeline(
            [{"$tokenCount": {"input": "$text", "as": "n",
                              "tokenizer": {"merges": "nope"}}}],
            Context(spark=spark))(df).collect()
    bad = spark.createDataFrame([("x",)], "whatever string")
    with pytest.raises(ValueError, match="columns"):
        compile_pipeline(
            [{"$tokenCount": {"input": "$text", "as": "n",
                              "tokenizer": {"merges": "b"}}}],
            Context(spark=spark, collections={"b": bad}))(df).collect()
    with pytest.raises(ValueError, match="tokenizer applies to unit"):
        compile_pipeline(
            [{"$truncateTokens": {"input": "$text", "as": "t", "max": 2,
                                  "unit": "chars",
                                  "tokenizer": {"merges": "m"}}}],
            ctx)(df).collect()


def test_dsir_score_pretrained_source_model(spark):
    """r6: sourceFrom fits the source model on a static collection —
    with that collection equal to the input corpus the scores match the
    default fit-on-input mode exactly; a document with n-grams unseen
    by BOTH models scores its Laplace default instead of dropping."""
    rows = [Row(doc_id=1, text="cat purrs on the mat"),
            Row(doc_id=2, text="cat naps on the sofa"),
            Row(doc_id=3, text="dog barks at the van"),
            Row(doc_id=4, text="dog digs in the yard")]
    src = spark.createDataFrame(rows, "doc_id long, text string")
    tgt = spark.createDataFrame(
        [Row(text="cat purrs and the cat naps"),
         Row(text="a cat sits on the mat")], "text string")
    colls = {"tgt": tgt, "model": src.select("text")}
    spec = {"input": "$text", "id": "doc_id", "from": "tgt",
            "buckets": 1000}
    base = {r["doc_id"]: r["dsir_score"] for r in compile_pipeline(
        [{"$dsirScore": spec}],
        Context(spark=spark, collections=colls))(src).collect()}
    pre = {r["doc_id"]: r["dsir_score"] for r in compile_pipeline(
        [{"$dsirScore": {**spec, "sourceFrom": "model"}}],
        Context(spark=spark, collections=colls))(src).collect()}
    assert pre == base
    # unseen-everywhere n-grams: Laplace default, deterministic nonzero
    novel = spark.createDataFrame([Row(doc_id=9, text="zzq wwx vvk")],
                                  "doc_id long, text string")
    out = compile_pipeline(
        [{"$dsirScore": {**spec, "sourceFrom": "model"}}],
        Context(spark=spark, collections=colls))(novel).collect()
    import math
    # both models unseen: per-feature lr = ln(a/(tt+aB)) - ln(a/(ts+aB))
    # with 5 features (3 unigrams + 2 bigrams), a=1, B=1000
    ts = tt = None
    # totals: count of n-gram tokens in each corpus
    def n_feats(texts, n=2):
        tot = 0
        for t in texts:
            w = t.split()
            for size in range(1, n + 1):
                tot += max(0, len(w) - size + 1)
        return tot
    ts = n_feats([r.text for r in rows])
    tt = n_feats(["cat purrs and the cat naps", "a cat sits on the mat"])
    want = 5 * (math.log(1.0 / (tt + 1000)) - math.log(1.0 / (ts + 1000)))
    assert abs(out[0]["dsir_score"] - round(want, 6)) < 1e-6


def _naive_train(word_counts, n_merges, min_count=2):
    """From-scratch reference: recompute ALL pair counts each round."""
    words = {i: (list(w), c) for i, (w, c) in
             enumerate(word_counts.items())}
    merges = []
    for rank in range(n_merges):
        pc = {}
        for syms, c in words.values():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pc[p] = pc.get(p, 0) + c
        live = {p: c for p, c in pc.items() if c >= min_count}
        if not live:
            break
        best = min(live, key=lambda p: (-live[p], p))
        merges.append((best[0], best[1], rank))
        for wid, (syms, c) in words.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wid] = (out, c)
    return merges


def test_bpe_train_matches_naive_reference():
    """r6: the incremental trainer equals a from-scratch recount trainer
    on randomized word-frequency tables (including repeated-letter words
    where pair counts overlap)."""
    import random

    from pincette_mongo_streams_spark.functions.bpe import train

    rng = random.Random(13)
    for trial in range(30):
        vocab = {}
        for _ in range(rng.randint(3, 40)):
            w = "".join(rng.choice("abc") for _ in range(rng.randint(1, 7)))
            vocab[w] = rng.randint(1, 9)
        n = rng.randint(1, 12)
        assert train(vocab, n) == _naive_train(vocab, n), (vocab, n)


def test_bpe_train_stage_end_to_end(spark):
    """$bpeTrain over the real documents corpus produces a merge table
    the encoder consumes: training then tokenizing lowers the token
    count vs character count, and the table round-trips through
    Context.collections into $tokenCount."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges_df = compile_pipeline(
        [{"$bpeTrain": {"input": "$text", "merges": 40}}],
        Context(spark=spark))(docs)
    rows = merges_df.collect()
    assert merges_df.columns == ["left", "right", "rank"]
    assert 0 < len(rows) <= 40
    assert [r["rank"] for r in rows] == list(range(len(rows)))
    ctx = Context(spark=spark, collections={"m": merges_df})
    out = compile_pipeline(
        [{"$tokenCount": {"input": "$text", "as": "n_bpe",
                          "tokenizer": {"merges": "m"}}},
         {"$project": {"doc_id": 1, "n_bpe": 1,
                       "n_chars_x": {"$strLenCP": "$text"}}}],
        ctx)(docs).collect()
    # merges compress IN AGGREGATE (a single doc may contain none of
    # the learned pairs and tokenize 1:1 — corpus-content-dependent)
    tot_bpe = sum(r["n_bpe"] for r in out if r["n_bpe"])
    tot_chars = sum(r["n_chars_x"] for r in out if r["n_chars_x"])
    assert 0 < tot_bpe < tot_chars
    assert all(r["n_bpe"] <= r["n_chars_x"] for r in out
               if r["n_chars_x"])


def test_bpe_train_early_stop_and_validation(spark):
    from pincette_mongo_streams_spark.functions.bpe import train

    # every pair unique -> counts of 1 < minCount 2 -> no merges
    assert train({"ab": 1, "cd": 1}, 10) == []
    # early stop: only one mergeable pair
    assert train({"ab": 5}, 10) == [("a", "b", 0)]
    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError, match="merges >= 1"):
        compile_pipeline([{"$bpeTrain": {"input": "$text", "merges": 0}}],
                         Context(spark=spark))(df)


def test_bpe_encode_tokens_and_ids(spark):
    """r6: $bpeEncode emits the BPE token sequence (concatenation-
    preserving) or vocab-mapped ids; OOV -> -1; null in -> null out."""
    from pincette_mongo_streams_spark.functions import bpe as bpe_mod

    ranks = {(l, r): k for l, r, k in _MERGES}
    merges_df = _merges_df(spark)
    df = spark.createDataFrame(
        [(1, "the thing and other"), (2, None)], "doc_id long, t string")
    ctx = Context(spark=spark, collections={"m": merges_df})
    out = compile_pipeline(
        [{"$bpeEncode": {"input": "$t", "as": "toks",
                         "tokenizer": {"merges": "m"}}}],
        ctx)(df).collect()
    by = {r["doc_id"]: r["toks"] for r in out}
    assert bpe_mod.decode(by[1]) == "the thing and other"
    assert by[1] == bpe_mod.encode("the thing and other", ranks, {})
    assert by[2] is None
    # vocab ids: build the vocab FROM the corpus's own token set —
    # the natural composition ($bpeEncode -> explode -> distinct -> id)
    toks = sorted(set(by[1]))
    vocab_df = spark.createDataFrame(
        [(t, i) for i, t in enumerate(toks)], "token string, id long")
    ctx2 = Context(spark=spark, collections={"m": merges_df,
                                             "v": vocab_df})
    out2 = compile_pipeline(
        [{"$bpeEncode": {"input": "$t", "as": "ids",
                         "tokenizer": {"merges": "m", "vocab": "v"}}}],
        ctx2)(df).collect()
    ids = {r["doc_id"]: r["ids"] for r in out2}
    assert ids[1] == [toks.index(t) for t in by[1]]
    assert ids[2] is None
    # OOV maps to -1
    df3 = spark.createDataFrame([(3, "zzz")], "doc_id long, t string")
    out3 = compile_pipeline(
        [{"$bpeEncode": {"input": "$t", "as": "ids",
                         "tokenizer": {"merges": "m", "vocab": "v"}}}],
        ctx2)(df3).collect()
    assert all(i == -1 for i in out3[0]["ids"])
    # validation
    with pytest.raises(ValueError, match="merges"):
        compile_pipeline([{"$bpeEncode": {"input": "$t"}}], ctx)(df)
    bad = spark.createDataFrame([("x", 1)], "tok string, i long")
    with pytest.raises(ValueError, match="token, id"):
        compile_pipeline(
            [{"$bpeEncode": {"input": "$t",
                             "tokenizer": {"merges": "m", "vocab": "b"}}}],
            Context(spark=spark,
                    collections={"m": merges_df, "b": bad}))(df).collect()


def test_token_count_rejects_mode_with_tokenizer(spark):
    """advisor r7: mode and tokenizer together is a compile-time error
    (the tokenizer IS the mode — before, any mode value was silently
    ignored), and a bad mode is rejected even alongside a tokenizer."""
    for mode in ("whitespace", "bogus"):
        with pytest.raises(ValueError, match="either mode or tokenizer"):
            compile_pipeline(
                [{"$tokenCount": {"input": "$text", "mode": mode,
                                  "tokenizer": {"merges": "merges"}}}],
                Context(spark=spark,
                        collections={"merges": _merges_df(spark)}))
    with pytest.raises(ValueError, match="bad token mode"):
        compile_pipeline(
            [{"$tokenCount": {"input": "$text", "mode": "bogus"}}],
            Context(spark=spark))


def test_bpe_broadcast_rebind_and_release(spark):
    """advisor r7: rebinding a merges collection name on the SAME
    Context picks up the new model (the stale broadcast is destroyed,
    not silently served), and release_broadcasts() clears the memo."""
    from pincette_mongo_streams_spark.functions import bpe as bpe_mod

    ctx = Context(spark=spark, collections={"merges": _merges_df(spark)})
    df = spark.createDataFrame([("the theory",)], "text string")
    pipe = [{"$tokenCount": {"input": "$text", "as": "n",
                             "tokenizer": {"merges": "merges"}}}]
    n_full = compile_pipeline(pipe, ctx)(df).collect()[0]["n"]
    bc_first = next(iter(ctx._bpe_broadcasts.values()))[1]
    # same binding -> same broadcast object (the foreachBatch memo)
    assert bpe_mod.broadcast_tokenizer(ctx, "merges") is bc_first
    # rebind to a one-rule model: counts must change
    ctx.collections["merges"] = spark.createDataFrame(
        [("t", "h", 0)], "left string, right string, rank long")
    n_tiny = compile_pipeline(pipe, ctx)(df).collect()[0]["n"]
    assert n_tiny > n_full  # fewer merges -> more tokens
    bc_second = next(iter(ctx._bpe_broadcasts.values()))[1]
    assert bc_second is not bc_first
    assert bpe_mod.release_broadcasts(ctx) == 1
    assert ctx._bpe_broadcasts == {}
    # after release the next use re-collects transparently
    assert compile_pipeline(pipe, ctx)(df).collect()[0]["n"] == n_tiny


# ------------------------------------------- r7 byte-level BPE fidelity


def test_pretokenizer_unicode_classes_hand_cases():
    """The scanner replicates GPT-2's published pre-tokenizer regex
    semantics — hand-derived expectations, including the alternation
    quirks (lowercase-only contractions, single-space attachment,
    whitespace runs leaving their last char) and real Unicode classes
    (CJK = letters, vulgar fractions = numbers, CJK numerals = letters
    because \\p{L} wins over numeric)."""
    from pincette_mongo_streams_spark.functions.bpe import pretokenize

    cases = {
        "I'll say don't": ["I", "'ll", " say", " don", "'t"],
        "CAN'T": ["CAN", "'", "T"],                 # lowercase-only quirk
        "héllo wörld": ["héllo", " wörld"],          # é is a letter
        "日本語 テスト": ["日本語", " テスト"],        # CJK letter runs
        "一二三": ["一二三"],                         # CJK numerals: L wins
        "a 1234½": ["a", " 1234½"],                  # ½ (No) is \p{N}
        "x  y": ["x", " ", " y"],                    # run leaves last ws
        "a\tb": ["a", "\t", "b"],                    # tab never attaches
        "foo!'s": ["foo", "!'", "s"],                # ' inside punct run
        " 'sfoo": [" '", "sfoo"],                    # no contraction after space
        "end  ": ["end", "  "],                      # trailing ws run whole
        "①②": ["①②"],                                # No circled digits: N
    }
    for text, want in cases.items():
        got = pretokenize(text)
        assert got == want, (text, got, want)
        assert "".join(got) == text


def test_bpe_byte_level_hand_computed_gpt2_style():
    """Hand-computed byte-level vectors over a GPT-2-style merges
    fixture: accented text merges THROUGH its UTF-8 bytes (é = Ã ©),
    CJK merges per-byte up to whole characters, decode() inverts
    exactly, and truncation inside a multi-byte codepoint keeps the
    longest whole-character prefix."""
    from pincette_mongo_streams_spark.functions import bpe as bpe_mod

    merges = [("c", "a", 0), ("ca", "f", 1), ("caf", "Ã", 2),
              ("cafÃ", "©", 3),
              ("æ", "Ĺ", 4), ("æĹ", "¥", 5),      # 日 = E6 97 A5
              ("æ", "ľ", 6), ("æľ", "¬", 7),      # 本 = E6 9C AC
              ("æĹ¥", "æľ¬", 8), ("Ġ", "æĹ¥æľ¬", 9)]
    ranks = {(l, r): k for l, r, k in merges}
    toks = bpe_mod.encode("café 日本", ranks, {})
    assert toks == ["cafÃ©", "ĠæĹ¥æľ¬"]            # hand-derived
    assert bpe_mod.decode(toks) == "café 日本"
    # rank order matters: merge 4 fires before 6 even interleaved
    assert bpe_mod.encode("日本", ranks, {}) == ["æĹ¥æľ¬"]
    # no merges: café = 5 byte symbols (é is two)
    assert bpe_mod.encode("café", {}, {}) == ["c", "a", "f", "Ã", "©"]
    # truncation mid-codepoint: 4 of 5 byte tokens cuts é in half ->
    # whole-character prefix "caf"
    assert bpe_mod.truncate_tokens("café", 4, {}, {}) == "caf"
    assert bpe_mod.truncate_tokens("café", 5, {}, {}) == "café"
    assert bpe_mod.truncate_tokens("ab日本", 5, {}, {}) == "ab日"
    # the engine path agrees with the hand vectors end-to-end
    assert bpe_mod.count_tokens("café 日本", ranks, {}) == 2


def test_bpe_complete_byte_vocab_never_oov(spark):
    """r7: with a vocab containing all 256 single-byte symbols (every
    public GPT-2-style vocab does), vocab-id mode can never emit -1 —
    an unmerged token IS a byte symbol.  Exercised over multilingual
    text through the $bpeEncode stage."""
    from pincette_mongo_streams_spark.functions.bpe import (
        BYTE_TO_UNICODE, decode,
    )

    merges_df = _merges_df(spark)
    byte_syms = sorted(BYTE_TO_UNICODE.values())
    # vocab.json construction: all 256 byte symbols + one entry per
    # merge result — with that, every reachable token has an id
    extra = [l + r for l, r, _ in _MERGES]
    vocab_df = spark.createDataFrame(
        [(t, i) for i, t in enumerate(byte_syms + extra)],
        "token string, id long")
    texts = ["the théory 日本語", "emoji 🚀 mix", "plain ascii"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, t string")
    ctx = Context(spark=spark,
                  collections={"m": merges_df, "v": vocab_df})
    out = compile_pipeline(
        [{"$bpeEncode": {"input": "$t", "as": "ids",
                         "tokenizer": {"merges": "m", "vocab": "v"}}},
         {"$bpeEncode": {"input": "$t", "as": "toks",
                         "tokenizer": {"merges": "m"}}}],
        ctx)(df).collect()
    id_of = {t: i for i, t in enumerate(byte_syms + extra)}  # noqa: duplicate of vocab order
    for r in out:
        assert all(i >= 0 for i in r["ids"]), (r["t"], r["ids"])
        assert decode(r["toks"]) == texts[r["doc_id"]]
        # ids correspond 1:1 to the token strings
        assert r["ids"] == [id_of[t] for t in r["toks"]]


def test_chunk_text_token_windows_differential(spark):
    """r7: $chunkText unit:'tokens' — differential vs an independent
    Python chunker over the real documents corpus: chunk boundaries are
    BPE-token windows, each chunk's text is the exact substring its
    tokens cover, and overlap=0 chunks concatenate back to the text."""
    from pincette_mongo_streams_spark.functions.bpe import (
        pretokenize, to_units,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(120)
    ranks = {(l, r): k for l, r, k in _MERGES}
    ctx = Context(spark=spark, collections={"m": _merges_df(spark)})
    size, overlap = 64, 16
    out = compile_pipeline(
        [{"$chunkText": {"input": "$text", "size": size,
                         "overlap": overlap, "unit": "tokens",
                         "tokenizer": {"merges": "m"}, "as": "chunks"}}],
        ctx)(docs).select("doc_id", "text", "chunks").collect()
    assert len(out) > 50
    stride = size - overlap
    for r in out:
        text = r["text"]
        # independent reference: _ref_bpe tokens + byte-offset slicing
        toks = []
        for pt in pretokenize(text):
            toks.extend(_ref_bpe(to_units(pt), ranks))
        offs = [0]
        for t in toks:
            offs.append(offs[-1] + len(t))
        bs = text.encode("utf-8")
        n = len(toks)
        want = []
        if n:
            n_chunks = max(1, -(-(n - overlap) // stride))
            for i in range(n_chunks):
                st = i * stride
                want.append((i,
                             bs[offs[st]:offs[min(st + size, n)]]
                             .decode("utf-8"),
                             min(size, n - st)))
        got = [(c["idx"], c["text"], c["n_tokens"]) for c in r["chunks"]]
        assert got == want, (r["doc_id"], got[:2], want[:2])
        # every chunk is a literal substring of the document
        assert all(c[1] in text for c in got)
    # overlap=0: chunks partition the text exactly
    out0 = compile_pipeline(
        [{"$chunkText": {"input": "$text", "size": 50, "unit": "token",
                         "tokenizer": {"merges": "m"}}}],
        ctx)(docs).select("text", "chunks").collect()
    for r in out0:
        assert "".join(c["text"] for c in r["chunks"]) == r["text"]


def test_chunk_text_token_edge_cases(spark):
    """Token chunking hand cases: multi-byte codepoint on a window edge
    keeps the whole-character substring on both sides; short/empty/null
    docs; validation of the unit/tokenizer combinations."""
    ctx = Context(spark=spark, collections={"m": _merges_df(spark)})
    # no merges apply to CJK: each char is 3 byte-tokens (日=0-2, 本=3-5,
    # 語=6-8).  size-4 windows: [0:4) covers 日 whole + 1 byte of 本 ->
    # "日"; [4:8) covers only partial chars (本 minus its lead byte, 語
    # minus its tail) -> ""; [8:9) is 語's last byte -> ""
    df = spark.createDataFrame([(1, "日本語"), (2, ""), (3, None)],
                               "doc_id long, t string")
    out = compile_pipeline(
        [{"$chunkText": {"input": "$t", "size": 4, "unit": "tokens",
                         "tokenizer": {"merges": "m"}}}],
        ctx)(df).collect()
    by = {r["doc_id"]: None if r["chunks"] is None
          else [(c["idx"], c["text"], c["n_tokens"])
                for c in r["chunks"]] for r in out}
    assert by[1] == [(0, "日", 4), (1, "", 4), (2, "", 1)]
    # advisor r8 null semantics: empty doc -> [], null doc -> null
    # (matching unit "words" and the tokenizer family convention)
    assert by[2] == [] and by[3] is None
    # size 6 aligns with whole characters: exact two-char windows
    out6 = compile_pipeline(
        [{"$chunkText": {"input": "$t", "size": 6, "unit": "tokens",
                         "tokenizer": {"merges": "m"}}}],
        ctx)(df.filter("doc_id = 1")).collect()
    assert [(c["idx"], c["text"], c["n_tokens"])
            for c in out6[0]["chunks"]] == [(0, "日本", 6), (1, "語", 3)]
    with pytest.raises(ValueError, match="unit 'tokens' needs tokenizer"):
        compile_pipeline(
            [{"$chunkText": {"input": "$t", "size": 4, "unit": "tokens"}}],
            ctx)
    with pytest.raises(ValueError, match="tokenizer applies to unit"):
        compile_pipeline(
            [{"$chunkText": {"input": "$t", "size": 4,
                             "tokenizer": {"merges": "m"}}}], ctx)
    with pytest.raises(ValueError, match="words.tokens"):
        compile_pipeline(
            [{"$chunkText": {"input": "$t", "size": 4, "unit": "bytes"}}],
            ctx)


def test_bpe_decode_round_trip_jvm_path(spark):
    """r7: $bpeDecode inverts $bpeEncode.  Token-array input decodes as
    a PURE JVM column program (translate + encode(ISO-8859-1) +
    decode(UTF-8) — no Python eval node, no broadcast model): the
    decode direction needs no tokenizer at all."""
    texts = ["the théory 日本語", "emoji 🚀 mix", "plain ascii",
             "tab\tand  spaces"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, t string")
    ctx = Context(spark=spark, collections={"m": _merges_df(spark)})
    out = compile_pipeline(
        [{"$bpeEncode": {"input": "$t", "as": "toks",
                         "tokenizer": {"merges": "m"}}},
         {"$project": {"doc_id": 1, "toks": 1}},
         {"$bpeDecode": {"input": "$toks", "as": "back"}}],
        ctx)(df)
    got = {r["doc_id"]: r["back"] for r in out.collect()}
    assert got == {i: t for i, t in enumerate(texts)}
    # the decode stage alone is JVM-only: no Python eval in its plan
    toks_df = spark.createDataFrame(
        [(["the", "Ġthe"],), (None,)], "toks array<string>")
    dec = compile_pipeline(
        [{"$bpeDecode": {"input": "$toks"}}], Context(spark=spark))(toks_df)
    plan = dec._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan
    rows = dec.collect()
    assert rows[0]["text"] == "the the"
    assert rows[1]["text"] is None


def test_bpe_decode_ids_and_on_error(spark):
    """id-array input decodes through the vocab reverse map (Arrow
    boundary); unknown ids and invalid-UTF-8 slices raise by default
    and yield null with onError:'null'."""
    from pincette_mongo_streams_spark.functions.bpe import (
        BYTE_TO_UNICODE,
    )

    byte_syms = sorted(BYTE_TO_UNICODE.values())
    extra = [l + r for l, r, _ in _MERGES]
    vocab = byte_syms + extra
    vocab_df = spark.createDataFrame(
        [(t, i) for i, t in enumerate(vocab)], "token string, id long")
    ctx = Context(spark=spark, collections={"m": _merges_df(spark),
                                            "v": vocab_df})
    df = spark.createDataFrame([(1, "the thing 日本"), (2, None)],
                               "doc_id long, t string")
    out = compile_pipeline(
        [{"$bpeEncode": {"input": "$t", "as": "ids",
                         "tokenizer": {"merges": "m", "vocab": "v"}}},
         {"$bpeDecode": {"input": "$ids", "as": "back",
                         "tokenizer": {"vocab": "v"}}}],
        ctx)(df).collect()
    by = {r["doc_id"]: r["back"] for r in out}
    assert by == {1: "the thing 日本", 2: None}
    # unknown id: raises by default, null with onError
    bad = spark.createDataFrame([([99999],)], "ids array<long>")
    import py4j.protocol as _p4j
    with pytest.raises(Exception, match="not in vocab"):
        compile_pipeline(
            [{"$bpeDecode": {"input": "$ids",
                             "tokenizer": {"vocab": "v"}}}], ctx)(bad) \
            .collect()
    lenient = compile_pipeline(
        [{"$bpeDecode": {"input": "$ids", "onError": "null",
                         "tokenizer": {"vocab": "v"}}}], ctx)(bad).collect()
    assert lenient[0]["text"] is None
    # invalid UTF-8 token slice (a lone continuation byte): same contract
    cont = spark.createDataFrame([(["Ĺ"],)], "toks array<string>")
    with pytest.raises(Exception, match="MALFORMED|UTF-8"):
        compile_pipeline([{"$bpeDecode": {"input": "$toks"}}],
                         Context(spark=spark))(cont).collect()
    ok = compile_pipeline(
        [{"$bpeDecode": {"input": "$toks", "onError": "null"}}],
        Context(spark=spark))(cont).collect()
    assert ok[0]["text"] is None
    # validation
    with pytest.raises(ValueError, match="needs tokenizer"):
        compile_pipeline([{"$bpeDecode": {"input": "$ids"}}], ctx)(bad)
    with pytest.raises(ValueError, match="onError"):
        compile_pipeline(
            [{"$bpeDecode": {"input": "$toks", "onError": "skip"}}], ctx)
    with pytest.raises(ValueError, match="array"):
        compile_pipeline([{"$bpeDecode": {"input": "$t"}}], ctx)(
            spark.createDataFrame([("x",)], "t string"))


def test_ngram_overlap_differential_and_edges(spark):
    """r7: $ngramOverlap — clipped-count semantics vs an independent
    Python reference over the real documents corpus (candidate = full
    text, reference = its first-40-words truncation) at n = 1 and 2,
    plus hand edge cases (clipping, empty, short-doc, null)."""
    import re as _re
    from collections import Counter

    def ref_overlap(cand, ref, n):
        def grams(t):
            # Java \s (what F.split uses), not Python's Unicode \s —
            # the corpora are ASCII but the ref must not drift (review)
            ws = [w for w in _re.split(r"[ \t\n\r\f\x0b]+", t) if w]
            return [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]
        gc, gr = grams(cand), grams(ref)
        cc, cr = Counter(gc), Counter(gr)
        m = sum(min(c, cr[g]) for g, c in cc.items())
        p = m / len(gc) if gc else 0.0
        r = m / len(gr) if gr else 0.0
        f = 2 * p * r / (p + r) if p + r else 0.0
        return (len(gc), len(gr), m, p, r, f)

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(100)
    for n in (1, 2):
        out = compile_pipeline(
            [{"$truncateTokens": {"input": "$text", "as": "ref",
                                  "max": 40}},
             {"$ngramOverlap": {"candidate": "$text", "reference": "$ref",
                                "n": n, "as": "ov"}}],
            Context(spark=spark))(docs).select("text", "ref", "ov") \
            .collect()
        assert len(out) > 50
        for r in out:
            got = (r["ov"]["n_cand"], r["ov"]["n_ref"], r["ov"]["n_match"],
                   r["ov"]["precision"], r["ov"]["recall"], r["ov"]["f1"])
            want = ref_overlap(r["text"], r["ref"], n)
            assert got[:3] == want[:3], (n, got, want)
            for g, w in zip(got[3:], want[3:]):
                assert abs(g - w) < 1e-12, (n, got, want)
    # clipping: "a a a" vs "a" matches once, not three times
    df = spark.createDataFrame(
        [(1, "a a a", "a"), (2, "x", ""), (3, "w", None),
         (4, "b c", "b c")],
        "i long, c string, r string")
    out = {r["i"]: r["ov"] for r in compile_pipeline(
        [{"$ngramOverlap": {"candidate": "$c", "reference": "$r",
                            "as": "ov"}}],
        Context(spark=spark))(df).collect()}
    assert (out[1]["n_match"], out[1]["precision"], out[1]["recall"]) \
        == (1, 1 / 3, 1.0)
    assert (out[2]["n_match"], out[2]["precision"], out[2]["recall"],
            out[2]["f1"]) == (0, 0.0, 0.0, 0.0)
    assert out[3] is None
    assert out[4]["f1"] == 1.0
    # bigrams on a one-word doc: zero grams, zero scores
    short = compile_pipeline(
        [{"$ngramOverlap": {"candidate": "$c", "reference": "$c",
                            "n": 2, "as": "ov"}}],
        Context(spark=spark))(
        spark.createDataFrame([("solo",)], "c string")).collect()
    assert short[0]["ov"]["n_cand"] == 0 and short[0]["ov"]["f1"] == 0.0
    with pytest.raises(ValueError, match="n must be"):
        compile_pipeline(
            [{"$ngramOverlap": {"candidate": "$c", "reference": "$c",
                                "n": 0}}], Context(spark=spark))


def test_bpe_decode_review_hardening(spark):
    """review r7 fixes, pinned: (a) onError:'null' yields null (not a
    job abort) for tokens outside the remap alphabet; (b) a null token
    ELEMENT raises by default instead of silently vanishing in
    concat_ws, and yields null when lenient; (c) null id elements
    follow the same contract; (d) FS/GS/RS/US control chars class as
    punctuation, not whitespace (Unicode White_Space = the GPT-2
    regex's \\s, unlike Python isspace)."""
    from pincette_mongo_streams_spark.functions.bpe import (
        decode, pretokenize,
    )

    ctx = Context(spark=spark)
    # (a) raw CJK is not a remap-space token
    raw = spark.createDataFrame([(["日"],), (["ok"],)], "toks array<string>")
    out = compile_pipeline(
        [{"$bpeDecode": {"input": "$toks", "onError": "null"}}],
        ctx)(raw).collect()
    assert [r["text"] for r in out] == [None, "ok"]
    # advisor r8: the alphabet guard now catches this at the remap
    # boundary (it used to surface as a charset decode failure)
    with pytest.raises(Exception, match="remap alphabet"):
        compile_pipeline([{"$bpeDecode": {"input": "$toks"}}],
                         ctx)(raw).collect()
    # (b) null element: error by default, null when lenient
    holey = spark.createDataFrame([(["Ġthe", None, "re"],)],
                                  "toks array<string>")
    with pytest.raises(Exception, match="null token element"):
        compile_pipeline([{"$bpeDecode": {"input": "$toks"}}],
                         ctx)(holey).collect()
    out = compile_pipeline(
        [{"$bpeDecode": {"input": "$toks", "onError": "null"}}],
        ctx)(holey).collect()
    assert out[0]["text"] is None
    # (c) null id element
    vocab_df = spark.createDataFrame([("ok", 1)], "token string, id long")
    ctx_v = Context(spark=spark, collections={"v": vocab_df})
    ids = spark.createDataFrame([([1, None],)], "ids array<long>")
    with pytest.raises(Exception, match="null id element"):
        compile_pipeline(
            [{"$bpeDecode": {"input": "$ids",
                             "tokenizer": {"vocab": "v"}}}],
            ctx_v)(ids).collect()
    out = compile_pipeline(
        [{"$bpeDecode": {"input": "$ids", "onError": "null",
                         "tokenizer": {"vocab": "v"}}}],
        ctx_v)(ids).collect()
    assert out[0]["text"] is None
    # (d) \x1c-\x1f are NOT whitespace to the GPT-2 pattern: "\x1c,a"
    # pre-tokenizes as one punct run then the letter, and round-trips
    assert pretokenize("\x1c,a") == ["\x1c,", "a"]
    # ...so the punct alternative's optional space attaches to \x1d
    assert pretokenize("a \x1d b") == ["a", " \x1d", " b"]


def test_bpe_broadcast_memo_survives_gc_address_reuse(spark):
    """review r7: the rebind memo holds STRONG DataFrame references —
    after del-ing the old collection frame (allowing id() reuse), a new
    frame at any address must still be detected as a rebind."""
    import gc

    from pincette_mongo_streams_spark.functions import bpe as bpe_mod

    ctx = Context(spark=spark, collections={"merges": _merges_df(spark)})
    bc1 = bpe_mod.broadcast_tokenizer(ctx, "merges")
    (frames1, _), = [v for k, v in ctx._bpe_broadcasts.items()]
    assert frames1[0] is ctx.collections["merges"]  # strong ref held
    old = ctx.collections["merges"]
    del ctx.collections["merges"]
    del old
    gc.collect()
    ctx.collections["merges"] = spark.createDataFrame(
        [("x", "y", 0)], "left string, right string, rank long")
    bc2 = bpe_mod.broadcast_tokenizer(ctx, "merges")
    assert bc2 is not bc1
    assert bc2.value[0] == {("x", "y"): 0}
    bpe_mod.release_broadcasts(ctx)


def _ref_bleu(cand, ref, max_n=4, smooth=None):
    """Independent sentence-BLEU (Papineni 2002; Lin&Och add-one for
    n>=2 when smooth='add1')."""
    import math as _math
    import re as _re
    from collections import Counter

    # Java \s semantics, as in the engine's F.split (review r7)
    wc = [w for w in _re.split(r"[ \t\n\r\f\x0b]+", cand) if w]
    wr = [w for w in _re.split(r"[ \t\n\r\f\x0b]+", ref) if w]

    def grams(ws, n):
        return [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]

    log_sum = 0.0
    for n in range(1, max_n + 1):
        gc, gr = grams(wc, n), grams(wr, n)
        cc, cr = Counter(gc), Counter(gr)
        m = sum(min(k, cr[g]) for g, k in cc.items())
        if not gc:
            return 0.0
        if smooth == "add1" and n >= 2:
            p = (m + 1) / (len(gc) + 1)
        else:
            if m == 0:
                return 0.0
            p = m / len(gc)
        log_sum += _math.log(p) / max_n
    bp = 1.0 if len(wc) >= len(wr) else _math.exp(1 - len(wr) / len(wc))
    return bp * _math.exp(log_sum)


def test_bleu_differential_and_edges(spark):
    """r7: $bleu matches an independent Python implementation over the
    real documents corpus (candidate = first-30-words truncation,
    reference = full text -> exercises the brevity penalty), smoothed
    and unsmoothed, plus hand edge cases."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(80)
    for smooth in (None, "add1"):
        spec = {"candidate": "$cand", "reference": "$text", "as": "b"}
        if smooth:
            spec["smooth"] = smooth
        out = compile_pipeline(
            [{"$truncateTokens": {"input": "$text", "as": "cand",
                                  "max": 30}},
             {"$bleu": spec}],
            Context(spark=spark))(docs).select("cand", "text", "b") \
            .collect()
        assert len(out) > 40
        nonzero = 0
        for r in out:
            want = _ref_bleu(r["cand"], r["text"], 4, smooth)
            assert abs(r["b"] - want) < 1e-12, (smooth, r["b"], want)
            nonzero += r["b"] > 0
        assert nonzero > 20  # the pairing produces real scores
    # identical texts: BLEU 1; disjoint: 0; null: null; short candidate
    df = spark.createDataFrame(
        [(1, "a b c d e", "a b c d e"), (2, "x y z w q", "a b c d e"),
         (3, None, "a"), (4, "a b", "a b")],
        "i long, c string, r string")
    out = {r["i"]: r["b"] for r in compile_pipeline(
        [{"$bleu": {"candidate": "$c", "reference": "$r", "as": "b"}}],
        Context(spark=spark))(df).collect()}
    assert out[1] == 1.0 and out[2] == 0.0 and out[3] is None
    assert out[4] == 0.0  # two words -> no 4-grams -> unsmoothed zero
    # maxN 2: perfect short match scores 1
    out2 = compile_pipeline(
        [{"$bleu": {"candidate": "$c", "reference": "$r", "maxN": 2,
                    "as": "b"}}],
        Context(spark=spark))(df.filter("i = 4")).collect()
    assert out2[0]["b"] == 1.0
    with pytest.raises(ValueError, match="maxN"):
        compile_pipeline([{"$bleu": {"candidate": "$c", "reference": "$r",
                                     "maxN": 0}}], Context(spark=spark))
    with pytest.raises(ValueError, match="smooth"):
        compile_pipeline([{"$bleu": {"candidate": "$c", "reference": "$r",
                                     "smooth": "epsilon"}}],
                         Context(spark=spark))


def test_profile_stage(spark):
    """r7: $profile — one aggregate pass, one row per column, exact and
    approx modes, null accounting, validation."""
    df = spark.createDataFrame(
        [(1.0, 10, "x"), (2.0, None, "y"), (2.0, 30, "z"),
         (None, 40, "w")],
        "a double, b long, s string")
    rows = compile_pipeline(
        [{"$profile": {"columns": ["a", "b"], "exact": True,
                       "percentiles": [0.5]}},
         {"$sort": {"column": 1}}],
        Context(spark=spark))(df).collect()
    by = {r["column"]: r for r in rows}
    assert set(by) == {"a", "b"}
    a = by["a"]
    assert (a["n_rows"], a["n_null"], a["n_distinct"]) == (4, 1, 2)
    assert (a["min"], a["max"]) == (1.0, 2.0)
    assert abs(a["mean"] - 5 / 3) < 1e-12
    assert a["p50"] == 2.0
    b = by["b"]
    assert (b["n_null"], b["n_distinct"], b["p50"]) == (1, 3, 30.0)
    # approx mode still produces a row per column with sane bounds
    rows2 = compile_pipeline(
        [{"$profile": {"columns": ["a"]}}],
        Context(spark=spark))(df).collect()
    assert rows2[0]["n_distinct"] >= 1 and rows2[0]["p75"] is not None
    # a single-shuffle plan: stats never trigger per-column jobs
    plan = compile_pipeline(
        [{"$profile": {"columns": ["a", "b"]}}],
        Context(spark=spark))(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Generate" in plan  # inline() pivot, not a driver collect
    # dotted column names resolve (backtick-quoted access — review r7)
    dotted = spark.createDataFrame([(1.0,), (3.0,)], ["x.y"])
    drow = compile_pipeline(
        [{"$profile": {"columns": ["x.y"], "exact": True}}],
        Context(spark=spark))(dotted).collect()
    assert drow[0]["column"] == "x.y" and drow[0]["mean"] == 2.0
    # r9: string columns profile instead of raising; validation now
    # rejects only genuinely unprofilable types (arrays, structs)
    # r11: array<numeric> became the "vector" kind — the reject case
    # is now a non-numeric array
    arr_df = spark.createDataFrame([(["x"],)], "v array<string>")
    for frame, bad, msg in (
        (df, {"columns": []}, "non-empty"),
        (df, {"columns": ["nope"]}, "no column"),
        (arr_df, {"columns": ["v"]}, "profilable kinds"),
        (df, {"columns": ["a", "a"]}, "distinct"),
        (df, {"columns": ["a"], "topK": -1}, "topK"),
        (df, {"columns": ["a"], "percentiles": [1.5]}, "0, 1"),
        (df, {"columns": ["a"], "percentiles": [0.501, 0.502]},
         "collide"),
    ):
        with pytest.raises(ValueError, match=msg):
            compile_pipeline([{"$profile": bad}],
                             Context(spark=spark))(frame).collect()


def test_profile_string_and_date_columns(spark):
    """r9 (verdict item 5): $profile over string and date/timestamp
    columns — null/distinct accounting, lexicographic + length stats,
    deterministic topK (count desc, value asc), ISO min/max rendering,
    type-tagged rows with inapplicable fields null."""
    import datetime as dt
    df = spark.createDataFrame(
        [("b", dt.datetime(2020, 1, 2, 3, 4, 5), dt.date(2020, 1, 2)),
         ("aa", dt.datetime(2021, 6, 7, 8, 9, 10, 123456),
          dt.date(2021, 6, 7)),
         ("b", None, None),
         (None, dt.datetime(2020, 1, 2, 3, 4, 5), dt.date(2020, 1, 2)),
         ("cc", dt.datetime(2019, 12, 31, 23, 59, 59),
          dt.date(2019, 12, 31))],
        "s string, ts timestamp, d date")
    rows = compile_pipeline(
        [{"$profile": {"columns": ["s", "ts", "d"], "exact": True,
                       "topK": 2}},
         {"$sort": {"column": 1}}],
        Context(spark=spark))(df).collect()
    by = {r["column"]: r for r in rows}
    s = by["s"]
    assert s["type"] == "string"
    assert (s["n_rows"], s["n_null"], s["n_distinct"]) == (5, 1, 3)
    assert (s["min_str"], s["max_str"]) == ("aa", "cc")
    assert (s["min_len"], s["max_len"]) == (1, 2)
    assert abs(s["avg_len"] - 6 / 4) < 1e-12
    # ties on count resolve by value asc; count desc first
    assert [(t["value"], t["n"]) for t in s["top"]] == [("b", 2),
                                                        ("aa", 1)]
    assert s["min"] is None and s["mean"] is None
    ts = by["ts"]
    assert ts["type"] == "timestamp" and ts["n_null"] == 1
    assert ts["n_distinct"] == 3
    assert ts["min_str"] == "2019-12-31T23:59:59.000000"
    assert ts["max_str"] == "2021-06-07T08:09:10.123456"
    assert ts["top"] is None and ts["min_len"] is None
    d = by["d"]
    assert d["type"] == "date"
    assert (d["min_str"], d["max_str"]) == ("2019-12-31", "2021-06-07")
    # topK off -> top stays null even for strings
    r0 = compile_pipeline(
        [{"$profile": {"columns": ["s"], "exact": True}}],
        Context(spark=spark))(df).collect()[0]
    assert r0["top"] is None


def test_rouge_l_differential_and_edges(spark):
    """r7: $rougeL vs an independent recursive-memo LCS over randomized
    word sequences AND the real documents corpus; Lin's F_lcs with
    beta; maxWords truncation; null/empty edges."""
    import random
    import re as _re
    from functools import lru_cache

    def ref_lcs(a, b):
        @lru_cache(maxsize=None)
        def go(i, j):
            if i == len(a) or j == len(b):
                return 0
            if a[i] == b[j]:
                return 1 + go(i + 1, j + 1)
            return max(go(i + 1, j), go(i, j + 1))
        return go(0, 0)

    def ref_rouge(c, r, beta=1.0, mw=2000):
        wc = [w for w in _re.split(r"[ \t\n\r\f\x0b]+", c) if w][:mw]
        wr = [w for w in _re.split(r"[ \t\n\r\f\x0b]+", r) if w][:mw]
        m = ref_lcs(tuple(wc), tuple(wr))
        p = m / len(wc) if wc else 0.0
        rr = m / len(wr) if wr else 0.0
        b2 = beta * beta
        f = (1 + b2) * p * rr / (rr + b2 * p) if p + rr else 0.0
        return (m, p, rr, f)

    rng = random.Random(41)
    rows = []
    for i in range(60):
        n1, n2 = rng.randint(0, 12), rng.randint(0, 12)
        rows.append((i,
                     " ".join(rng.choice("abcde") for _ in range(n1)),
                     " ".join(rng.choice("abcde") for _ in range(n2))))
    df = spark.createDataFrame(rows, "i long, c string, r string")
    got = {r["i"]: r["rl"] for r in compile_pipeline(
        [{"$rougeL": {"candidate": "$c", "reference": "$r", "as": "rl",
                      "beta": 1.2}}],
        Context(spark=spark))(df).collect()}
    for i, c, r in rows:
        m, p, rr, f = ref_rouge(c, r, beta=1.2)
        g = got[i]
        assert g["lcs"] == m, (c, r, g)
        assert abs(g["f1"] - f) < 1e-12
    # real corpus: candidate = 25-word truncation of the text itself ->
    # LCS == candidate length (a subsequence of the original)
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(40)
    out = compile_pipeline(
        [{"$truncateTokens": {"input": "$text", "as": "cand", "max": 25}},
         {"$rougeL": {"candidate": "$cand", "reference": "$text",
                      "as": "rl"}}],
        Context(spark=spark))(docs).select("cand", "rl").collect()
    for r in out:
        n_c = len([w for w in _re.split(r"[ \t\n\r\f\x0b]+",
                                        r["cand"]) if w])
        assert r["rl"]["lcs"] == n_c and r["rl"]["precision"] == 1.0
    # maxWords truncates both sides
    long = spark.createDataFrame(
        [(" ".join(["w"] * 50), " ".join(["w"] * 50))], "c string, r string")
    capped = compile_pipeline(
        [{"$rougeL": {"candidate": "$c", "reference": "$r",
                      "maxWords": 10, "as": "rl"}}],
        Context(spark=spark))(long).collect()
    assert capped[0]["rl"]["lcs"] == 10 and capped[0]["rl"]["f1"] == 1.0
    with pytest.raises(ValueError, match="beta"):
        compile_pipeline([{"$rougeL": {"candidate": "$c", "reference": "$r",
                                       "beta": 0}}], Context(spark=spark))
    with pytest.raises(ValueError, match="maxWords"):
        compile_pipeline([{"$rougeL": {"candidate": "$c", "reference": "$r",
                                       "maxWords": 0}}],
                         Context(spark=spark))


def test_eval_max_words_cap_advisor_r8(spark):
    """advisor r8: $bleu and $ngramOverlap carry $rougeL's maxWords cap
    (default 2000) — the clipped-match HOF is O(d·(|c|+|r|)) per row,
    so one pathological pair must not cost ~10^9 comparisons.  Pinned:
    the cap truncates BOTH sides (a capped identical pair scores
    perfect), the default leaves normal documents untouched, and the
    validation rejects non-positive caps."""
    ctx = Context(spark=spark)
    long_pair = spark.createDataFrame(
        [(" ".join(f"w{i}" for i in range(50)),
          " ".join(f"w{i}" for i in range(40)))], "c string, r string")
    # cap 10: both sides truncate to the same 10-word prefix -> BLEU 1,
    # overlap f1 1 (without the cap: brevity penalty + clipped counts
    # over 50/40 words give a strictly lower score)
    capped = compile_pipeline(
        [{"$bleu": {"candidate": "$c", "reference": "$r",
                    "maxWords": 10, "as": "b"}},
         {"$ngramOverlap": {"candidate": "$c", "reference": "$r",
                            "n": 2, "maxWords": 10, "as": "ov"}}],
        ctx)(long_pair).collect()[0]
    assert capped["b"] == 1.0
    assert capped["ov"]["n_cand"] == 9 and capped["ov"]["f1"] == 1.0
    uncapped = compile_pipeline(
        [{"$bleu": {"candidate": "$c", "reference": "$r", "as": "b"}}],
        ctx)(long_pair).collect()[0]
    assert uncapped["b"] < 1.0
    for stage, spec in (
        ("$bleu", {"candidate": "$c", "reference": "$r", "maxWords": 0}),
        ("$ngramOverlap", {"candidate": "$c", "reference": "$r",
                           "maxWords": -1}),
    ):
        with pytest.raises(ValueError, match="maxWords"):
            compile_pipeline([{stage: spec}], ctx)


def test_bpe_decode_alphabet_guard_advisor_r8(spark):
    """advisor r8: the string path rejects tokens containing chars that
    are latin-1 bytes but NOT in the GPT-2 remap alphabet ("\\x07", a
    raw "\\n") — these are never $bpeEncode output (the remap maps
    those bytes to the Ā range) and the id path rejects their vocab
    analogs, so silently decoding them was a divergence."""
    ctx = Context(spark=spark)
    df = spark.createDataFrame(
        [(1, ["Ġthe"]), (2, ["\x07"]), (3, ["a\nb"]), (4, ["ok", "Ċ"])],
        "i long, toks array<string>")
    out = {r["i"]: r["text"] for r in compile_pipeline(
        [{"$bpeDecode": {"input": "$toks", "onError": "null"}}],
        ctx)(df).collect()}
    # Ġ/Ċ ARE the remap symbols for space/newline — they decode;
    # the raw control bytes do not
    assert out[1] == " the" and out[4] == "ok\n"
    assert out[2] is None and out[3] is None
    for i in (2, 3):
        with pytest.raises(Exception, match="remap alphabet"):
            compile_pipeline([{"$bpeDecode": {"input": "$toks"}}],
                             ctx)(df.filter(f"i = {i}")).collect()


def _ref_bleu_multi(cand, refs, max_n=4, smooth=None):
    """Independent MULTI-reference sentence-BLEU (Papineni 2002
    §2.2-2.3): per-gram clip against the MAX count across references;
    brevity penalty uses the reference length closest to the
    candidate's, ties -> shorter."""
    import math as _math
    import re as _re
    from collections import Counter

    ws = lambda t: [w for w in _re.split(r"[ \t\n\r\f\x0b]+", t) if w]
    wc = ws(cand)
    wrs = [ws(r) for r in refs if r is not None]

    def grams(w, n):
        return [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]

    log_sum = 0.0
    for n in range(1, max_n + 1):
        gc = grams(wc, n)
        crs = [Counter(grams(wr, n)) for wr in wrs]
        cc = Counter(gc)
        m = sum(min(k, max(cr[g] for cr in crs)) for g, k in cc.items())
        if not gc:
            return 0.0
        if smooth == "add1" and n >= 2:
            p = (m + 1) / (len(gc) + 1)
        else:
            if m == 0:
                return 0.0
            p = m / len(gc)
        log_sum += _math.log(p) / max_n
    r_len = min((len(wr) for wr in wrs),
                key=lambda L: (abs(L - len(wc)), L))
    bp = 1.0 if len(wc) >= r_len else _math.exp(1 - r_len / len(wc))
    return bp * _math.exp(log_sum)


def test_bleu_rouge_multireference_differential(spark):
    """r9 (verdict item 4): multi-reference $bleu/$rougeL vs independent
    Python implementations over the real documents corpus, with a
    2-reference row-local fixture (full text + first-10-words prefix),
    smoothed and unsmoothed; plus the degenerate-form equivalences."""
    import re as _re

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(80)
    fixture = [
        {"$truncateTokens": {"input": "$text", "as": "cand", "max": 30}},
        {"$truncateTokens": {"input": "$text", "as": "ref2", "max": 10}},
    ]
    ws = lambda t: [w for w in _re.split(r"[ \t\n\r\f\x0b]+", t) if w]
    for smooth in (None, "add1"):
        spec = {"candidate": "$cand",
                "references": ["$text", "$ref2"], "as": "b"}
        if smooth:
            spec["smooth"] = smooth
        out = compile_pipeline(
            fixture + [{"$bleu": spec},
                       {"$rougeL": {"candidate": "$cand",
                                    "references": ["$text", "$ref2"],
                                    "as": "rl"}}],
            Context(spark=spark))(docs) \
            .select("cand", "text", "ref2", "b", "rl").collect()
        assert len(out) > 40
        better = 0
        for r in out:
            want = _ref_bleu_multi(r["cand"], [r["text"], r["ref2"]],
                                   4, smooth)
            assert abs(r["b"] - want) < 1e-12, (smooth, r["b"], want)
            # multi-ref can only help: >= each single-ref score with
            # the same BP choice is NOT guaranteed (BP changes), but
            # the clipped counts dominate the single-text run often
            # enough to prove the max-clip actually engages
            single = _ref_bleu(r["cand"], r["text"], 4, smooth)
            better += r["b"] > single + 1e-15
            # independent multi-ref ROUGE-L: max F over the two refs
            def lcs(a, b):
                prev = [0] * (len(b) + 1)
                for x in a:
                    cur = [0]
                    for j, y in enumerate(b, 1):
                        cur.append(prev[j - 1] + 1 if x == y
                                   else max(prev[j], cur[j - 1]))
                    prev = cur
                return prev[-1]

            best = None
            for rt in (r["text"], r["ref2"]):
                wc_, wr_ = ws(r["cand"])[:2000], ws(rt)[:2000]
                m = lcs(wc_, wr_)
                p = m / len(wc_) if wc_ else 0.0
                rr = m / len(wr_) if wr_ else 0.0
                f = 2 * p * rr / (p + rr) if p + rr else 0.0
                if best is None or f > best[3]:
                    best = (m, p, rr, f)
            got = r["rl"]
            assert got["lcs"] == best[0]
            assert abs(got["f1"] - best[3]) < 1e-12
        assert better > 10  # the short second ref raises BP often
    # validation: both / neither reference form rejected
    for stage in ("$bleu", "$rougeL"):
        with pytest.raises(ValueError, match="exactly one"):
            compile_pipeline([{stage: {"candidate": "$c"}}],
                             Context(spark=spark))
        with pytest.raises(ValueError, match="exactly one"):
            compile_pipeline(
                [{stage: {"candidate": "$c", "reference": "$r",
                          "references": ["$r"]}}], Context(spark=spark))


def test_bleu_multiref_edge_cases(spark):
    """r9 hand edges for the multi-reference forms: identical-to-one-ref
    scores 1.0; BP picks the closest-length reference with ties to the
    shorter; max-clip credits a gram up to the MOST any single
    reference supports, never the sum; rougeL multi-ref tie resolves to
    array order."""
    ctx = Context(spark=spark)
    # candidate 5 words; refs of len 5 (exact copy) and len 2
    df = spark.createDataFrame(
        [(1, "a b c d e", ["a b c d e", "a b"])],
        "i long, c string, refs array<string>")
    r = compile_pipeline(
        [{"$bleu": {"candidate": "$c", "references": "$refs",
                    "as": "b"}}], ctx)(df).collect()[0]
    assert r["b"] == 1.0
    # clip is max-not-sum: candidate "x x", each ref has ONE x -> the
    # unigram match is clipped at 1 (sum across refs would give 2 and
    # precision 1.0)
    df2 = spark.createDataFrame(
        [(1, "x x", ["x y", "x z"])], "i long, c string, refs array<string>")
    r2 = compile_pipeline(
        [{"$bleu": {"candidate": "$c", "references": "$refs", "maxN": 1,
                    "as": "b"}}], ctx)(df2).collect()[0]
    assert abs(r2["b"] - 0.5) < 1e-12
    # BP tie -> shorter ref: candidate len 2, refs len 1 and 3 are
    # equidistant -> r_len = 1 <= c_len -> BP 1.0; with only the len-3
    # ref, BP = exp(1 - 3/2) < 1
    df3 = spark.createDataFrame(
        [(1, "a b", ["a", "a b c"]), (2, "a b", ["a b c"])],
        "i long, c string, refs array<string>")
    out3 = {r["i"]: r["b"] for r in compile_pipeline(
        [{"$bleu": {"candidate": "$c", "references": "$refs", "maxN": 1,
                    "as": "b"}}], ctx)(df3).collect()}
    import math
    assert abs(out3[1] - 1.0) < 1e-12           # tie -> shorter -> BP 1
    assert abs(out3[2] - math.exp(-0.5)) < 1e-12
    # rougeL max-F tie -> FIRST reference's struct
    df4 = spark.createDataFrame(
        [(1, "a b", ["a b", "b a"])], "i long, c string, refs array<string>")
    r4 = compile_pipeline(
        [{"$rougeL": {"candidate": "$c", "references": "$refs",
                      "as": "rl"}}], ctx)(df4).collect()[0]["rl"]
    assert r4["lcs"] == 2 and r4["f1"] == 1.0  # first ref wins the tie


def _ref_chrf(c, r, max_n=6, beta=2.0, max_chars=2000):
    """Independent chrF per the stage's pinned spec (Popović 2015:
    whitespace stripped, clipped char-n-gram P/R averaged over
    effective orders, F_beta with beta=2).  Whitespace is the JAVA \\s
    class (ASCII) like the whole eval family — Python's Unicode \\s
    would also strip \\xa0, which the engine deliberately keeps."""
    import re as _re
    from collections import Counter

    c = _re.sub(r"[ \t\n\r\f\x0b]+", "", c)[:max_chars]
    r = _re.sub(r"[ \t\n\r\f\x0b]+", "", r)[:max_chars]
    ps = rs = 0.0
    eff = 0
    for n in range(1, max_n + 1):
        gc = [c[i:i + n] for i in range(len(c) - n + 1)]
        gr = [r[i:i + n] for i in range(len(r) - n + 1)]
        if not gc and not gr:
            continue
        eff += 1
        cc, cr = Counter(gc), Counter(gr)
        m = sum(min(v, cr[g]) for g, v in cc.items())
        ps += m / len(gc) if gc else 0.0
        rs += m / len(gr) if gr else 0.0
    if eff == 0:
        return 0.0
    p, r2 = ps / eff, rs / eff
    if p + r2 == 0:
        return 0.0
    b2 = beta * beta
    return (1 + b2) * p * r2 / (b2 * p + r2)


def test_chrf_differential_and_edges(spark):
    """r9: $chrf vs an independent Python implementation over the real
    documents corpus (candidate = 10-word prefix vs 20-word prefix —
    partial character overlap both ways), plus hand edges: identical ->
    1.0, empty-vs-anything -> 0.0, null -> null, beta/maxN/maxChars
    validation."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(80)
    out = compile_pipeline(
        [{"$truncateTokens": {"input": "$text", "as": "c10", "max": 10}},
         {"$truncateTokens": {"input": "$text", "as": "c20", "max": 20}},
         {"$chrf": {"candidate": "$c10", "reference": "$c20",
                    "as": "s"}}],
        Context(spark=spark))(docs).select("c10", "c20", "s").collect()
    assert len(out) > 40
    for r in out:
        want = _ref_chrf(r["c10"], r["c20"])
        assert abs(r["s"] - want) < 1e-12, (r["s"], want)
    ctx = Context(spark=spark)
    df = spark.createDataFrame(
        [(1, "same text", "same text"), (2, "", "x"), (3, None, "x"),
         (4, "ab", "ba")],
        "i long, c string, r string")
    got = {r["i"]: r["s"] for r in compile_pipeline(
        [{"$chrf": {"candidate": "$c", "reference": "$r", "as": "s"}}],
        ctx)(df).collect()}
    assert got[1] == 1.0 and got[2] == 0.0 and got[3] is None
    assert abs(got[4] - _ref_chrf("ab", "ba")) < 1e-12
    for bad, msg in (({"maxN": 0}, "maxN"), ({"beta": 0}, "beta"),
                     ({"maxChars": 0}, "maxChars")):
        with pytest.raises(ValueError, match=msg):
            compile_pipeline(
                [{"$chrf": {"candidate": "$c", "reference": "$r",
                            **bad}}], ctx)


def _ref_qa(pred, answers):
    """Independent SQuAD normalize + EM/F1 (official script logic)."""
    import re as _re
    from collections import Counter

    def norm(s):
        # the stage's pinned portable semantics: Java-\\s (ASCII)
        # whitespace split — Python's Unicode \\s/strip() would also
        # treat \\xa0 as whitespace — and articles dropped as
        # standalone TOKENS (\\b boundary classes disagree between
        # Java, RE2 and Python around chars like ½)
        s = s.lower()
        s = _re.sub(r"""[!"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~]""", "", s)
        return [w for w in _re.split(r"[ \t\n\r\f\x0b]+", s)
                if w and w not in ("a", "an", "the")]

    tp = norm(pred)
    best_f, em = 0.0, 0.0
    for a in answers:
        ta = norm(a)
        if ta == tp:
            em = 1.0
        if not tp and not ta:
            f = 1.0
        else:
            cc, ca = Counter(tp), Counter(ta)
            m = sum(min(v, ca[g]) for g, v in cc.items())
            p = m / len(tp) if tp else 0.0
            r = m / len(ta) if ta else 0.0
            f = 2 * p * r / (p + r) if p + r else 0.0
        best_f = max(best_f, f)
    return em, best_f


def test_qa_eval_differential_and_edges(spark):
    """r9: $qaEval vs the independent SQuAD script logic over the real
    corpus (prediction = 8-word prefix; answers = [5-word prefix,
    'the <8-word prefix>!'] — the second normalizes equal to the
    prediction, so EM flips on by construction), plus hand edges."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(60)
    out = compile_pipeline(
        [{"$truncateTokens": {"input": "$text", "as": "p8", "max": 8}},
         {"$truncateTokens": {"input": "$text", "as": "p5", "max": 5}},
         {"$set": {"golds": ["$p5",
                             {"$concat": ["The ", "$p8", "!"]}]}},
         {"$qaEval": {"prediction": "$p8", "answers": "$golds",
                      "as": "q"}}],
        Context(spark=spark))(docs) \
        .select("p8", "p5", "q").collect()
    assert len(out) > 40
    for r in out:
        em, f1 = _ref_qa(r["p8"], [r["p5"], "The " + r["p8"] + "!"])
        assert r["q"]["exact_match"] == em
        assert abs(r["q"]["f1"] - f1) < 1e-12
        assert em == 1.0  # the constructed gold matches by design
    ctx = Context(spark=spark)
    df = spark.createDataFrame(
        [(1, "An apple!", ["apple"]), (2, "dog", ["cat", "dog house"]),
         (3, None, ["x"]), (4, "x", None), (5, "x", []),
         (6, "x", [None])],
        "i long, p string, a array<string>")
    got = {r["i"]: r["q"] for r in compile_pipeline(
        [{"$qaEval": {"prediction": "$p", "answers": "$a", "as": "q"}}],
        ctx)(df).collect()}
    assert got[1]["exact_match"] == 1.0 and got[1]["f1"] == 1.0
    assert got[2]["exact_match"] == 0.0
    assert abs(got[2]["f1"] - 2 * (1 / 1) * (1 / 2) / (1.5)) < 1e-12
    assert got[3] is None and got[4] is None
    assert got[5] is None and got[6] is None


def test_bleu_corpus_differential_and_gate(spark):
    """r9: $bleuCorpus — corpus-level BLEU (Papineni 2002 §2, the
    reported-metric aggregation, NOT averaged sentence BLEU) vs an
    independent Python implementation over the real corpus, scalar and
    multi-reference, smoothed and unsmoothed; null segments excluded;
    corpus-only gating like $profile."""
    import math
    import re as _re
    from collections import Counter

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(60)
    rows = [(r["text"],) for r in docs.select("text").collect()]

    def ws(t):
        return [w for w in _re.split(r"[ \t\n\r\f\x0b]+", t) if w]

    def grams(w, n):
        return [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]

    def ref_corpus(pairs, max_n=4, smooth=None, multi=False):
        M = [0] * (max_n + 1)
        T = [0] * (max_n + 1)
        CL = RL = 0
        for c, refs in pairs:
            wc = ws(c)
            wrs = [ws(r) for r in refs]
            CL += len(wc)
            RL += min((len(w) for w in wrs),
                      key=lambda L: (abs(L - len(wc)), L))
            for n in range(1, max_n + 1):
                gc = grams(wc, n)
                crs = [Counter(grams(w, n)) for w in wrs]
                cc = Counter(gc)
                M[n] += sum(min(v, max(cr[g] for cr in crs))
                            for g, v in cc.items())
                T[n] += len(gc)
        logs = 0.0
        for n in range(1, max_n + 1):
            if smooth == "add1" and n >= 2:
                if T[n] == 0:
                    return 0.0
                p = (M[n] + 1) / (T[n] + 1)
            else:
                if T[n] == 0 or M[n] == 0:
                    return 0.0
                p = M[n] / T[n]
            logs += math.log(p) / max_n
        bp = 1.0 if CL >= RL else math.exp(1 - RL / CL)
        return bp * math.exp(logs)

    for smooth in (None, "add1"):
        # scalar: candidate = doubled 10-word prefix vs full text
        pairs = []
        for (t,) in rows:
            p10 = " ".join(ws(t)[:10])
            pairs.append((p10 + " " + p10, [t]))
        spec = {"candidate": "$cand", "reference": "$text"}
        if smooth:
            spec["smooth"] = smooth
        got = compile_pipeline(
            [{"$truncateTokens": {"input": "$text", "as": "p10",
                                  "max": 10}},
             {"$set": {"cand": {"$concat": ["$p10", " ", "$p10"]}}},
             {"$bleuCorpus": spec}],
            Context(spark=spark))(docs).collect()[0]
        want = ref_corpus(pairs, smooth=smooth)
        assert abs(got["bleu"] - want) < 1e-12, (smooth, got["bleu"], want)
        assert got["n_segments"] == len(rows)
        # multi-reference: [full text, 5-word prefix]
        mpairs = [(c, [t, " ".join(ws(t)[:5])])
                  for (c, (t,)) in zip((p[0] for p in pairs), rows)]
        mspec = {"candidate": "$cand", "references": ["$text", "$p5"]}
        if smooth:
            mspec["smooth"] = smooth
        mgot = compile_pipeline(
            [{"$truncateTokens": {"input": "$text", "as": "p10",
                                  "max": 10}},
             {"$truncateTokens": {"input": "$text", "as": "p5",
                                  "max": 5}},
             {"$set": {"cand": {"$concat": ["$p10", " ", "$p10"]}}},
             {"$bleuCorpus": mspec}],
            Context(spark=spark))(docs).collect()[0]
        mwant = ref_corpus(mpairs, smooth=smooth, multi=True)
        assert abs(mgot["bleu"] - mwant) < 1e-12
    # null segments are excluded from every sum
    df = spark.createDataFrame(
        [(1, "a b", "a b"), (2, None, "x"), (3, "y", None)],
        "i long, c string, r string")
    one = compile_pipeline(
        [{"$bleuCorpus": {"candidate": "$c", "reference": "$r",
                          "maxN": 1}}],
        Context(spark=spark))(df).collect()[0]
    assert one["n_segments"] == 1 and one["bleu"] == 1.0
    # corpus-only: submit-time reject + micro-batch compiler guard
    from pincette_mongo_streams_spark.streaming.runtime import (
        run_streaming,
    )
    src = (spark.readStream.format("rate").load()
           .selectExpr("CAST(value AS STRING) AS c",
                       "CAST(value AS STRING) AS r"))
    with pytest.raises(ValueError, match="corpus-wide"):
        run_streaming(
            src, [{"$bleuCorpus": {"candidate": "$c", "reference": "$r"}}],
            Context(spark=spark), lambda d, e: None)
    mb = Context(spark=spark)
    mb.micro_batch = True
    with pytest.raises(ValueError, match="corpus-wide"):
        compile_pipeline(
            [{"$bleuCorpus": {"candidate": "$c", "reference": "$r"}}],
            mb)(df)
    with pytest.raises(ValueError, match="exactly one"):
        compile_pipeline([{"$bleuCorpus": {"candidate": "$c"}}],
                         Context(spark=spark))


def test_profile_vector_columns(spark):
    """r11: array<numeric> columns profile as type "vector" — numeric
    stat fields carry the L2-norm distribution, *_len fields the
    dimension; nulls counted; non-numeric arrays still rejected."""
    import math

    rows = [(1, [3.0, 4.0]), (2, [6.0, 8.0]), (3, None),
            (4, [0.0, 0.0]), (5, [1.0, 2.0, 2.0])]
    df = spark.createDataFrame(rows, "i long, v array<double>")
    out = compile_pipeline(
        [{"$profile": {"columns": ["v", "i"], "exact": True,
                       "percentiles": [0.5]}}],
        Context(spark=spark))(df).collect()
    byc = {r["column"]: r for r in out}
    g = byc["v"]
    assert g["type"] == "vector"
    assert g["n_rows"] == 5 and g["n_null"] == 1 and g["n_distinct"] == 4
    norms = sorted([5.0, 10.0, 0.0, 3.0])
    assert g["min"] == 0.0 and g["max"] == 10.0
    assert abs(g["mean"] - sum(norms) / 4) < 1e-12
    sd = math.sqrt(sum((x - sum(norms) / 4) ** 2 for x in norms) / 4)
    assert abs(g["stddev"] - sd) < 1e-12
    # interpolated median of [0,3,5,10] = 4.0
    assert abs(g["p50"] - 4.0) < 1e-12
    assert g["min_len"] == 2 and g["max_len"] == 3
    assert abs(g["avg_len"] - 9 / 4) < 1e-12
    assert g["min_str"] is None and g["top"] is None
    assert byc["i"]["type"] == "numeric" and byc["i"]["max"] == 5.0
    # non-numeric arrays still rejected with the actionable message
    sdf = spark.createDataFrame([(1, ["a"])], "i long, s array<string>")
    with pytest.raises(ValueError, match="array<numeric>|profilable"):
        compile_pipeline(
            [{"$profile": {"columns": ["s"]}}],
            Context(spark=spark))(sdf)


# ---------------------------------------------------------------------
# $lexicalDiversity (r12): TTR + MATTR (Covington & McFall 2010)
# ---------------------------------------------------------------------

def test_lexical_diversity_hand_computed(spark):
    from pincette_mongo_streams_spark import Context, compile_pipeline

    rows = [(1, "a b a b c d"), (2, "The the THE"), (3, None), (4, " ")]
    df = spark.createDataFrame(rows, ["i", "t"])
    out = {r["i"]: r["d"] for r in compile_pipeline(
        [{"$lexicalDiversity": {"input": "$t", "window": 3,
                                "as": "d"}}],
        Context(spark=spark))(df).collect()}
    d1 = out[1]
    assert (d1["n_tokens"], d1["n_types"]) == (6, 4)
    assert abs(d1["ttr"] - 4 / 6) < 1e-12
    # windows of 3 over [a b a b c d]: distinct 2,2,3,3 -> 10/12
    assert abs(d1["mattr"] - 10 / 12) < 1e-12
    # case-folded types; shorter than window -> mattr = ttr
    assert out[2]["n_types"] == 1 and out[2]["mattr"] == out[2]["ttr"]
    assert out[3] is None
    assert out[4]["n_tokens"] == 0 and out[4]["mattr"] == 0.0


def test_lexical_diversity_options(spark):
    from pincette_mongo_streams_spark import Context, compile_pipeline

    df = spark.createDataFrame([(1, "A a")], ["i", "t"])
    (r,) = compile_pipeline(
        [{"$lexicalDiversity": {"input": "$t", "caseSensitive": True,
                                "as": "d"}}],
        Context(spark=spark))(df).collect()
    assert r["d"]["n_types"] == 2  # "A" != "a" when caseSensitive
    import pytest as _pytest

    for bad in ({"window": 1}, {"window": 50, "maxWords": 10}):
        with _pytest.raises(ValueError):
            compile_pipeline(
                [{"$lexicalDiversity": {"input": "$t", **bad}}],
                Context(spark=spark))
