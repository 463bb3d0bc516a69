"""r3 training-pipeline operators: $stratifiedSample (deterministic
hash sampling), $chunkText (overlapping context windows), $decontaminate
(benchmark-overlap flagging/dropping)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pincette_mongo_streams_spark import Context, compile_pipeline


def test_stratified_sample_deterministic_and_mapside(spark):
    rows = [Row(_id=str(i), label=("a" if i % 2 else "b")) for i in range(400)]
    df = spark.createDataFrame(rows, "_id string, label string")
    pipeline = [{"$stratifiedSample": {
        "by": "$label", "fractions": {"a": 0.5, "b": 0.1}, "key": "$_id"}}]
    out = compile_pipeline(pipeline, Context(spark=spark))(df)
    got = {r["_id"] for r in out.collect()}
    # deterministic: the same rows every run
    again = {r["_id"] for r in
             compile_pipeline(pipeline, Context(spark=spark))(df).collect()}
    assert got == again
    counts = (
        out.groupBy("label").count().collect()
    )
    by_cls = {r["label"]: r["count"] for r in counts}
    assert 60 <= by_cls.get("a", 0) <= 140  # ~100 of 200 at 0.5
    assert 2 <= by_cls.get("b", 0) <= 50    # ~20 of 200 at 0.1
    # map-side: no shuffle in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_stratified_scalar_fraction_and_default(spark):
    rows = [Row(_id=str(i), label="x") for i in range(200)]
    df = spark.createDataFrame(rows, "_id string, label string")
    out = compile_pipeline([{"$stratifiedSample": {
        "by": "$label", "fractions": 1.0, "key": "$_id"}}],
        Context(spark=spark))(df)
    assert out.count() == 200  # fraction 1.0 keeps everything
    out = compile_pipeline([{"$stratifiedSample": {
        "by": "$label", "fractions": {"other": 0.5}, "key": "$_id"}}],
        Context(spark=spark))(df)
    assert out.count() == 0  # unmatched stratum -> default 0.0


def test_chunk_text_windows(spark):
    text = " ".join(f"w{i}" for i in range(10))
    rows = [Row(_id="0", text=text), Row(_id="1", text="a b"),
            Row(_id="2", text="solo"), Row(_id="3", text=None),
            Row(_id="4", text=""), Row(_id="5", text="  \t ")]
    df = spark.createDataFrame(rows, "_id string, text string")
    out = compile_pipeline([{"$chunkText": {
        "input": "$text", "size": 4, "overlap": 1, "as": "chunks"}}],
        Context(spark=spark))(df)
    got = {r["_id"]: r.asDict(recursive=True)["chunks"]
           for r in out.collect()}
    # stride 3: starts 0, 3, 6 — the window at 6 reaches the end, so
    # no redundant tail chunk is emitted (full coverage in 3 chunks)
    c0 = got["0"]
    assert [c["text"] for c in c0] == [
        "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9"]
    assert [c["n_words"] for c in c0] == [4, 4, 4]
    assert [c["text"] for c in got["1"]] == ["a b"]
    assert [c["text"] for c in got["2"]] == ["solo"]
    # advisor r8 null semantics, identical across units: null -> null;
    # empty / whitespace-only (no words after the eval-family split) ->
    # [] with NO phantom empty-string chunks
    assert got["3"] is None
    assert got["4"] == [] and got["5"] == []
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan
    # leading/trailing whitespace never produces empty words
    trimmed = compile_pipeline([{"$chunkText": {
        "input": "$text", "size": 2, "as": "chunks"}}],
        Context(spark=spark))(
        spark.createDataFrame([Row(_id="0", text="  a  b \t c ")],
                              "_id string, text string"))
    chunks = trimmed.collect()[0]["chunks"]
    assert [(c["text"], c["n_words"]) for c in chunks] == [
        ("a b", 2), ("c", 1)]


def test_chunk_text_rejects_bad_overlap(spark):
    with pytest.raises(ValueError, match="overlap"):
        compile_pipeline([{"$chunkText": {"input": "$t", "size": 4,
                                          "overlap": 4}}],
                         Context(spark=spark))


def _decon_frames(spark):
    docs = [
        Row(doc_id=0, text="the quick brown fox jumps over the lazy dog today"),
        Row(doc_id=1, text="a completely different sentence with no overlap here at all"),
        Row(doc_id=2, text="quick brown fox jumps over the lazy dog again and again"),
    ]
    bench = [Row(text="quick brown fox jumps over the lazy dog")]
    return (spark.createDataFrame(docs, "doc_id long, text string"),
            spark.createDataFrame(bench, "text string"))


def test_decontaminate_modes(spark):
    df, bench = _decon_frames(spark)
    ctx = Context(spark=spark, collections={"bench": bench})
    flag = compile_pipeline([{"$decontaminate": {
        "input": "$text", "against": "bench", "shingle": 8,
        "as": "hits", "mode": "flag"}}], ctx)(df)
    hits = {r["doc_id"]: r["hits"] for r in flag.collect()}
    assert hits[0] >= 1 and hits[2] >= 1 and hits[1] == 0
    dropped = compile_pipeline([{"$decontaminate": {
        "input": "$text", "against": "bench", "shingle": 8,
        "mode": "drop"}}], ctx)(df)
    assert [r["doc_id"] for r in dropped.collect()] == [1]
    assert "hits" not in dropped.columns and \
        "contamination" not in dropped.columns
    kept = compile_pipeline([{"$decontaminate": {
        "input": "$text", "against": "bench", "shingle": 8,
        "mode": "keep", "as": "hits"}}], ctx)(df)
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 2]


def test_decontaminate_broadcasts_reference(spark):
    df, bench = _decon_frames(spark)
    ctx = Context(spark=spark, collections={"bench": bench})
    out = compile_pipeline([{"$decontaminate": {
        "input": "$text", "against": "bench", "shingle": 8,
        "mode": "flag"}}], ctx)(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan  # the corpus side never shuffles


def test_tf_idf_semantics(spark):
    from pincette_mongo_streams_spark import Context, compile_pipeline

    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"),
         (3, "apple cherry cherry date")],
        "doc_id long, text string",
    )
    out = compile_pipeline(
        [{"$tfIdf": {"input": "$text", "id": "doc_id", "topK": 2}}],
        Context(spark=spark),
    )(docs).collect()
    import math

    def score(tf, df, n=3):
        return math.floor(tf * math.log(n / df) * 1e9 + 0.5) / 1e9

    got = {(r["doc_id"], r["term"]): (r["tf"], r["score"], r["rank"])
           for r in out}
    # doc 1: apple tf=2 df=2 -> 2*ln(1.5); banana tf=1 df=2
    assert got[(1, "apple")] == (2.0, score(2, 2), 1)
    assert got[(1, "banana")] == (1.0, score(1, 2), 2)
    # doc 3: cherry tf=2 df=2 beats date tf=1 df=1 (2*ln1.5=0.81 < ln3=1.09)
    assert got[(3, "date")][2] == 1
    assert got[(3, "cherry")][2] == 2
    # topK=2 respected
    assert max(r["rank"] for r in out) <= 2


def test_tf_idf_max_df_ratio_drops_stopwords(spark):
    from pincette_mongo_streams_spark import Context, compile_pipeline

    docs = spark.createDataFrame(
        [(1, "the apple"), (2, "the banana"), (3, "the cherry")],
        "doc_id long, text string",
    )
    out = compile_pipeline(
        [{"$tfIdf": {"input": "$text", "id": "doc_id", "topK": 5,
                     "maxDfRatio": 0.5}}],
        Context(spark=spark),
    )(docs).collect()
    assert all(r["term"] != "the" for r in out)
    assert {r["term"] for r in out} == {"apple", "banana", "cherry"}


def test_collocations_pmi(spark):
    from pincette_mongo_streams_spark import Context, compile_pipeline
    import math

    docs = spark.createDataFrame(
        [(1, "new york new york new york"),
         (2, "new york is big and big city new york"),
         (3, "york new day and new york again")],
        "doc_id long, text string",
    )
    out = compile_pipeline(
        [{"$collocations": {"input": "$text", "top": 3, "minCount": 2}}],
        Context(spark=spark),
    )(docs).collect()
    got = {(r["w1"], r["w2"]): (r["count"], r["pmi"], r["rank"]) for r in out}
    assert ("new", "york") in got
    cnt, pmi, _ = got[("new", "york")]
    # unigrams: new=7, york=7, T=22; bigram (new, york)=6, B=19
    assert cnt == 6.0
    expect = math.floor(math.log((6/19) / ((7/22) * (7/22))) * 1e9 + 0.5) / 1e9
    assert pmi == expect
    assert max(r["rank"] for r in out) <= 3


def test_quantile_bin_modes(spark):
    from pincette_mongo_streams_spark import Context, compile_pipeline

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1000)], "id long, v double")
    exact = compile_pipeline(
        [{"$quantileBin": {"input": "$v", "bins": 4, "as": "q",
                           "exact": True, "tieBreak": "$id"}}],
        Context(spark=spark),
    )(df).collect()
    from collections import Counter
    counts = Counter(r["q"] for r in exact)
    assert counts == {1: 250, 2: 250, 3: 250, 4: 250}
    # exact: value 0 in bin 1, value 999 in bin 4
    by_v = {r["v"]: r["q"] for r in exact}
    assert by_v[0.0] == 1 and by_v[999.0] == 4

    approx = compile_pipeline(
        [{"$quantileBin": {"input": "$v", "bins": 4, "as": "q"}}],
        Context(spark=spark),
    )(df).collect()
    ca = Counter(r["q"] for r in approx)
    assert set(ca) == {1, 2, 3, 4}
    assert all(200 <= n <= 300 for n in ca.values())  # sketch tolerance
    # monotone: higher values never get a lower bin
    byv = sorted((r["v"], r["q"]) for r in approx)
    assert all(byv[i][1] <= byv[i + 1][1] for i in range(len(byv) - 1))

    # nulls stay null
    dfn = spark.createDataFrame([(1, None), (2, 5.0)], "id long, v double")
    outn = compile_pipeline(
        [{"$quantileBin": {"input": "$v", "bins": 2}}],
        Context(spark=spark),
    )(dfn).collect()
    assert {r["id"]: r["bin"] for r in outn}[1] is None


def test_char_lm_score(spark):
    from pincette_mongo_streams_spark import Context, compile_pipeline
    import math

    docs = spark.createDataFrame(
        [(1, "ababab"), (2, "ababab"), (3, "xq"), (4, "z")],
        "doc_id long, text string",
    )
    out = compile_pipeline(
        [{"$charLmScore": {"input": "$text", "as": "bits"}}],
        Context(spark=spark),
    )(docs).collect()
    by = {r["doc_id"]: r["bits"] for r in out}
    # corpus bigrams: ab x6, ba x4, xq x1; prefixes a x6, b x4, x x1
    # vocab: a, b, x, q, z -> V = 5
    def bits(pairs):
        cab = {"ab": 6.0, "ba": 4.0, "xq": 1.0}
        ca = {"a": 6.0, "b": 4.0, "x": 1.0}
        vals = [-math.log2((cab[p] + 1) / (ca[p[0]] + 5)) for p in pairs]
        m = sum(vals) / len(vals)
        return math.floor(m * 1e9 + 0.5) / 1e9

    assert by[1] == bits(["ab", "ba", "ab", "ba", "ab"])
    assert by[1] == by[2]              # identical text, identical score
    assert by[3] == bits(["xq"])
    assert by[4] is None               # too short to score
    # the repeated fluent pattern scores lower than the rare bigram
    assert by[1] < by[3]


def test_sentence_split(spark):
    from pincette_mongo_streams_spark import Context, compile_pipeline

    docs = spark.createDataFrame(
        [(1, "First one. Second!  Third?No split here... and a tail"),
         (2, "x. y"), (3, "")],
        "doc_id long, text string",
    )
    out = compile_pipeline(
        [{"$sentenceSplit": {"input": "$text", "as": "s", "minChars": 2}}],
        Context(spark=spark),
    )(docs).collect()
    by = {r["doc_id"]: r["s"] for r in out}
    # "Third?No" has no whitespace after ? -> stays one segment
    assert by[1] == ["First one", "Second", "Third?No split here",
                     "and a tail"]
    assert by[2] == []         # "x" and "y" both under minChars=2
    assert by[3] == []


def test_repetition_score(spark):
    """$repetitionScore: Gopher-style repetition filters — duplicate
    line fractions, top-n-gram char fractions (ties to the smallest
    gram, capped at 1.0), overlap-agnostic dup-5-gram fraction; pure
    column program (no Python, no shuffle)."""
    from pincette_mongo_streams_spark import Context, compile_pipeline

    rows = [
        (1, "a b c\na b c\nx y z"),
        (2, "the cat the cat the cat"),
        (3, "unique words only here"),
        (4, None),
        (5, "one two three four five one two three four five"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    out = compile_pipeline(
        [{"$repetitionScore": {"input": "$t"}}], Context(spark=spark))(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan
    by = {r["id"]: r["repetition"].asDict() for r in out.collect()}
    # doc 1: 1 of 3 lines duplicated -> 1 - 2/3; 'a b c' chars (5*2)
    # over total 15
    assert by[1]["dup_line_frac"] == round(1 - 2 / 3, 6)
    assert by[1]["dup_line_char_frac"] == round(10 / 15, 6)
    # doc 2: 'the cat' x3 over 'the cat the cat the cat' (23 chars)
    assert by[2]["top2_char_frac"] == round(min(3 * 7 / 23, 1.0), 6)
    assert by[2]["top4_char_frac"] == 1.0          # capped (overlap)
    # doc 3/4: no repetition / null text -> all zeros
    assert all(v == 0.0 for v in by[3].values())
    assert all(v == 0.0 for v in by[4].values())
    # doc 5: the 5-gram 'one two three four five' repeats -> dup5 > 0
    assert by[5]["dup5_char_frac"] == round(2 * 23 / 47, 6)


def test_c4_filter(spark):
    """$c4Filter: C4 line rules (terminal punctuation, >= minWords
    words, no 'javascript') + document rules (>= 3 sentences, no '{',
    no 'lorem ipsum'); row-local column program."""
    from pincette_mongo_streams_spark import Context, compile_pipeline

    rows = [
        (1, 'Good sentence with many words here.\nshort line\n'
            'Another proper sentence with enough words!\n'
            'A third full sentence keeps this document alive.'),
        (2, 'This javascript line has enough words here.\n'
            'Fine sentence with plenty of words inside.'),
        (3, 'function f() { return 1; }\n'
            'Real sentence one with enough words here.\n'
            'Real sentence two with enough words too.\n'
            'Real sentence three with enough words also.'),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    out = compile_pipeline(
        [{"$c4Filter": {"input": "$t"}}], Context(spark=spark))(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan
    by = {r["id"]: r["c4"].asDict() for r in out.collect()}
    # doc 1: 'short line' dropped (no terminal punct, < 5 words)
    assert by[1]["n_lines"] == 4 and by[1]["n_kept"] == 3
    assert not by[1]["drop_doc"]
    assert "short line" not in by[1]["clean_text"]
    # doc 2: javascript line dropped; only 1 kept sentence -> drop_doc
    assert by[2]["n_kept"] == 1 and by[2]["drop_doc"]
    # doc 3: '{' -> drop_doc even with 3 kept sentences
    assert by[3]["n_kept"] == 3 and by[3]["drop_doc"]
    # null text: empty, dropped
    assert by[4] == {"clean_text": "", "n_lines": 0, "n_kept": 0,
                     "drop_doc": True}


def test_span_dedup(spark):
    """$spanDedup: corpus-wide C4 span dedup — for each duplicated
    3-sentence span the minimum (id, pos) occurrence survives, every
    other occurrence's sentences are removed; matching is
    case-insensitive; docs shorter than the span pass through."""
    from pincette_mongo_streams_spark import Context, compile_pipeline

    shared = ("One two three alpha. Second sentence here beta. "
              "Third one gamma.")
    rows = [
        (1, shared + " Unique tail for doc one."),
        (2, "Opening line for two. " + shared.upper()),   # case-insens
        (3, "Totally different content. No shared spans at all. "
            "Nothing here."),
        (4, "Short doc."),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, t string")
    out = compile_pipeline(
        [{"$spanDedup": {"input": "$t", "id": "$doc_id"}}],
        Context(spark=spark))(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "CartesianProduct" not in plan
    by = {r["doc_id"]: r["span_dedup"].asDict() for r in out.collect()}
    # doc 1 owns the span (min id): nothing removed
    assert by[1]["n_removed"] == 0 and "alpha" in by[1]["text"]
    # doc 2 loses the three shared sentences (uppercased copy), keeps
    # its own opener
    assert by[2]["n_removed"] == 3
    assert by[2]["text"] == "Opening line for two"
    assert by[3]["n_removed"] == 0
    assert by[4] == {"text": "Short doc", "n_sentences": 1,
                     "n_removed": 0}
    assert by[5] == {"text": "", "n_sentences": 0, "n_removed": 0}
    # r6 advisor fix: `verify: true` keys ownership on the span STRING
    # (a 64-bit hash collision can't delete an unrelated span) and must
    # agree with the default hash path on a collision-free corpus
    out_v = compile_pipeline(
        [{"$spanDedup": {"input": "$t", "id": "$doc_id",
                         "verify": True}}],
        Context(spark=spark))(df)
    by_v = {r["doc_id"]: r["span_dedup"].asDict() for r in out_v.collect()}
    assert by_v == by


def test_winnow(spark):
    """$winnow: winnowing fingerprints — the guarantee is that any
    shared substring of length >= window + k - 1 yields at least one
    shared fingerprint; disjoint texts share (almost surely) none;
    edge cases: shorter than k -> empty, fewer than window grams ->
    global minimum only."""
    from pincette_mongo_streams_spark import Context, compile_pipeline

    shared = "the winnowing algorithm selects robust fingerprints"
    rows = [
        (1, "AAA " + shared + " tail one"),
        (2, "completely different prefix " + shared.upper()),
        (3, "nothing in common with the others at all zzz qqq"),
        (4, "abc"),          # 3 chars < k=5 -> empty
        (5, "abcdefg"),      # 3 grams < window=4 -> [min]
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, t string")
    out = compile_pipeline(
        [{"$winnow": {"input": "$t", "k": 5, "window": 4}}],
        Context(spark=spark))(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan
    by = {r["doc_id"]: set(r["fingerprints"]) for r in out.collect()}
    assert by[1] & by[2]                 # shared substring -> overlap
    assert not (by[1] & by[3])
    assert by[4] == set()
    out5 = [r for r in out.collect() if r["doc_id"] == 5][0]
    assert len(out5["fingerprints"]) == 1
    assert by[6] == set()


def test_url_parse(spark):
    """$urlParse: scheme/host/domain/apex/path/query/fragment, null for
    unparseable values; apex is the documented PSL-free approximation."""
    rows = [
        (1, "https://www.news.example.com/a/b?x=1&y=2#top"),
        (2, "http://example.org"),
        (3, "not a url"),
        (4, None),
        (5, "https://sub.deep.host.co.uk/p"),
    ]
    df = spark.createDataFrame(rows, "id long, u string")
    out = compile_pipeline(
        [{"$urlParse": {"input": "$u"}}], Context(spark=spark))(df)
    by = {r["id"]: r["url"].asDict() for r in out.collect()}
    assert by[1] == {"scheme": "https", "host": "www.news.example.com",
                     "domain": "news.example.com", "apex": "example.com",
                     "path": "/a/b", "query": "x=1&y=2", "fragment": "top"}
    assert by[2]["domain"] == "example.org" and by[2]["apex"] == "example.org"
    assert by[2]["query"] is None
    assert all(v is None for v in by[3].values())
    assert all(v is None for v in by[4].values())
    # PSL-free approximation: co.uk collapses (documented)
    assert by[5]["apex"] == "co.uk"


def test_group_cap(spark):
    """$groupCap: top-cap rows per group in sortBy order; the plan
    carries WindowGroupLimit (map-side per-group pruning before the
    shuffle) and validation rejects cap-without-order."""
    import pytest

    rows = [(1, "a", 10), (2, "a", 30), (3, "a", 20),
            (4, "b", 5), (5, "b", 50), (6, None, 1)]
    df = spark.createDataFrame(rows, "id long, dom string, q long")
    out = compile_pipeline(
        [{"$groupCap": {"by": "$dom", "cap": 2,
                        "sortBy": {"q": -1, "id": 1}}}],
        Context(spark=spark))(df)
    got = {(r["dom"], r["id"]) for r in out.collect()}
    assert got == {("a", 2), ("a", 3), ("b", 5), ("b", 4), (None, 6)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    # cap 1 = argmax per group
    out = compile_pipeline(
        [{"$groupCap": {"by": "$dom", "cap": 1,
                        "sortBy": {"q": -1, "id": 1}}},
         {"$project": {"id": 1}}],
        Context(spark=spark))(df)
    assert sorted(r["id"] for r in out.collect()) == [2, 5, 6]
    # compound key
    out = compile_pipeline(
        [{"$groupCap": {"by": ["$dom", {"$mod": ["$q", 2]}], "cap": 1,
                        "sortBy": {"id": 1}}}],
        Context(spark=spark))(df)
    assert len(out.collect()) == 4   # (a,0),(b,1),(b,0),(null,1)
    with pytest.raises(ValueError, match="sortBy"):
        compile_pipeline(
            [{"$groupCap": {"by": "$dom", "cap": 2}}],
            Context(spark=spark))(df)


def test_minhash_dedup_annotate_mode(spark):
    """$minhashDedup {as} annotates transitive cluster ids instead of
    dropping rows; composing with $groupCap keeps the best doc per
    cluster.  Annotate without transitive is rejected."""
    import pytest

    a = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, a, 0.2),
        (2, a + " extra", 0.9),          # near-dup of 1, higher quality
        (3, "completely different text about spark engines", 0.5),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, q double")
    out = compile_pipeline(
        [{"$minhashDedup": {"input": "$text", "id": "doc_id",
                            "shingle": 3, "numHashes": 32, "bands": 16,
                            "transitive": True, "as": "cluster"}}],
        Context(spark=spark))(df)
    got = {r["doc_id"]: r["cluster"] for r in out.collect()}
    assert set(got) == {1, 2, 3}          # nothing dropped
    assert got[1] == got[2] == 1          # min-id component label
    assert got[3] == 3                    # singleton labels itself
    # keep the best-quality doc per cluster (doc 2, not min-id doc 1)
    best = compile_pipeline(
        [{"$minhashDedup": {"input": "$text", "id": "doc_id",
                            "shingle": 3, "numHashes": 32, "bands": 16,
                            "transitive": True, "as": "cluster"}},
         {"$groupCap": {"by": "$cluster", "cap": 1,
                        "sortBy": {"q": -1, "doc_id": 1}}},
         {"$project": {"doc_id": 1}}],
        Context(spark=spark))(df)
    assert sorted(r["doc_id"] for r in best.collect()) == [2, 3]
    with pytest.raises(ValueError, match="transitive"):
        compile_pipeline(
            [{"$minhashDedup": {"input": "$text", "id": "doc_id",
                                "as": "cluster"}}],
            Context(spark=spark))(df)


def test_embed_dedup_transitive_and_annotate(spark):
    """$embedDedup transitive/annotate: chained near-dups (a~b~c with
    a!~c at the threshold) collapse to one CC cluster; annotate labels
    instead of dropping (same contract as $minhashDedup)."""
    import math

    import pytest

    def unit(deg):
        return [math.cos(math.radians(deg)), math.sin(math.radians(deg))]

    rows = [(1, unit(0)), (2, unit(20)), (3, unit(40)), (4, unit(90))]
    df = spark.createDataFrame(rows, "vec_id long, emb array<double>")
    thr = math.cos(math.radians(25))     # ~0.906: links 0-20, 20-40
    base = {"input": "$emb", "id": "vec_id", "threshold": thr}
    kept = compile_pipeline(
        [{"$embedDedup": {**base, "transitive": True}}],
        Context(spark=spark))(df)
    assert sorted(r["vec_id"] for r in kept.collect()) == [1, 4]
    out = compile_pipeline(
        [{"$embedDedup": {**base, "transitive": True, "as": "cluster"}}],
        Context(spark=spark))(df)
    got = {r["vec_id"]: r["cluster"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4}
    with pytest.raises(ValueError, match="transitive"):
        compile_pipeline(
            [{"$embedDedup": {**base, "as": "cluster"}}],
            Context(spark=spark))(df)


def test_edit_distance_join_self(spark):
    """$editDistanceJoin self-join: exact candidate generation (q-gram
    prefix filter) + thresholded levenshtein verify, unordered pairs."""
    df = spark.createDataFrame(
        [(1, "kitten"), (2, "sitting"), (3, "kitchen"), (4, "mitten"),
         (5, "apple"), (6, None)],
        "id long, s string")
    out = compile_pipeline(
        [{"$editDistanceJoin": {"input": "$s", "id": "id",
                                "maxDistance": 2}}],
        Context(spark=spark))(df)
    got = sorted((r.left_id, r.right_id, r.distance) for r in out.collect())
    # kitten~kitchen d=2, kitten~mitten d=1; sitting is d=3 from all
    assert got == [(1, 3, 2), (1, 4, 1)]


def test_edit_distance_join_short_string_fallback(spark):
    """Strings below gram*(k+1) chars have too few q-grams for the
    pigeonhole bound; they route through the length-band fallback."""
    df = spark.createDataFrame(
        [(1, "ab"), (2, "ba"), (3, "abc"), (4, "zz"), (5, "")],
        "id long, s string")
    out = compile_pipeline(
        [{"$editDistanceJoin": {"input": "$s", "id": "id",
                                "maxDistance": 1}}],
        Context(spark=spark))(df)
    got = sorted((r.left_id, r.right_id, r.distance) for r in out.collect())
    assert got == [(1, 3, 1)]


def test_edit_distance_join_from_collection(spark):
    """from-collection form joins against a foreign corpus; pairs carry
    both orders' ids without the self-join left<right constraint."""
    df = spark.createDataFrame([(10, "widget"), (11, "gizmo")],
                               "id long, s string")
    ref = spark.createDataFrame([(1, "widgets"), (2, "midget"), (3, "bolt")],
                                "rid long, name string")
    out = compile_pipeline(
        [{"$editDistanceJoin": {"from": "ref", "input": "$s", "id": "id",
                                "foreignInput": "$name", "foreignId": "rid",
                                "maxDistance": 1}}],
        Context(spark=spark, collections={"ref": ref}))(df)
    got = sorted((r.left_id, r.right_id, r.distance) for r in out.collect())
    assert got == [(10, 1, 1), (10, 2, 1)]


def test_edit_distance_join_validation(spark):
    with pytest.raises(ValueError, match="maxDistance"):
        compile_pipeline(
            [{"$editDistanceJoin": {"input": "$s", "maxDistance": -1}}],
            Context(spark=spark))
    with pytest.raises(ValueError, match="gram"):
        compile_pipeline(
            [{"$editDistanceJoin": {"input": "$s", "gram": 0}}],
            Context(spark=spark))


def test_edit_distance_join_randomized_exactness(spark):
    """Differential test: the prefix-filtered candidate path must be
    EXACT (no recall loss) — every (k, q) combination reproduces the
    brute-force all-pairs ground truth on a random small-alphabet corpus
    (short strings route through the length-band pool, long ones through
    the rare-gram prefix join, so both paths are exercised)."""
    import itertools
    import random

    rng = random.Random(20260814)

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    strings = ["".join(rng.choice("abc")
                       for _ in range(rng.randint(0, 12)))
               for _ in range(60)]
    rows = [(i, s) for i, s in enumerate(strings)]
    df = spark.createDataFrame(rows, "id long, s string")
    for k, q in [(1, 2), (2, 3)]:
        truth = sorted(
            (i, j, lev(a, b))
            for (i, a), (j, b) in itertools.combinations(rows, 2)
            if lev(a, b) <= k)
        out = compile_pipeline(
            [{"$editDistanceJoin": {"input": "$s", "id": "id",
                                    "maxDistance": k, "gram": q}}],
            Context(spark=spark))(df)
        got = sorted((r.left_id, r.right_id, r.distance)
                     for r in out.collect())
        assert got == truth, f"k={k} q={q}"


def test_span_dedup_token_mode(spark):
    """unit: 'tokens' (Lee et al. 2021 exact-substring analog): a
    duplicated 3-token window is removed from every occurrence except
    the min-(id, pos) one; unique text survives untouched."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(doc_id=1, text="the common span here plus own words"),
         Row(doc_id=2, text="prefix the common span here suffix"),
         Row(doc_id=3, text="wholly unique text with no overlap")],
        "doc_id long, text string")
    out = compile_pipeline(
        [{"$spanDedup": {"input": "$text", "id": "$doc_id", "as": "sd",
                         "unit": "tokens", "span": 4}}],
        Context(spark=spark))(df)
    rows = {r["doc_id"]: r["sd"] for r in out.collect()}
    # doc 1 owns "the common span here" (pos 1) and keeps everything
    assert rows[1].text == "the common span here plus own words"
    assert rows[1].n_removed == 0
    # doc 2 loses exactly that 4-token window
    assert rows[2].text == "prefix suffix"
    assert rows[2].n_removed == 4
    assert rows[2].n_sentences == 6  # segment count = tokens here
    assert rows[3].text == "wholly unique text with no overlap"


def test_span_dedup_unit_validation(spark):
    import pytest

    with pytest.raises(ValueError, match="unit"):
        compile_pipeline(
            [{"$spanDedup": {"input": "$t", "id": "$i", "unit": "chars"}}],
            Context(spark=spark))


def test_span_dedup_token_mode_rejects_min_chars(spark):
    import pytest

    with pytest.raises(ValueError, match="minChars"):
        compile_pipeline(
            [{"$spanDedup": {"input": "$t", "id": "$i", "unit": "tokens",
                             "minChars": 2}}],
            Context(spark=spark))
