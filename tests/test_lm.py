"""$ngramLmTrain / $ngramLmScore — Stupid Backoff n-gram LM
(Brants et al. 2007) with the CCNet perplexity-filter output shape
(Wenzek et al. 2020).  Every expected value below is hand-computed
from the pinned conventions: document = one token stream, position i
starts at order min(n, i) with no penalty, a k-gram miss multiplies by
`backoff` (default 0.4), unigram base = (count+alpha)/(N+alpha*(V+1)).
"""

import math

import pytest

from pincette_mongo_streams_spark import Context, compile_pipeline

CORPUS = [(1, "a b a b c"), (2, "a b"), (3, None), (4, "zzz qqq")]
# unigrams: a:3 b:3 c:1 zzz:1 qqq:1  (N=9, V=5)
# bigrams: "a b":3 "b a":1 "b c":1 "zzz qqq":1


def _model(spark, n=2, **opts):
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    return compile_pipeline(
        [{"$ngramLmTrain": {"input": "$text", "n": n, **opts}}],
        Context(spark=spark))(docs)


def _score(spark, model, rows, n=2, **opts):
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    ctx = Context(spark=spark, collections={"lm": model})
    out = compile_pipeline(
        [{"$ngramLmScore": {"input": "$text", "model": "lm", "n": n,
                            "as": "s", **opts}}],
        ctx)(docs)
    return {r["doc_id"]: r["s"] for r in out.collect()}


def test_train_counts(spark):
    rows = {(r["gram"], r["order"]): r["count"]
            for r in _model(spark).collect()}
    assert rows[("", 0)] == 9
    assert rows[("a", 1)] == 3 and rows[("c", 1)] == 1
    assert rows[("a b", 2)] == 3 and rows[("zzz qqq", 2)] == 1
    assert ("b b", 2) not in rows
    assert len([k for k in rows if k[1] == 1]) == 5


def test_score_hand_computed(spark):
    m = _model(spark)
    got = _score(spark, m, CORPUS)
    # doc 1 "a b a b c": i1 'a' -> (3+1)/(9+6); i2 b|a 3/3; i3 a|b 1/3;
    # i4 b|a 3/3 -> 1; i5 c|b 1/3
    exp1 = [4 / 15, 1.0, 1 / 3, 1.0, 1 / 3]
    lp1 = sum(math.log10(x) for x in exp1) / 5
    assert abs(got[1]["logprob"] - lp1) < 1e-12
    assert abs(got[1]["perplexity"] - 10 ** -lp1) < 1e-9
    assert got[1]["n_tokens"] == 5 and got[1]["oov"] == 0
    # doc 4 "zzz qqq": i1 (1+1)/15; i2 qqq|zzz = 1/1
    lp4 = (math.log10(2 / 15) + math.log10(1.0)) / 2
    assert abs(got[4]["logprob"] - lp4) < 1e-12
    assert got[3] is None


def test_score_backoff_miss_and_oov(spark):
    m = _model(spark)
    # "b b": i1 'b' -> 4/15; i2 'b'|'b': bigram "b b" unseen -> miss
    # -> 0.4 * unigram(b) = 0.4 * 4/15
    got = _score(spark, m, [(1, "b b"), (2, "qqq wwww")])
    lp = (math.log10(4 / 15) + math.log10(0.4 * 4 / 15)) / 2
    assert abs(got[1]["logprob"] - lp) < 1e-12
    # OOV 'wwww': unigram (0+1)/15 after a bigram miss backoff
    lp2 = (math.log10(2 / 15) + math.log10(0.4 * 1 / 15)) / 2
    assert abs(got[2]["logprob"] - lp2) < 1e-12
    assert got[2]["oov"] == 1


def test_min_count_prunes_every_order(spark):
    m = _model(spark, minCount=2)
    rows = {(r["gram"], r["order"]) for r in m.collect()}
    # only a/b unigrams and "a b" survive; total row stays
    assert rows == {("", 0), ("a", 1), ("b", 1), ("a b", 2)}
    # pruned unigram 'c' scores as OOV (V is the SURVIVING vocab: 2)
    got = _score(spark, m, [(1, "c")])
    assert got[1]["oov"] == 1
    assert abs(got[1]["logprob"] - math.log10(1 / (9 + 3))) < 1e-12


def test_backoff_and_alpha_options(spark):
    m = _model(spark)
    got = _score(spark, m, [(1, "b b")], backoff=0.5, alpha=2.0)
    # unigram(b) = (3+2)/(9+2*6) = 5/21; miss -> 0.5x
    lp = (math.log10(5 / 21) + math.log10(0.5 * 5 / 21)) / 2
    assert abs(got[1]["logprob"] - lp) < 1e-12


def test_rouge_score_tokenizer(spark):
    docs = spark.createDataFrame(
        [(1, "The CAT! sat."), (2, "the cat sat")], ["doc_id", "text"])
    m = compile_pipeline(
        [{"$ngramLmTrain": {"input": "$text", "n": 2,
                            "tokenizer": "rougeScore"}}],
        Context(spark=spark))(docs)
    rows = {(r["gram"], r["order"]): r["count"] for r in m.collect()}
    # case/punctuation fold: both docs contribute the same tokens
    assert rows[("the", 1)] == 2 and rows[("the cat", 2)] == 2


def test_empty_doc_and_order_guard(spark):
    m = _model(spark)
    got = _score(spark, m, [(1, "")])
    assert got[1]["n_tokens"] == 0 and got[1]["logprob"] is None
    # scoring above the trained order fails loudly, not silently
    import py4j.protocol

    with pytest.raises(Exception, match="exceeds the trained order"):
        _score(spark, m, CORPUS[:1], n=3)


def test_option_validation(spark):
    ctx = Context(spark=spark)
    for stage, bad in (
        ("$ngramLmTrain", {"input": "$t", "n": 0}),
        ("$ngramLmTrain", {"input": "$t", "minCount": 0}),
        ("$ngramLmTrain", {"input": "$t", "tokenizer": "bogus"}),
        ("$ngramLmScore", {"input": "$t", "model": "m", "backoff": 0.0}),
        ("$ngramLmScore", {"input": "$t", "model": "m", "alpha": 0}),
        ("$ngramLmScore", {"input": "$t", "model": "m", "n": 9}),
    ):
        with pytest.raises(ValueError):
            compile_pipeline([{stage: bad}], ctx)


def test_score_plan_shape(spark):
    """No Python anywhere (pure JVM column program), no cartesian
    beyond the pinned 1-row stats broadcast, nothing collected."""
    m = _model(spark)
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    out = compile_pipeline(
        [{"$ngramLmScore": {"input": "$text", "model": "lm", "n": 2}}],
        Context(spark=spark, collections={"lm": m}))(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan


def test_score_streams_per_micro_batch(spark, tmp_path):
    """$ngramLmScore is row-local in semantics: inside foreachBatch the
    static model joins each micro-batch like any batch frame (only
    $ngramLmTrain is corpus-gated).  Two batches, same doc text ->
    identical scores, model trained once up front."""
    import math

    from pyspark.sql import types as T

    from test_streaming import _run

    m = _model(spark)
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType())])
    batches = [
        [{"doc_id": 1, "text": "a b a b c"}],
        [{"doc_id": 2, "text": "a b a b c"}],
    ]
    pipeline = [{"$ngramLmScore": {"input": "$text", "model": "lm",
                                   "n": 2, "as": "s"}}]
    emissions = _run(spark, str(tmp_path), schema, batches, pipeline,
                     ctx=Context(spark=spark, collections={"lm": m}))
    scores = [r["s"]["logprob"] for e in emissions for r in e if e]
    exp = sum(math.log10(x)
              for x in (4 / 15, 1.0, 1 / 3, 1.0, 1 / 3)) / 5
    assert len(scores) == 2
    assert all(abs(s - exp) < 1e-12 for s in scores)


def test_jelinek_mercer_hand_computed(spark):
    """JM interpolation: p = lam*ML_2 + (1-lam)*(lam*ML_1 +
    (1-lam)/(V+1)); hand-computed on the pinned corpus."""
    m = _model(spark)
    got = _score(spark, m, [(1, "a b a b c"), (2, "qqq wwww")],
                 smoothing="jelinekMercer")
    lam, N, V = 0.9, 9, 5

    def p1(c):
        return lam * (c / N) + (1 - lam) / (V + 1)

    def p2(cb, cc, cw):
        return lam * (cb / cc if cc else 0.0) + (1 - lam) * p1(cw)

    exp1 = [p1(3), p2(3, 3, 3), p2(1, 3, 3), p2(3, 3, 3), p2(1, 3, 1)]
    lp1 = sum(math.log10(x) for x in exp1) / 5
    assert abs(got[1]["logprob"] - lp1) < 1e-12
    # OOV 'wwww' after 'qqq': bigram unseen -> ML_2 = 0
    exp2 = [p1(1), p2(0, 1, 0)]
    lp2 = sum(math.log10(x) for x in exp2) / 2
    assert abs(got[2]["logprob"] - lp2) < 1e-12
    assert got[2]["oov"] == 1


def test_smoothing_option_exclusivity(spark):
    ctx = Context(spark=spark)
    for bad in ({"smoothing": "jelinekMercer", "backoff": 0.5},
                {"smoothing": "jelinekMercer", "alpha": 2},
                {"lambda": 0.5},
                {"smoothing": "bogus"},
                {"smoothing": "jelinekMercer", "lambda": 1.0}):
        with pytest.raises(ValueError):
            compile_pipeline(
                [{"$ngramLmScore": {"input": "$t", "model": "m",
                                    **bad}}], ctx)


def test_absolute_discount_hand_computed(spark):
    """Ney absolute discounting, D=0.75 on the pinned corpus.
    EXT: followers(a)={b}->1, followers(b)={a,c}->2, followers(zzz)=1."""
    m = _model(spark)
    got = _score(spark, m, [(1, "a b a b c"), (2, "b b"), (3, "qqq wwww")],
                 smoothing="absoluteDiscount")
    D, N, V = 0.75, 9, 5

    def p1(c):
        return max(c - D, 0) / N + (D * V / N) / (V + 1)

    def p2(cb, cc, ext, cw):
        return max(cb - D, 0) / cc + (D * ext / cc) * p1(cw)

    exp1 = [p1(3), p2(3, 3, 1, 3), p2(1, 3, 2, 3), p2(3, 3, 1, 3),
            p2(1, 3, 2, 1)]
    lp1 = sum(math.log10(x) for x in exp1) / 5
    assert abs(got[1]["logprob"] - lp1) < 1e-12
    # "b b": bigram unseen but ctx 'b' has ext=2 -> discounted-0 + gamma
    exp2 = [p1(3), p2(0, 3, 2, 3)]
    lp2 = sum(math.log10(x) for x in exp2) / 2
    assert abs(got[2]["logprob"] - lp2) < 1e-12
    # OOV after 'qqq': ctx is a seen unigram but has NO followers
    # ('qqq' only occurs sentence-final) -> falls through to p1(0)
    exp3 = [p1(1), p1(0)]
    lp3 = sum(math.log10(x) for x in exp3) / 2
    assert abs(got[3]["logprob"] - lp3) < 1e-12
    assert got[3]["oov"] == 1
    # and a ctx WITH followers and gamma mass only: 'zzz' (ext=1)
    got_z = _score(spark, m, [(9, "zzz wwww")],
                   smoothing="absoluteDiscount")
    expz = [p1(1), p2(0, 1, 1, 0)]
    lpz = sum(math.log10(x) for x in expz) / 2
    assert abs(got_z[9]["logprob"] - lpz) < 1e-12


def test_absolute_discount_pruned_context_falls_through(spark):
    """minCount=2 prunes every bigram except 'a b' — a surviving
    context with no surviving extensions scores the lower order whole
    (no zero-probability hole)."""
    m = _model(spark, minCount=2)
    got = _score(spark, m, [(1, "b a")], smoothing="absoluteDiscount")
    D, N, V = 0.75, 9, 2

    def p1(c):
        return max(c - D, 0) / N + (D * V / N) / (V + 1)

    # ctx 'b' survives as a unigram but has NO surviving followers ->
    # position 2 falls through to p1(a)
    lp = (math.log10(p1(3)) + math.log10(p1(3))) / 2
    assert abs(got[1]["logprob"] - lp) < 1e-12


def test_absolute_discount_option_exclusivity(spark):
    ctx = Context(spark=spark)
    for bad in ({"smoothing": "absoluteDiscount", "backoff": 0.5},
                {"smoothing": "absoluteDiscount", "lambda": 0.5},
                {"discount": 0.5},
                {"smoothing": "absoluteDiscount", "discount": 1.0}):
        with pytest.raises(ValueError):
            compile_pipeline(
                [{"$ngramLmScore": {"input": "$t", "model": "m",
                                    **bad}}], ctx)


def test_kneser_ney_bigram_hand_computed(spark):
    """Interpolated KN, n=2, D=0.75, pinned corpus.  Continuation
    unigrams: CONT(b)=CONT(a)=CONT(c)=CONT(qqq)=1, CONT(zzz)=0;
    BB=4 bigram types, D1=4 distinct second words.  True conditional
    denominators: SDEN(a)=3, SDEN(b)=2, SDEN(zzz)=1 (NOT the raw
    unigram counts — 'c'/'qqq' end documents)."""
    m = _model(spark)
    got = _score(spark, m, [(1, "a b a b c"), (2, "zzz zzz"),
                            (3, "qqq a")],
                 smoothing="kneserNey")
    D, BB, D1, V = 0.75, 4, 4, 5
    unif = 1 / (V + 1)

    def p1(cont):
        return max(cont - D, 0) / BB + (D * D1 / BB) * unif

    def p2(cg, sden, ext, cont_w):
        return (max(cg - D, 0) / sden
                + (D * ext / sden) * p1(cont_w))

    # doc 1 "a b a b c"
    exp1 = [p1(1), p2(3, 3, 1, 1), p2(1, 2, 2, 1), p2(3, 3, 1, 1),
            p2(1, 2, 2, 1)]
    lp1 = sum(math.log10(x) for x in exp1) / 5
    assert abs(got[1]["logprob"] - lp1) < 1e-12
    # each conditional sums to 1: check P(.|b) mass by hand
    mass = (p2(1, 2, 2, 1) * 2           # a, c (seen bigrams)
            + (D * 2 / 2) * p1(1) * 2    # b, qqq (unseen, CONT=1)
            + (D * 2 / 2) * p1(0)        # zzz (CONT=0)
            + (D * 2 / 2) * p1(0))       # the OOV bucket
    assert abs(mass - 1.0) < 1e-12
    # "zzz zzz": i2 bigram 'zzz zzz' unseen but SDEN(zzz)=1
    exp2 = [p1(0), p2(0, 1, 1, 0)]
    lp2 = sum(math.log10(x) for x in exp2) / 2
    assert abs(got[2]["logprob"] - lp2) < 1e-12
    # "qqq a": ctx 'qqq' has NO followers -> falls through to p1(a)
    exp3 = [p1(1), p1(1)]
    lp3 = sum(math.log10(x) for x in exp3) / 2
    assert abs(got[3]["logprob"] - lp3) < 1e-12


def test_kneser_ney_trigram_middle_level(spark):
    """n=3 exercises the continuation MIDDLE level: trigram suffix /
    middle / distinct-last lookups, all hand-computed."""
    m = _model(spark, n=3)
    got = _score(spark, m, [(1, "b a b c")], n=3,
                 smoothing="kneserNey")
    D, BB, D1, V = 0.75, 4, 4, 5
    unif = 1 / (V + 1)

    def p1(cont):
        return max(cont - D, 0) / BB + (D * D1 / BB) * unif

    # CONT2("b a")=CONT2("a b")=CONT2("b c")=1; CDEN(b)=2, CDEN(a)=1;
    # CEXT(b)=2, CEXT(a)=1; SDEN("a b")=2, SDEN("b a")=1;
    # EXT3("a b")=2, EXT3("b a")=1
    def p2kn(cont_g, cden, cext, cont_w):
        return (max(cont_g - D, 0) / cden
                + (D * cext / cden) * p1(cont_w))

    i1 = p1(1)                       # 'b'
    i2 = p2kn(1, 2, 2, 1)            # 'a'|'b'  (order 2 at position 2)
    i3 = (max(1 - D, 0) / 1
          + (D * 1 / 1) * p2kn(1, 1, 1, 1))   # 'b'|'b a' via SDEN
    i4 = (max(1 - D, 0) / 2
          + (D * 2 / 2) * p2kn(1, 2, 2, 1))   # 'c'|'a b'
    lp = sum(math.log10(x) for x in (i1, i2, i3, i4)) / 4
    assert abs(got[1]["logprob"] - lp) < 1e-12


def test_kneser_ney_options(spark):
    ctx = Context(spark=spark)
    with pytest.raises(ValueError, match="n >= 2"):
        compile_pipeline(
            [{"$ngramLmScore": {"input": "$t", "model": "m", "n": 1,
                                "smoothing": "kneserNey"}}], ctx)
    with pytest.raises(ValueError):
        compile_pipeline(
            [{"$ngramLmScore": {"input": "$t", "model": "m",
                                "smoothing": "kneserNey",
                                "alpha": 2}}], ctx)


def test_model_missing_order0_fails_loudly(spark):
    """ADVICE r13: a model collection without the order-0 total row
    (user-filtered or hand-built) raises at execution instead of
    scoring every document as null (`__N` null would propagate)."""
    broken = _model(spark).filter("order > 0")
    with pytest.raises(Exception, match="no order-0 total row"):
        _score(spark, broken, CORPUS[:1])


def test_score_pins_computed_model_once(spark, tmp_path):
    """r13 optimization: a model that is the LIVE output of
    $ngramLmTrain is materialized exactly once before the score plan
    fans references out over it (kneserNey references it 7x; Catalyst's
    per-branch `order = k` pushdown defeats exchange reuse, so the
    un-pinned plan re-tokenized and re-counted the whole corpus per
    reference — 9 corpus scans measured).  Pinned: the score plan reads
    the model as ExistingRDD (localCheckpoint; durable checkpoint when
    a checkpointDir is set) and the corpus parquet appears only on the
    score side (tokenize + the final re-attach join)."""
    p = str(tmp_path / "corpus")
    spark.createDataFrame(CORPUS, ["doc_id", "text"]).write.parquet(p)
    docs = spark.read.parquet(p)
    m = compile_pipeline(
        [{"$ngramLmTrain": {"input": "$text", "n": 2}}],
        Context(spark=spark))(docs)
    out = compile_pipeline(
        [{"$ngramLmScore": {"input": "$text", "model": "lm", "n": 2,
                            "smoothing": "kneserNey", "as": "s"}}],
        Context(spark=spark, collections={"lm": m}))(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan
    assert plan.count("Scan parquet") <= 2


def test_stored_model_not_pinned_and_score_equivalent(spark, tmp_path):
    """The pin gate skips a model read straight from storage (bare
    relation — copying a stored table would only add cost), and the
    pinned/unpinned paths score identically."""
    m = _model(spark)
    p = str(tmp_path / "lm_model")
    m.write.parquet(p)
    stored = spark.read.parquet(p)

    dp = str(tmp_path / "docs")
    spark.createDataFrame(CORPUS, ["doc_id", "text"]).write.parquet(dp)
    docs = spark.read.parquet(dp)
    out = compile_pipeline(
        [{"$ngramLmScore": {"input": "$text", "model": "lm", "n": 2,
                            "as": "s"}}],
        Context(spark=spark, collections={"lm": stored}))(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" not in plan

    live = _score(spark, m, CORPUS)
    disk = _score(spark, stored, CORPUS)
    assert set(live) == set(disk)
    for k, lv in live.items():
        dv = disk[k]
        if lv is None:
            assert dv is None
            continue
        assert lv["n_tokens"] == dv["n_tokens"]
        assert lv["oov"] == dv["oov"]
        assert (lv["logprob"] is None and dv["logprob"] is None) or \
            abs(lv["logprob"] - dv["logprob"]) < 1e-12


def test_lm_heavy_stages_fan_out_single_partition_corpus(spark, tmp_path):
    """r13 optimization: gram generation (interpreted HOF slice+join
    per position x order) is the per-row-heavy work of both stages; a
    one-row-group parquet corpus arrives as ONE scan task and ran it
    serial (11.8 s single-task vs ~0.6 s spread at sf0.1).  Both the
    train explode and the score key explode go through _spread's
    row-group-aware gate: single-partition input -> round-robin
    fan-out; results (already pinned by the hash gates) sort-canonical
    so the repartition cannot change them."""
    p = str(tmp_path / "corpus")
    spark.createDataFrame(CORPUS, ["doc_id", "text"]) \
        .coalesce(1).write.parquet(p)
    docs = spark.read.parquet(p)
    model = compile_pipeline(
        [{"$ngramLmTrain": {"input": "$text", "n": 2}}],
        Context(spark=spark))(docs)
    tplan = model._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" in tplan
    scored = compile_pipeline(
        [{"$ngramLmScore": {"input": "$text", "model": "lm", "n": 2,
                            "as": "s"}}],
        Context(spark=spark, collections={"lm": model}))(docs)
    splan = scored._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" in splan
    # counts unchanged by the fan-out
    rows = {(r["gram"], r["order"]): r["count"] for r in model.collect()}
    assert rows[("", 0)] == 9 and rows[("a b", 2)] == 3
