"""Randomized differentials for $classificationEval / $regressionEval
against independent Python implementations (sklearn conventions:
label = union of both sides, zero_division=0, macro = unweighted mean,
micro = accuracy), plus the null/edge ladder and the corpus-only gates.
"""

import random

import pytest

from pincette_mongo_streams_spark import Context, compile_pipeline


def _ref_classification(pairs):
    """pairs: (pred, act) with nulls already excluded.  Returns
    {label: (tp, fp, fn)} over the union of labels."""
    labels = {p for p, _ in pairs} | {a for _, a in pairs}
    out = {}
    for lb in labels:
        tp = sum(1 for p, a in pairs if p == lb and a == lb)
        fp = sum(1 for p, a in pairs if p == lb and a != lb)
        fn = sum(1 for p, a in pairs if a == lb and p != lb)
        out[lb] = (tp, fp, fn)
    return out


def _prf(tp, fp, fn):
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * tp / (2 * tp + fp + fn) if 2 * tp + fp + fn else 0.0
    return prec, rec, f1


def test_classification_eval_randomized_differential(spark):
    rng = random.Random(1312)
    labels = ["cat", "dog", "bird", "7", "fish"]
    rows = []
    for i in range(300):
        a = rng.choice(labels + [None])
        # biased toward agreement, sometimes a predicted-only label
        p = (a if rng.random() < 0.5
             else rng.choice(labels + ["ONLY_PRED", None]))
        rows.append((i, p, a))
    df = spark.createDataFrame(rows, "i long, p string, a string")
    got = {r["label"]: r for r in compile_pipeline(
        [{"$classificationEval": {"predicted": "$p", "actual": "$a"}}],
        Context(spark=spark))(df).collect()}
    pairs = [(p, a) for _, p, a in rows
             if p is not None and a is not None]
    want = _ref_classification(pairs)
    assert set(got) == set(want)
    for lb, (tp, fp, fn) in want.items():
        g = got[lb]
        assert (g["tp"], g["fp"], g["fn"]) == (tp, fp, fn), lb
        assert g["support"] == tp + fn
        prec, rec, f1 = _prf(tp, fp, fn)
        assert abs(g["precision"] - prec) < 1e-12
        assert abs(g["recall"] - rec) < 1e-12
        assert abs(g["f1"] - f1) < 1e-12
    # macro = unweighted mean over the label union; micro = accuracy
    macro = compile_pipeline(
        [{"$classificationEval": {"predicted": "$p", "actual": "$a",
                                  "average": "macro"}}],
        Context(spark=spark))(df).collect()[0]
    n = len(pairs)
    acc = sum(tp for tp, _, _ in want.values()) / n
    per = [_prf(*v) for v in want.values()]
    assert macro["n"] == n
    assert abs(macro["accuracy"] - acc) < 1e-12
    for idx, col in enumerate(("precision", "recall", "f1")):
        assert abs(macro[col]
                   - sum(x[idx] for x in per) / len(per)) < 1e-12
    micro = compile_pipeline(
        [{"$classificationEval": {"predicted": "$p", "actual": "$a",
                                  "average": "micro"}}],
        Context(spark=spark))(df).collect()[0]
    for col in ("accuracy", "precision", "recall", "f1"):
        assert abs(micro[col] - acc) < 1e-12
    # numeric labels compare as strings (cast once)
    ndf = spark.createDataFrame([(1, 1), (2, 1)], "p long, a long")
    rows2 = compile_pipeline(
        [{"$classificationEval": {"predicted": "$p", "actual": "$a"}}],
        Context(spark=spark))(ndf).collect()
    assert {r["label"] for r in rows2} == {"1", "2"}
    # config guard ("weighted" became a real mode in r10 — see
    # test_classification_eval_weighted_and_labels)
    with pytest.raises(ValueError, match="average"):
        compile_pipeline(
            [{"$classificationEval": {"predicted": "$p", "actual": "$a",
                                      "average": "median"}}],
            Context(spark=spark))


def test_regression_eval_randomized_differential(spark):
    rng = random.Random(4004)
    rows = [(i,
             rng.uniform(-100, 100),
             rng.uniform(-100, 100) if rng.random() < 0.8 else None)
            for i in range(300)]
    # actual None sometimes too
    rows = [(i, a if rng.random() < 0.9 else None, p)
            for i, a, p in rows]
    df = spark.createDataFrame(rows, "i long, a double, p double")
    got = compile_pipeline(
        [{"$regressionEval": {"predicted": "$p", "actual": "$a"}}],
        Context(spark=spark))(df).collect()[0]
    pairs = [(a, p) for _, a, p in rows
             if a is not None and p is not None]
    n = len(pairs)
    ssr = sum((p - a) ** 2 for a, p in pairs)
    sae = sum(abs(p - a) for a, p in pairs)
    mean_a = sum(a for a, _ in pairs) / n
    ss_tot = sum((a - mean_a) ** 2 for a, _ in pairs)
    assert got["n"] == n
    assert abs(got["mse"] - ssr / n) < 1e-9
    assert abs(got["rmse"] - (ssr / n) ** 0.5) < 1e-9
    assert abs(got["mae"] - sae / n) < 1e-9
    assert abs(got["r2"] - (1 - ssr / ss_tot)) < 1e-9
    # constant actuals: r2 undefined -> null, the rest defined
    cdf = spark.createDataFrame([(2.0, 1.0), (2.0, 3.0)],
                                "a double, p double")
    g2 = compile_pipeline(
        [{"$regressionEval": {"predicted": "$p", "actual": "$a"}}],
        Context(spark=spark))(cdf).collect()[0]
    assert g2["r2"] is None and g2["mse"] == 1.0
    # empty input: n = 0, all metrics null
    edf = spark.createDataFrame([], "a double, p double")
    g3 = compile_pipeline(
        [{"$regressionEval": {"predicted": "$p", "actual": "$a"}}],
        Context(spark=spark))(edf).collect()[0]
    assert g3["n"] == 0 and g3["mse"] is None and g3["r2"] is None


def test_ml_eval_corpus_only_gates(spark):
    df = spark.createDataFrame([("a", "a", 1.0, 1.0)],
                               "p string, a string, x double, y double")
    for pipeline in (
        [{"$classificationEval": {"predicted": "$p", "actual": "$a"}}],
        [{"$regressionEval": {"predicted": "$x", "actual": "$y"}}],
    ):
        mb = Context(spark=spark)
        mb.micro_batch = True
        with pytest.raises(ValueError, match="corpus-wide"):
            compile_pipeline(pipeline, mb)(df)


def test_paired_bootstrap_matches_independent_python(spark):
    """Full differential: the deterministic Poisson-bootstrap weights,
    per-replicate wins/ties and p_value reproduced by an independent
    Python implementation (hashlib md5, same inverse CDF)."""
    import hashlib

    CDF = [0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
           0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
           0.999916758850712, 0.9999897508033254]

    def weight(seed, rid, r):
        h = hashlib.md5(f"{seed}:{rid}:{r}".encode()).hexdigest()
        u = int(h[:15], 16) / float(16 ** 15)
        for k, t in enumerate(CDF):
            if u < t:
                return k
        return 8

    rng = random.Random(99)
    rows = [(i, rng.randint(0, 127) / 128.0, rng.randint(0, 127) / 128.0)
            for i in range(150)]
    B, seed = 60, 0
    df = spark.createDataFrame(rows, "i long, a double, b double")
    got = compile_pipeline(
        [{"$pairedBootstrap": {"id": "$i", "a": "$a", "b": "$b",
                               "samples": B}}],
        Context(spark=spark))(df).collect()[0]
    wins = ties = 0
    for r in range(1, B + 1):
        wdiff = wsum = 0.0
        for i, a, b in rows:
            w = weight(seed, i, r)
            wdiff += w * (a - b)
            wsum += w
        if wsum > 0 and wdiff > 0:
            wins += 1
        elif wsum == 0 or wdiff == 0:
            ties += 1
    assert got["n"] == len(rows)
    assert got["wins_a"] == wins and got["ties"] == ties
    assert abs(got["p_value"] - (B - wins) / B) < 1e-12
    mean_a = sum(a for _, a, _ in rows) / len(rows)
    mean_b = sum(b for _, _, b in rows) / len(rows)
    assert abs(got["mean_a"] - mean_a) < 1e-12
    assert abs(got["delta"] - (mean_a - mean_b)) < 1e-12
    # determinism across runs
    again = compile_pipeline(
        [{"$pairedBootstrap": {"id": "$i", "a": "$a", "b": "$b",
                               "samples": B}}],
        Context(spark=spark))(df).collect()[0]
    assert again == got
    # a different seed moves the replicate draws (but not the means)
    other = compile_pipeline(
        [{"$pairedBootstrap": {"id": "$i", "a": "$a", "b": "$b",
                               "samples": B, "seed": 1}}],
        Context(spark=spark))(df).collect()[0]
    assert other["mean_a"] == got["mean_a"]
    assert other["wins_a"] != got["wins_a"] or other["ties"] != got["ties"]


def test_paired_bootstrap_composes_with_metric_stages(spark):
    """Real composition: $chrf scores two 'systems' per segment, then
    $pairedBootstrap judges the gap — system A (20-word prefix
    candidate) must dominate system B (5-word prefix) against the full
    text, with a p_value near 0."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = compile_pipeline([
        {"$truncateTokens": {"input": "$text", "as": "h20", "max": 20}},
        {"$truncateTokens": {"input": "$text", "as": "h5", "max": 5}},
        {"$truncateTokens": {"input": "$text", "as": "ref", "max": 30}},
        # maxChars keeps the clip aggregate O(300^2) per row — against
        # the full 2000-char default this test is minutes of CPU
        {"$chrf": {"candidate": "$h20", "reference": "$ref", "maxN": 3,
                   "maxChars": 300, "as": "sa"}},
        {"$chrf": {"candidate": "$h5", "reference": "$ref", "maxN": 3,
                   "maxChars": 300, "as": "sb"}},
        {"$pairedBootstrap": {"id": "$doc_id", "a": "$sa", "b": "$sb",
                              "samples": 50}},
    ], Context(spark=spark))(docs).collect()[0]
    assert out["n"] == 500 and out["delta"] > 0
    assert out["p_value"] <= 0.02
    # edge: empty input
    empty = compile_pipeline(
        [{"$pairedBootstrap": {"id": "$doc_id", "a": "$sa", "b": "$sb"}}],
        Context(spark=spark))(
        spark.createDataFrame([], "doc_id long, sa double, sb double")
    ).collect()[0]
    assert empty["n"] == 0 and empty["p_value"] is None
    # config guard + corpus-only gate
    with pytest.raises(ValueError, match="samples"):
        compile_pipeline(
            [{"$pairedBootstrap": {"id": "$i", "a": "$a", "b": "$b",
                                   "samples": 0}}], Context(spark=spark))
    mb = Context(spark=spark)
    mb.micro_batch = True
    with pytest.raises(ValueError, match="corpus-wide"):
        compile_pipeline(
            [{"$pairedBootstrap": {"id": "$doc_id", "a": "$sa",
                                   "b": "$sb"}}], mb)(docs)


def test_materialize_barrier(spark):
    """$materialize pins rows so a downstream $match cannot be
    predicate-pushed (substituted) into an expensive upstream column
    program; results are identical with and without the barrier."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(60)
    base = [{"$chrf": {"candidate": {"$substrCP": ["$text", 0, 30]},
                       "reference": {"$substrCP": ["$text", 0, 60]},
                       "maxN": 2, "maxChars": 120, "as": "s"}}]
    bar = compile_pipeline(
        base + [{"$materialize": {}}, {"$match": {"s": {"$gt": 0.2}}}],
        Context(spark=spark))(docs)
    plan = bar._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan  # the barrier is real
    got = sorted(r["doc_id"] for r in bar.collect())
    want = sorted(r["doc_id"] for r in compile_pipeline(
        base + [{"$match": {"s": {"$gt": 0.2}}}],
        Context(spark=spark))(docs).collect())
    assert got == want and len(got) > 0
    # local mode forced
    loc = compile_pipeline(base + [{"$materialize": {"mode": "local"}}],
                           Context(spark=spark))(docs)
    assert loc.count() == 60
    # config guard + streaming-plan rejection
    with pytest.raises(ValueError, match="mode"):
        compile_pipeline([{"$materialize": {"mode": "eager"}}],
                         Context(spark=spark))
    stream_ctx = Context(spark=spark)
    stream_ctx.streaming = True
    with pytest.raises(ValueError, match="batch-only"):
        compile_pipeline([{"$materialize": {}}], stream_ctx)(docs)


def test_bootstrap_ci_matches_independent_python(spark):
    """$bootstrapCI vs an independent Python replication (same md5
    weights, same pinned order-statistic convention)."""
    import hashlib
    import math

    CDF = [0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
           0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
           0.999916758850712, 0.9999897508033254]

    def weight(seed, rid, r):
        h = hashlib.md5(f"{seed}:{rid}:{r}".encode()).hexdigest()
        u = int(h[:15], 16) / float(16 ** 15)
        for k, t in enumerate(CDF):
            if u < t:
                return k
        return 8

    rng = random.Random(17)
    rows = [(i, rng.randint(0, 127) / 128.0) for i in range(120)]
    B = 80
    df = spark.createDataFrame(rows, "i long, v double")
    got = compile_pipeline(
        [{"$bootstrapCI": {"id": "$i", "input": "$v", "samples": B}}],
        Context(spark=spark))(df).collect()[0]
    means = []
    for r in range(1, B + 1):
        wv = wsum = 0.0
        for i, v in rows:
            w = weight(0, i, r)
            wv += w * v
            wsum += w
        if wsum > 0:
            means.append(wv / wsum)
    means.sort()
    lo = means[min(max(1, math.ceil(0.025 * B)), len(means)) - 1]
    hi = means[min(max(1, math.ceil(0.975 * B)), len(means)) - 1]
    assert got["n"] == len(rows)
    assert abs(got["mean"] - sum(v for _, v in rows) / len(rows)) < 1e-12
    assert abs(got["ci_low"] - lo) < 1e-12
    assert abs(got["ci_high"] - hi) < 1e-12
    assert got["ci_low"] <= got["mean"] <= got["ci_high"]
    # empty input + guards + corpus-only gate
    empty = compile_pipeline(
        [{"$bootstrapCI": {"id": "$i", "input": "$v"}}],
        Context(spark=spark))(
        spark.createDataFrame([], "i long, v double")).collect()[0]
    assert empty["n"] == 0 and empty["ci_low"] is None
    with pytest.raises(ValueError, match="alpha"):
        compile_pipeline(
            [{"$bootstrapCI": {"id": "$i", "input": "$v", "alpha": 1.5}}],
            Context(spark=spark))
    mb = Context(spark=spark)
    mb.micro_batch = True
    with pytest.raises(ValueError, match="corpus-wide"):
        compile_pipeline(
            [{"$bootstrapCI": {"id": "$i", "input": "$v"}}], mb)(df)


def test_classification_eval_weighted_and_labels(spark):
    """sklearn's remaining axes: average='weighted' (support-weighted
    means) and labels= (fixed label set — absent labels appear with
    zero counts, observed-only labels drop out; accuracy stays
    global); micro over a restricted set is pooled-count P/R/F1."""
    rng = random.Random(2718)
    labels = ["x", "y", "z"]
    rows = [(i,
             rng.choice(labels + ["EXTRA"]),
             rng.choice(labels)) for i in range(200)]
    df = spark.createDataFrame(rows, "i long, p string, a string")
    pairs = [(p, a) for _, p, a in rows]
    want = _ref_classification(pairs)
    # weighted over the full union
    got = compile_pipeline(
        [{"$classificationEval": {"predicted": "$p", "actual": "$a",
                                  "average": "weighted"}}],
        Context(spark=spark))(df).collect()[0]
    stats = {lb: (_prf(*v), v[0] + v[2]) for lb, v in want.items()}
    tot_sup = sum(s for _, s in stats.values())
    for idx, col in enumerate(("precision", "recall", "f1")):
        w = sum(prf[idx] * s for prf, s in stats.values()) / tot_sup
        assert abs(got[col] - w) < 1e-12, col
    assert got["n"] == len(pairs)
    # labels=: fixed set incl. an absent label, excl. EXTRA
    per = {r["label"]: r for r in compile_pipeline(
        [{"$classificationEval": {"predicted": "$p", "actual": "$a",
                                  "labels": ["x", "y", "ABSENT"]}}],
        Context(spark=spark))(df).collect()}
    assert set(per) == {"x", "y", "ABSENT"}
    assert per["ABSENT"]["tp"] == 0 and per["ABSENT"]["support"] == 0 \
        and per["ABSENT"]["precision"] == 0.0
    for lb in ("x", "y"):
        tp, fp, fn = want[lb]
        assert (per[lb]["tp"], per[lb]["fp"], per[lb]["fn"]) \
            == (tp, fp, fn)
    # micro over a restricted set = pooled counts, NOT accuracy
    mic = compile_pipeline(
        [{"$classificationEval": {"predicted": "$p", "actual": "$a",
                                  "average": "micro",
                                  "labels": ["x", "y"]}}],
        Context(spark=spark))(df).collect()[0]
    stp = sum(want[lb][0] for lb in ("x", "y"))
    sfp = sum(want[lb][1] for lb in ("x", "y"))
    sfn = sum(want[lb][2] for lb in ("x", "y"))
    assert abs(mic["precision"] - stp / (stp + sfp)) < 1e-12
    assert abs(mic["recall"] - stp / (stp + sfn)) < 1e-12
    assert abs(mic["f1"] - 2 * stp / (2 * stp + sfp + sfn)) < 1e-12
    acc = sum(v[0] for v in want.values()) / len(pairs)
    assert abs(mic["accuracy"] - acc) < 1e-12  # accuracy stays global
    # guard
    with pytest.raises(ValueError, match="labels"):
        compile_pipeline(
            [{"$classificationEval": {"predicted": "$p", "actual": "$a",
                                      "labels": []}}],
            Context(spark=spark))


def test_regression_eval_r2_stable_at_large_offset(spark):
    """VERDICT r10 #2: SS_tot via the one-pass identity Sigma a^2 -
    (Sigma a)^2/n cancels catastrophically when |mean| >> stddev; the
    stable form is var_pop(a)*n.  actuals ~1e9 with variance 0.25 and
    errors of 0.1: the old identity returns noise (r2 wildly off or
    null from negative SS_tot); the stable form must match the exact
    closed form to 1e-6."""
    n = 1000
    rows = [(float(1_000_000_000 + (i % 2)),
             float(1_000_000_000 + (i % 2))
             + (0.1 if i % 4 < 2 else -0.1))
            for i in range(n)]
    df = spark.createDataFrame(rows, "a double, p double")
    got = compile_pipeline(
        [{"$regressionEval": {"predicted": "$p", "actual": "$a"}}],
        Context(spark=spark))(df).collect()[0]
    # exact: ssr = 0.01*n, ss_tot = 0.25*n -> r2 = 1 - 0.04 = 0.96
    assert got["n"] == n
    assert got["r2"] is not None
    assert abs(got["r2"] - 0.96) < 1e-6
    # 1e9 + 0.1 is not exactly representable; the ~5e-8 relative input
    # quantization shows up in mse (not an engine artifact)
    assert abs(got["mse"] - 0.01) < 1e-7


def test_classification_eval_empty_corpus_averaged(spark):
    """ADVICE r11: averaged mode on an empty (or all-null) input must
    report n = 0 with null metrics, like $regressionEval."""
    edf = spark.createDataFrame([], "p string, a string")
    ndf = spark.createDataFrame([(None, None)], "p string, a string")
    for df in (edf, ndf):
        for avg in ("macro", "micro", "weighted"):
            got = compile_pipeline(
                [{"$classificationEval": {"predicted": "$p",
                                          "actual": "$a",
                                          "average": avg}}],
                Context(spark=spark))(df).collect()[0]
            assert got["n"] == 0, avg
            for col in ("accuracy", "precision", "recall", "f1"):
                assert got[col] is None, (avg, col)
        # per-label mode: zero rows
        assert compile_pipeline(
            [{"$classificationEval": {"predicted": "$p",
                                      "actual": "$a"}}],
            Context(spark=spark))(df).count() == 0


# ---- r11 corpus-statistic bootstrap modes (Koehn 2004 proper) --------

_CDF = [0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
        0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
        0.999916758850712, 0.9999897508033254]


def _pb_weight(seed, rid, r):
    import hashlib
    h = hashlib.md5(f"{seed}:{rid}:{r}".encode()).hexdigest()
    u = int(h[:15], 16) / float(16 ** 15)
    for k, t in enumerate(_CDF):
        if u < t:
            return k
    return 8


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        cur = [i]
        for j, y in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (x != y)))
        prev = cur
    return prev[-1]


def _mk_texts(rng, n_rows, vocab=20, lo=6, hi=18):
    """(id, cand_a, cand_b, ref) word sentences: a = prefix of ref
    (strong system), b = random (weak system)."""
    rows = []
    for i in range(n_rows):
        ref = [f"w{rng.randrange(vocab)}" for _ in range(rng.randint(lo, hi))]
        a = ref[: max(1, len(ref) - rng.randint(0, 4))]
        b = [f"w{rng.randrange(vocab)}" for _ in range(rng.randint(lo, hi))]
        rows.append((i, " ".join(a), " ".join(b), " ".join(ref)))
    return rows


def test_paired_bootstrap_corpus_wer_differential(spark):
    """statistic: corpusWer — per replicate the corpus WER is
    sum(w*dist)/sum(w*n_ref) per system; A beats B when its WER is
    LOWER.  Full hand-Python reproduction including weights."""
    rng = random.Random(7171)
    rows = _mk_texts(rng, 120)
    B, seed = 40, 0
    df = spark.createDataFrame(rows, "i long, ca string, cb string, ref string")
    got = compile_pipeline(
        [{"$pairedBootstrap": {"id": "$i", "statistic": "corpusWer",
                               "a": "$ca", "b": "$cb",
                               "reference": "$ref", "samples": B}}],
        Context(spark=spark))(df).collect()[0]
    stats = []
    for i, ca, cb, ref in rows:
        wr = ref.split()
        stats.append((i, _lev(ca.split(), wr), _lev(cb.split(), wr), len(wr)))
    wins = ties = 0
    for r in range(1, B + 1):
        da = db = nr = wsum = 0
        for i, d_a, d_b, n_ref in stats:
            w = _pb_weight(seed, i, r)
            da += w * d_a; db += w * d_b; nr += w * n_ref; wsum += w
        if wsum == 0 or nr == 0:
            ties += 1
            continue
        delta = da / nr - db / nr
        if delta < 0:
            wins += 1
        elif delta == 0:
            ties += 1
    assert got["n"] == len(rows)
    assert got["wins_a"] == wins and got["ties"] == ties
    assert abs(got["p_value"] - (B - wins) / B) < 1e-12
    tot_nr = sum(s[3] for s in stats)
    wer_a = sum(s[1] for s in stats) / tot_nr
    wer_b = sum(s[2] for s in stats) / tot_nr
    assert abs(got["mean_a"] - wer_a) < 1e-12
    assert abs(got["mean_b"] - wer_b) < 1e-12
    assert abs(got["delta"] - (wer_a - wer_b)) < 1e-12


def _bleu_stats(cand, ref, max_n):
    from collections import Counter
    wc, wr = cand.split(), ref.split()
    out = {"c_len": len(wc), "r_len": len(wr)}
    for n in range(1, max_n + 1):
        gc = [" ".join(wc[i:i + n]) for i in range(len(wc) - n + 1)]
        gr = [" ".join(wr[i:i + n]) for i in range(len(wr) - n + 1)]
        cc, cr = Counter(gc), Counter(gr)
        out[f"m{n}"] = sum(min(v, cr[g]) for g, v in cc.items())
        out[f"t{n}"] = len(gc)
    return out


def _bleu_from_sums(s, max_n, smooth=None):
    import math
    log_sum = 0.0
    for n in range(1, max_n + 1):
        m, t = s[f"m{n}"], s[f"t{n}"]
        if smooth == "add1" and n >= 2:
            if t == 0:
                return 0.0
            p = (m + 1) / (t + 1)
        else:
            if t == 0 or m == 0:
                return 0.0
            p = m / t
        log_sum += math.log(p) / max_n
    c, r = s["c_len"], s["r_len"]
    bp = 1.0 if c >= r else math.exp(1 - r / c)
    return bp * math.exp(log_sum)


def test_paired_bootstrap_corpus_bleu_differential(spark):
    """statistic: corpusBleu — a replicate's corpus BLEU is the
    Papineni corpus formula over weighted-summed per-segment clipped
    counts; hand-Python reproduces score, wins and p exactly."""
    rng = random.Random(2424)
    rows = _mk_texts(rng, 100)
    B, seed, MAXN = 30, 3, 2
    df = spark.createDataFrame(rows, "i long, ca string, cb string, ref string")
    got = compile_pipeline(
        [{"$pairedBootstrap": {"id": "$i", "statistic": "corpusBleu",
                               "a": {"candidate": "$ca"},
                               "b": {"candidate": "$cb"},
                               "reference": "$ref", "maxN": MAXN,
                               "samples": B, "seed": seed}}],
        Context(spark=spark))(df).collect()[0]
    sa = [(_bleu_stats(ca, ref, MAXN), _bleu_stats(cb, ref, MAXN), i)
          for i, ca, cb, ref in rows]
    keys = ["c_len", "r_len"] + [f"m{n}" for n in range(1, MAXN + 1)] \
        + [f"t{n}" for n in range(1, MAXN + 1)]
    wins = ties = 0
    for r in range(1, B + 1):
        acc_a = dict.fromkeys(keys, 0)
        acc_b = dict.fromkeys(keys, 0)
        wsum = 0
        for st_a, st_b, i in sa:
            w = _pb_weight(seed, i, r)
            wsum += w
            for k in keys:
                acc_a[k] += w * st_a[k]
                acc_b[k] += w * st_b[k]
        if wsum == 0:
            ties += 1
            continue
        delta = _bleu_from_sums(acc_a, MAXN) - _bleu_from_sums(acc_b, MAXN)
        if delta > 0:
            wins += 1
        elif delta == 0:
            ties += 1
    base_a = dict.fromkeys(keys, 0)
    base_b = dict.fromkeys(keys, 0)
    for st_a, st_b, _ in sa:
        for k in keys:
            base_a[k] += st_a[k]
            base_b[k] += st_b[k]
    assert got["n"] == len(rows)
    assert got["wins_a"] == wins and got["ties"] == ties
    assert abs(got["mean_a"] - _bleu_from_sums(base_a, MAXN)) < 1e-12
    assert abs(got["mean_b"] - _bleu_from_sums(base_b, MAXN)) < 1e-12
    assert abs(got["p_value"] - (B - wins) / B) < 1e-12


def test_bootstrap_ci_corpus_chrf_differential(spark):
    """$bootstrapCI statistic: corpusChrf — replicate scores are the
    pooled-F chrF formula over weighted char-n-gram sums; the interval
    is the pinned order-statistic convention over defined scores."""
    import math
    from collections import Counter

    rng = random.Random(5050)
    rows = _mk_texts(rng, 80)
    B, seed, MAXN, BETA = 25, 0, 3, 2.0
    ALPHA = 0.1
    df = spark.createDataFrame(rows, "i long, ca string, cb string, ref string")
    got = compile_pipeline(
        [{"$bootstrapCI": {"id": "$i", "statistic": "corpusChrf",
                           "candidate": "$ca", "reference": "$ref",
                           "maxN": MAXN, "beta": BETA, "alpha": ALPHA,
                           "samples": B, "seed": seed}}],
        Context(spark=spark))(df).collect()[0]

    def chrf_stats(cand, ref):
        sc = "".join(cand.split())
        sr = "".join(ref.split())
        out = {}
        for n in range(1, MAXN + 1):
            gc = [sc[i:i + n] for i in range(len(sc) - n + 1)]
            gr = [sr[i:i + n] for i in range(len(sr) - n + 1)]
            cc, cr = Counter(gc), Counter(gr)
            out[f"m{n}"] = sum(min(v, cr[g]) for g, v in cc.items())
            out[f"tc{n}"] = len(gc)
            out[f"tr{n}"] = len(gr)
        return out

    def chrf_from_sums(s):
        b2 = BETA * BETA
        p_sum = r_sum = 0.0
        n_eff = 0
        for n in range(1, MAXN + 1):
            m, tc, tr = s[f"m{n}"], s[f"tc{n}"], s[f"tr{n}"]
            if tc > 0 or tr > 0:
                n_eff += 1
                p_sum += m / tc if tc > 0 else 0.0
                r_sum += m / tr if tr > 0 else 0.0
        if n_eff == 0:
            return 0.0
        pavg, ravg = p_sum / n_eff, r_sum / n_eff
        if pavg + ravg == 0.0:
            return 0.0
        return (1 + b2) * pavg * ravg / (b2 * pavg + ravg)

    stats = [(chrf_stats(ca, ref), i) for i, ca, cb, ref in rows]
    keys = [f"{p}{n}" for n in range(1, MAXN + 1) for p in ("m", "tc", "tr")]
    reps = []
    for r in range(1, B + 1):
        acc = dict.fromkeys(keys, 0)
        wsum = 0
        for st, i in stats:
            w = _pb_weight(seed, i, r)
            wsum += w
            for k in keys:
                acc[k] += w * st[k]
        if wsum > 0:
            reps.append(chrf_from_sums(acc))
    reps.sort()
    lo_i = max(1, math.ceil(ALPHA / 2 * B))
    hi_i = max(1, math.ceil((1 - ALPHA / 2) * B))
    ci_low = reps[min(lo_i, len(reps)) - 1]
    ci_high = reps[min(hi_i, len(reps)) - 1]
    base = dict.fromkeys(keys, 0)
    for st, _ in stats:
        for k in keys:
            base[k] += st[k]
    assert got["n"] == len(rows)
    assert abs(got["mean"] - chrf_from_sums(base)) < 1e-12
    assert abs(got["ci_low"] - ci_low) < 1e-12
    assert abs(got["ci_high"] - ci_high) < 1e-12


def test_corpus_statistic_config_guards(spark):
    df = spark.createDataFrame([(1, "a", "b", "c")],
                               "i long, ca string, cb string, ref string")
    with pytest.raises(ValueError, match="statistic"):
        compile_pipeline(
            [{"$pairedBootstrap": {"id": "$i", "a": "$ca", "b": "$cb",
                                   "statistic": "corpusRouge"}}],
            Context(spark=spark))
    # corpusChrf is single-reference, matching $chrfCorpus
    with pytest.raises(ValueError, match="corpusChrf"):
        compile_pipeline(
            [{"$pairedBootstrap": {"id": "$i", "a": "$ca", "b": "$cb",
                                   "statistic": "corpusChrf",
                                   "references": ["$ref"]}}],
            Context(spark=spark))
    with pytest.raises(ValueError, match="exactly one"):
        compile_pipeline(
            [{"$bootstrapCI": {"id": "$i", "candidate": "$ca",
                               "statistic": "corpusBleu"}}],
            Context(spark=spark))


def test_paired_bootstrap_corpus_bleu_multiref_differential(spark):
    """corpusBleu with references: — per-system clip against the MAX
    across references and per-system closest-length effective reference
    (Papineni §2.2-2.3), resampled; hand-Python reproduces wins and the
    corpus scores exactly."""
    from collections import Counter

    rng = random.Random(8686)
    rows = []
    for i in range(60):
        ref1 = [f"w{rng.randrange(12)}" for _ in range(rng.randint(6, 14))]
        ref2 = ref1[: max(2, len(ref1) - rng.randint(0, 5))]
        a = ref1[: max(1, len(ref1) - rng.randint(0, 3))]
        b = [f"w{rng.randrange(12)}" for _ in range(rng.randint(6, 14))]
        rows.append((i, " ".join(a), " ".join(b),
                     [" ".join(ref1), " ".join(ref2)]))
    B, seed, MAXN = 25, 0, 2
    df = spark.createDataFrame(
        rows, "i long, ca string, cb string, refs array<string>")
    got = compile_pipeline(
        [{"$pairedBootstrap": {"id": "$i", "statistic": "corpusBleu",
                               "a": "$ca", "b": "$cb",
                               "references": "$refs", "maxN": MAXN,
                               "samples": B, "seed": seed}}],
        Context(spark=spark))(df).collect()[0]

    def seg_stats(cand, refs):
        wc = cand.split()
        wrs = [r.split() for r in refs]
        out = {"c_len": len(wc)}
        # effective reference length: closest to candidate, ties shorter
        best = None
        for wr in wrs:
            d = abs(len(wr) - len(wc))
            if best is None or d < best[0] or (d == best[0]
                                               and len(wr) < best[1]):
                best = (d, len(wr))
        out["r_len"] = best[1]
        for n in range(1, MAXN + 1):
            gc = [" ".join(wc[i:i + n]) for i in range(len(wc) - n + 1)]
            cc = Counter(gc)
            maxr = Counter()
            for wr in wrs:
                gr = Counter(" ".join(wr[i:i + n])
                             for i in range(len(wr) - n + 1))
                for g, v in gr.items():
                    maxr[g] = max(maxr[g], v)
            out[f"m{n}"] = sum(min(v, maxr[g]) for g, v in cc.items())
            out[f"t{n}"] = len(gc)
        return out

    keys = ["c_len", "r_len"] + [f"m{n}" for n in range(1, MAXN + 1)] \
        + [f"t{n}" for n in range(1, MAXN + 1)]
    segs = [(seg_stats(ca, refs), seg_stats(cb, refs), i)
            for i, ca, cb, refs in rows]
    wins = ties = 0
    for r in range(1, B + 1):
        acc_a = dict.fromkeys(keys, 0)
        acc_b = dict.fromkeys(keys, 0)
        wsum = 0
        for st_a, st_b, i in segs:
            w = _pb_weight(seed, i, r)
            wsum += w
            for k in keys:
                acc_a[k] += w * st_a[k]
                acc_b[k] += w * st_b[k]
        if wsum == 0:
            ties += 1
            continue
        d = _bleu_from_sums(acc_a, MAXN) - _bleu_from_sums(acc_b, MAXN)
        if d > 0:
            wins += 1
        elif d == 0:
            ties += 1
    base_a = dict.fromkeys(keys, 0)
    base_b = dict.fromkeys(keys, 0)
    for st_a, st_b, _ in segs:
        for k in keys:
            base_a[k] += st_a[k]
            base_b[k] += st_b[k]
    assert got["n"] == len(rows)
    assert got["wins_a"] == wins and got["ties"] == ties
    assert abs(got["mean_a"] - _bleu_from_sums(base_a, MAXN)) < 1e-12
    assert abs(got["mean_b"] - _bleu_from_sums(base_b, MAXN)) < 1e-12


def test_bootstrap_ci_corpus_chrf_sacrebleu_formula(spark):
    """The corpusChrf bootstrap statistic honors formula: "sacrebleu"
    (per-order F over pooled weighted counts, both-sides-effective)."""
    import math
    from collections import Counter

    rng = random.Random(4242)
    rows = _mk_texts(rng, 40)
    B, seed, MAXN, BETA = 20, 0, 3, 2.0
    df = spark.createDataFrame(rows,
                               "i long, ca string, cb string, ref string")
    got = compile_pipeline(
        [{"$bootstrapCI": {"id": "$i", "statistic": "corpusChrf",
                           "candidate": "$ca", "reference": "$ref",
                           "maxN": MAXN, "beta": BETA,
                           "formula": "sacrebleu", "samples": B,
                           "seed": seed}}],
        Context(spark=spark))(df).collect()[0]
    b2 = BETA * BETA

    def stats(c, r, n):
        sc = "".join(c.split())
        sr = "".join(r.split())
        gc = [sc[i:i + n] for i in range(len(sc) - n + 1)]
        gr = [sr[i:i + n] for i in range(len(sr) - n + 1)]
        cc, cr = Counter(gc), Counter(gr)
        return (sum(min(v, cr[g]) for g, v in cc.items()),
                len(gc), len(gr))

    def score(acc):
        f_sum, n_eff = 0.0, 0
        for n in range(1, MAXN + 1):
            m, tc, tr = acc[n]
            if tc > 0 and tr > 0:
                p, r_ = m / tc, m / tr
                denom = b2 * p + r_
                f_sum += (1 + b2) * p * r_ / denom if denom > 0 else 0.0
                n_eff += 1
        return f_sum / n_eff if n_eff else 0.0

    seg = [({n: stats(ca, ref, n) for n in range(1, MAXN + 1)}, i)
           for i, ca, cb, ref in rows]
    reps = []
    for r in range(1, B + 1):
        acc = {n: [0, 0, 0] for n in range(1, MAXN + 1)}
        wsum = 0
        for st, i in seg:
            w = _pb_weight(seed, i, r)
            wsum += w
            for n in range(1, MAXN + 1):
                for j in range(3):
                    acc[n][j] += w * st[n][j]
        if wsum > 0:
            reps.append(score({n: tuple(acc[n]) for n in acc}))
    reps.sort()
    lo_i = max(1, math.ceil(0.025 * B))
    hi_i = max(1, math.ceil(0.975 * B))
    base = {n: [0, 0, 0] for n in range(1, MAXN + 1)}
    for st, _ in seg:
        for n in range(1, MAXN + 1):
            for j in range(3):
                base[n][j] += st[n][j]
    assert got["n"] == len(rows)
    assert abs(got["mean"] - score({n: tuple(base[n]) for n in base})) < 1e-12
    assert abs(got["ci_low"] - reps[min(lo_i, len(reps)) - 1]) < 1e-12
    assert abs(got["ci_high"] - reps[min(hi_i, len(reps)) - 1]) < 1e-12


def test_paired_bootstrap_corpus_ter_differential(spark):
    """statistic: corpusTer — per replicate the corpus TER is
    sum(w*edits)/sum(w*n_ref) per system, edits from the pinned
    greedy-shift search; A wins on LOWER TER.  Hand-Python
    reproduction via the independent TER reference."""
    from tests.test_eval_properties import _ref_ter

    rng = random.Random(6012)
    rows = []
    for i in range(60):
        ref = [f"w{rng.randrange(8)}" for _ in range(rng.randint(5, 12))]
        # system a: ref with a span moved (TER-cheap), system b: random
        if len(ref) >= 4:
            a_ = ref[2:4] + ref[:2] + ref[4:]
        else:
            a_ = list(ref)
        b_ = [f"w{rng.randrange(8)}" for _ in range(rng.randint(5, 12))]
        rows.append((i, " ".join(a_), " ".join(b_), " ".join(ref)))
    B, seed = 30, 0
    df = spark.createDataFrame(rows,
                               "i long, ca string, cb string, ref string")
    got = compile_pipeline(
        [{"$pairedBootstrap": {"id": "$i", "statistic": "corpusTer",
                               "a": "$ca", "b": "$cb",
                               "reference": "$ref", "samples": B}}],
        Context(spark=spark))(df).collect()[0]
    stats = []
    for i, ca, cb, ref in rows:
        ea = _ref_ter(ca, ref)[0]
        eb = _ref_ter(cb, ref)[0]
        nr = len(ref.split())
        stats.append((i, ea, eb, nr))
    wins = ties = 0
    for r in range(1, B + 1):
        sa = sb = snr = wsum = 0
        for i, ea, eb, nr in stats:
            w = _pb_weight(seed, i, r)
            sa += w * ea; sb += w * eb; snr += w * nr; wsum += w
        if wsum == 0 or snr == 0:
            ties += 1
            continue
        d = sa / snr - sb / snr
        if d < 0:
            wins += 1
        elif d == 0:
            ties += 1
    tot_nr = sum(x[3] for x in stats)
    assert got["n"] == len(rows)
    assert got["wins_a"] == wins and got["ties"] == ties
    assert abs(got["mean_a"] - sum(x[1] for x in stats) / tot_nr) < 1e-12
    assert abs(got["mean_b"] - sum(x[2] for x in stats) / tot_nr) < 1e-12
    assert abs(got["p_value"] - (B - wins) / B) < 1e-12


def test_corpus_bootstrap_bleu_tokenizer_13a(spark):
    """ADVICE r12: `statistic: corpusBleu` honors `tokenizer: "13a"` —
    the interval machinery tokenizes exactly like $bleuCorpus, so a
    corpusBleu CI brackets a 13a-tokenized point score.  Equivalence
    pin: punctuated text + tokenizer 13a == hand-13a-tokenized text
    with no tokenizer (same convention as the $bleuCorpus 13a test)."""
    rows = [
        (1, "hello, world!", "hello world !", "hello , world !"),
        (2, "a b, c.", "a b c .", "a , b c ."),
        (3, "x; y z", "x ; y z", "x ; y z"),
        (4, "good (bad) ugly", "good ( bad ) ugly", "good ( bad ) ugly"),
    ]
    df = spark.createDataFrame(rows, "i long, ca string, cb string, ref string")
    spec = {"id": "$i", "statistic": "corpusBleu", "maxN": 2,
            "candidate": "$ca", "reference": "$ref",
            "samples": 20, "seed": 7}
    got_13a = compile_pipeline(
        [{"$bootstrapCI": {**spec, "tokenizer": "13a"}}],
        Context(spark=spark))(df).collect()[0]
    # hand-tokenize candidate AND reference with the 13a rules (the
    # inputs here are simple enough that 13a == pad-all-punctuation)
    import re

    def tok(s):
        return re.sub(r"([^0-9a-z ])", r" \1 ", s)

    pre = [(i, tok(ca), cb, tok(ref)) for i, ca, cb, ref in rows]
    df2 = spark.createDataFrame(pre, "i long, ca string, cb string, ref string")
    got_pre = compile_pipeline(
        [{"$bootstrapCI": dict(spec)}], Context(spark=spark))(df2).collect()[0]
    assert got_13a["mean"] == got_pre["mean"]
    assert got_13a["ci_low"] == got_pre["ci_low"]
    assert got_13a["ci_high"] == got_pre["ci_high"]
    # and the option actually changes the result on punctuated text
    got_raw = compile_pipeline(
        [{"$bootstrapCI": dict(spec)}], Context(spark=spark))(df).collect()[0]
    assert got_raw["mean"] != got_13a["mean"]


def test_corpus_bootstrap_tokenizer_rejected_off_family(spark):
    """ADVICE r12: `tokenizer` on a non-BLEU corpus statistic raises
    (previously silently ignored)."""
    for stat, extra in (("corpusChrf", {}), ("corpusWer", {}),
                        ("corpusTer", {})):
        with pytest.raises(ValueError, match="tokenizer"):
            compile_pipeline(
                [{"$bootstrapCI": {"id": "$i", "statistic": stat,
                                   "candidate": "$c", "reference": "$r",
                                   "tokenizer": "13a", **extra}}],
                Context(spark=spark))
    # and corpusBleu still validates the tokenizer value itself
    with pytest.raises(ValueError, match="13a"):
        compile_pipeline(
            [{"$pairedBootstrap": {"id": "$i", "statistic": "corpusBleu",
                                   "a": "$a", "b": "$b", "reference": "$r",
                                   "tokenizer": "bogus"}}],
            Context(spark=spark))


def test_corpus_bootstrap_full_option_whitelist(spark):
    """ADVICE r13: the whole per-statistic option whitelist is enforced
    — any metric option belonging to a DIFFERENT corpus statistic
    raises instead of being silently ignored (the interval would not
    bracket the point score otherwise)."""
    ctx = Context(spark=spark)
    cases = (
        # chrF-family options on corpusBleu
        ("corpusBleu", {"wordOrder": 2}),
        ("corpusBleu", {"formula": "sacrebleu"}),
        ("corpusBleu", {"beta": 2.0}),
        # BLEU-family options on corpusChrf
        ("corpusChrf", {"smooth": "add1"}),
        # edit-rate options on corpusChrf / corpusBleu
        ("corpusChrf", {"caseSensitive": False}),
        ("corpusBleu", {"maxShiftSize": 5}),
        # wrong-family options on corpusWer
        ("corpusWer", {"smooth": "add1"}),
        ("corpusWer", {"formula": "popovic"}),
        ("corpusWer", {"maxShiftDistance": 5}),
    )
    for stat, extra in cases:
        with pytest.raises(ValueError, match="does not take"):
            compile_pipeline(
                [{"$bootstrapCI": {"id": "$i", "statistic": stat,
                                   "candidate": "$c", "reference": "$r",
                                   **extra}}], ctx)
    # native options still pass compile for each statistic
    for stat, extra in (
        ("corpusBleu", {"maxN": 2, "smooth": "add1", "maxWords": 50}),
        ("corpusChrf", {"maxN": 4, "beta": 1.0, "wordOrder": 2,
                        "maxWords": 50}),
        ("corpusWer", {"maxWords": 50, "caseSensitive": False}),
        ("corpusTer", {"maxWords": 50, "maxShiftSize": 5,
                       "maxShiftDistance": 10, "caseSensitive": False}),
    ):
        compile_pipeline(
            [{"$bootstrapCI": {"id": "$i", "statistic": stat,
                               "candidate": "$c", "reference": "$r",
                               **extra}}], ctx)


# ---------------------------------------------------------------------
# $rougeN / $rougeLsum (r12): rouge_score-library parity
# ---------------------------------------------------------------------

def _run1(spark, pipeline, rows, cols):
    df = spark.createDataFrame(rows, cols)
    return compile_pipeline(pipeline, Context(spark=spark))(df).collect()


def test_rouge_n_literal_vectors(spark):
    """Hand-computed rouge_score values (default tokenizer: lowercase
    [a-z0-9]+ runs).  Case 2 is Lin 2004's classic gunman pair."""
    rows = [
        (1, "The cat sat on the mat.", "The cat is on the mat."),
        (2, "Police killed the gunman.", "Police kill the gunman."),
    ]
    out = {r["i"]: r for r in _run1(
        spark,
        [{"$rougeN": {"candidate": "$c", "reference": "$r", "n": 1,
                      "as": "r1"}},
         {"$rougeN": {"candidate": "$c", "reference": "$r", "n": 2,
                      "as": "r2"}}],
        rows, ["i", "c", "r"])}
    r1, r2 = out[1]["r1"], out[1]["r2"]
    assert (r1["n_cand"], r1["n_ref"], r1["n_match"]) == (6, 6, 5)
    assert abs(r1["f1"] - 5 / 6) < 1e-12
    # bigrams: {the cat, cat sat, sat on, on the, the mat} vs
    # {the cat, cat is, is on, on the, the mat} -> 3 matches
    assert (r2["n_match"], r2["n_cand"]) == (3, 5)
    assert abs(r2["f1"] - 0.6) < 1e-12
    g1 = out[2]["r1"]
    assert abs(g1["recall"] - 0.75) < 1e-12  # Lin 2004 ROUGE-1 = 3/4


def test_rouge_n_whitespace_equals_ngram_overlap(spark, sf_dir):
    """tokenizer: whitespace reproduces $ngramOverlap exactly — guards
    the (deliberate) code parallelism between the two stages."""
    from conftest import load

    df = load(spark, "documents").limit(50)
    out = compile_pipeline(
        [{"$truncateTokens": {"input": "$text", "as": "cand", "max": 12}},
         {"$rougeN": {"candidate": "$cand", "reference": "$text", "n": 2,
                      "tokenizer": "whitespace", "as": "a"}},
         {"$ngramOverlap": {"candidate": "$cand", "reference": "$text",
                            "n": 2, "as": "b"}}],
        Context(spark=spark))(df).select("a", "b").collect()
    assert out and all(r["a"] == r["b"] for r in out)


def test_rouge_n_case_and_punct_fold(spark):
    """The rougeScore tokenizer lowercases and strips punctuation: a
    case/punctuation-mangled candidate still matches fully."""
    rows = [(1, "THE, Cat! SAT?", "the cat sat")]
    (r,) = _run1(
        spark,
        [{"$rougeN": {"candidate": "$c", "reference": "$r", "as": "s"}}],
        rows, ["i", "c", "r"])
    assert r["s"]["n_match"] == 3 and r["s"]["f1"] == 1.0


def test_rouge_n_multiref_max_f1_first_tie(spark):
    rows = [(1, "a b c d", ["a b x y", "a b c z", "a b c z"])]
    (r,) = _run1(
        spark,
        [{"$rougeN": {"candidate": "$c", "references": "$rs", "as": "s"}}],
        rows, ["i", "c", "rs"])
    # best reference is the second (3 unigram matches); scalar form on
    # it agrees exactly
    assert r["s"]["n_match"] == 3
    (one,) = _run1(
        spark,
        [{"$rougeN": {"candidate": "$c", "reference": "$r", "as": "s"}}],
        [(1, "a b c d", "a b c z")], ["i", "c", "r"])
    assert one["s"] == r["s"]


def test_rouge_n_option_validation(spark):
    for bad in ({"n": 0}, {"tokenizer": "bogus"}, {"maxWords": 0}):
        with pytest.raises(ValueError):
            compile_pipeline(
                [{"$rougeN": {"candidate": "$c", "reference": "$r",
                              **bad}}],
                Context(spark=spark))
    with pytest.raises(ValueError, match="exactly one"):
        compile_pipeline(
            [{"$rougeN": {"candidate": "$c"}}], Context(spark=spark))


def test_rouge_lsum_union_lcs_hand_trace(spark):
    """Multi-sentence union-LCS with count clipping, hand-traced through
    the rouge_score _summary_level_lcs procedure:

    cand sentences: [w1 w2 w3 w4 w5], [w6 w7 w8]
    ref  sentences: [w1 w2 w6 w7 w8], [w1 w3 w8 w9 w5]

    ref sent 1 union-LCS covers all 5 positions -> 5 hits (consumes
    cand's w1 w2 w6 w7 w8); ref sent 2 union = {w1, w3, w8, w5} but w1
    and w8 are exhausted in the candidate counter -> +2.  hits = 7,
    precision = 7/8, recall = 7/10."""
    rows = [(1, "w1 w2 w3 w4 w5\nw6 w7 w8",
             "w1 w2 w6 w7 w8\nw1 w3 w8 w9 w5")]
    (r,) = _run1(
        spark,
        [{"$rougeLsum": {"candidate": "$c", "reference": "$r",
                         "as": "s"}}],
        rows, ["i", "c", "r"])
    s = r["s"]
    assert s["hits"] == 7
    assert abs(s["precision"] - 7 / 8) < 1e-12
    assert abs(s["recall"] - 7 / 10) < 1e-12
    assert abs(s["f1"] - (2 * (7 / 8) * (7 / 10) / (7 / 8 + 7 / 10))) \
        < 1e-12


def test_rouge_lsum_single_sentence_is_rouge_l(spark):
    """With single-sentence texts the union degenerates to one LCS —
    agrees with $rougeL (whitespace tokenizer on both; the texts are
    already lowercase alphanumeric so tokenizers coincide)."""
    rows = [(1, "a b c d e f", "a x b c y e f")]
    (r,) = _run1(
        spark,
        [{"$rougeLsum": {"candidate": "$c", "reference": "$r",
                         "tokenizer": "whitespace", "as": "ls"}},
         {"$rougeL": {"candidate": "$c", "reference": "$r", "as": "rl"}}],
        rows, ["i", "c", "r"])
    assert r["ls"]["hits"] == r["rl"]["lcs"]
    assert abs(r["ls"]["f1"] - r["rl"]["f1"]) < 1e-12


def test_rouge_lsum_multiref_and_nulls(spark):
    rows = [
        (1, "a b\nc d", ["zzz", "a b\nc d"]),
        (2, None, ["a"]),
        (3, "a", None),
    ]
    out = {r["i"]: r["s"] for r in _run1(
        spark,
        [{"$rougeLsum": {"candidate": "$c", "references": "$rs",
                         "as": "s"}}],
        rows, ["i", "c", "rs"])}
    assert out[1]["f1"] == 1.0  # best reference is the exact match
    assert out[2] is None and out[3] is None


def test_rouge_lsum_max_words_cap(spark):
    """maxWords caps the TOTAL token count per side, truncating
    mid-sentence: with maxWords=3 the reference keeps [a b] + [c]."""
    rows = [(1, "a b c", "a b\nc d e")]
    (r,) = _run1(
        spark,
        [{"$rougeLsum": {"candidate": "$c", "reference": "$r",
                         "maxWords": 3, "as": "s"}}],
        rows, ["i", "c", "r"])
    s = r["s"]
    assert s["hits"] == 3 and s["recall"] == 1.0 and s["precision"] == 1.0


# ----------------------------------------------------- $permutationTest


def _perm_expected(rows, samples=50, seed=0):
    """Transcription of the stage's derivation: md5(seed:id:r) ->
    uniform -> sign flip, sums compared."""
    import hashlib

    t_obs = sum(a - b for _i, a, b in rows)
    ext = 0
    for r in range(1, samples + 1):
        t = 0.0
        for i, a, b in rows:
            u = int(hashlib.md5(
                f"{seed}:{i}:{r}".encode()).hexdigest()[:15], 16) \
                / float(16 ** 15)
            s = -1.0 if u < 0.5 else 1.0
            t += s * (a - b)
        if abs(t) >= abs(t_obs):
            ext += 1
    return t_obs, ext


def test_permutation_test_deterministic(spark):
    rows = [(str(i), (i * 37 % 8) / 8.0, (i * 53 + 3) % 8 / 8.0)
            for i in range(1, 21)]
    df = spark.createDataFrame(rows, "i string, a double, b double")
    (o,) = compile_pipeline(
        [{"$permutationTest": {"id": "$i", "a": "$a", "b": "$b",
                               "samples": 50}}],
        Context(spark=spark))(df).collect()
    t_obs, ext = _perm_expected(rows)
    assert o["n"] == 20 and o["b_samples"] == 50
    assert abs(o["delta"] - t_obs / 20) < 1e-12
    assert o["extreme"] == ext
    assert abs(o["p_value"] - (ext + 1) / 51) < 1e-12


def test_permutation_test_identical_systems(spark):
    """a == b: every replicate sum is 0 >= 0 -> p = 1."""
    rows = [(str(i), 0.5, 0.5) for i in range(10)]
    df = spark.createDataFrame(rows, "i string, a double, b double")
    (o,) = compile_pipeline(
        [{"$permutationTest": {"id": "$i", "a": "$a", "b": "$b",
                               "samples": 40}}],
        Context(spark=spark))(df).collect()
    assert o["extreme"] == 40 and o["p_value"] == 1.0


def test_permutation_test_nulls_and_options(spark):
    df = spark.createDataFrame(
        [("1", 1.0, 0.0), (None, 1.0, 0.0), ("3", None, 0.0)],
        "i string, a double, b double")
    (o,) = compile_pipeline(
        [{"$permutationTest": {"id": "$i", "a": "$a", "b": "$b",
                               "samples": 10}}],
        Context(spark=spark))(df).collect()
    assert o["n"] == 1
    with pytest.raises(ValueError, match="samples"):
        compile_pipeline(
            [{"$permutationTest": {"id": "$i", "a": "$a", "b": "$b",
                                   "samples": 0}}], Context(spark=spark))
