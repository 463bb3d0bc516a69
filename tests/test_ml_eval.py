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
    # config guard
    with pytest.raises(ValueError, match="average"):
        compile_pipeline(
            [{"$classificationEval": {"predicted": "$p", "actual": "$a",
                                      "average": "weighted"}}],
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
