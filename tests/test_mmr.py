"""$mmr (functions/datapipe.py): MMR diversified top-k pinned against an
independent Python greedy reference."""

import math
import random

import pytest

from pincette_mongo_streams_spark import Context, compile_pipeline


def _r9(x):
    return math.floor(x * 1e9 + 0.5) / 1e9


def _ref_mmr(rows, k, lam):
    """rows: {id: (score, vec)} (one group).  Returns {id: rank}."""

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v] if n > 0 else v

    us = {i: unit(v) for i, (_, v) in rows.items()}
    sel: list = []
    for _ in range(min(k, len(rows))):
        best = None
        for i in sorted(rows):
            if i in sel:
                continue
            ms = max((_r9(sum(a * b for a, b in zip(us[i], us[j])))
                      for j in sel), default=0.0)
            val = _r9(lam * rows[i][0] - (1.0 - lam) * ms)
            if best is None or val > best[1]:
                best = (i, val)
        sel.append(best[0])
    return {i: r + 1 for r, i in enumerate(sel)}


def test_mmr_prefers_diverse_over_redundant(spark):
    rows = [(1, 0.95, [1.0, 0.0]), (2, 0.94, [0.999, 0.04]),
            (3, 0.60, [0.0, 1.0]), (4, 0.10, [1.0, 0.0])]
    df = spark.createDataFrame(rows, "id long, s double, e array<double>")
    out = compile_pipeline(
        [{"$mmr": {"score": "$s", "input": "$e", "id": "id",
                   "k": 3, "lambda": 0.5, "as": "rank"}}],
        Context(spark=spark))(df)
    got = sorted((r["rank"], r["id"]) for r in out.collect())
    # 1 leads on score; the diverse 3 beats the near-dup 2 at step two
    assert got == [(1, 1), (2, 3), (3, 2)]


def test_mmr_lambda_one_is_pure_topk(spark):
    rows = [(i, i / 10.0, [1.0, 0.0]) for i in range(1, 8)]
    df = spark.createDataFrame(rows, "id long, s double, e array<double>")
    out = compile_pipeline(
        [{"$mmr": {"score": "$s", "input": "$e", "id": "id",
                   "k": 3, "lambda": 1.0}}],
        Context(spark=spark))(df)
    got = {r["id"]: r["mmr_rank"] for r in out.collect()}
    assert got == {7: 1, 6: 2, 5: 3}


def test_mmr_groups_and_small_groups(spark):
    rows = [(1, "a", 0.9, [1.0, 0.0]), (2, "a", 0.8, [0.0, 1.0]),
            (3, "b", 0.7, [1.0, 0.0])]
    df = spark.createDataFrame(
        rows, "id long, g string, s double, e array<double>")
    out = compile_pipeline(
        [{"$mmr": {"score": "$s", "input": "$e", "id": "id",
                   "by": "$g", "k": 5, "lambda": 0.7}}],
        Context(spark=spark))(df)
    got = sorted((r["g"], r["mmr_rank"], r["id"]) for r in out.collect())
    # k exceeds every group: all rows selected, per-group ranks from 1
    assert got == [("a", 1, 1), ("a", 2, 2), ("b", 1, 3)]


def test_mmr_matches_python_reference(spark):
    rng = random.Random(520)
    rows = {i: (round(rng.random(), 3),
                [round(rng.gauss(0, 1), 3) for _ in range(8)])
            for i in range(40)}
    df = spark.createDataFrame(
        [(i, s, v) for i, (s, v) in rows.items()],
        "id long, s double, e array<double>")
    out = compile_pipeline(
        [{"$mmr": {"score": "$s", "input": "$e", "id": "id",
                   "k": 10, "lambda": 0.6}}],
        Context(spark=spark))(df)
    got = {r["id"]: r["mmr_rank"] for r in out.collect()}
    assert got == _ref_mmr(rows, 10, 0.6)


def test_mmr_null_candidates_and_validation(spark):
    df = spark.createDataFrame(
        [(1, 0.9, [1.0]), (2, None, [1.0]), (3, 0.8, None)],
        "id long, s double, e array<double>")
    out = compile_pipeline(
        [{"$mmr": {"score": "$s", "input": "$e", "id": "id", "k": 5}}],
        Context(spark=spark))(df)
    assert [r["id"] for r in out.collect()] == [1]  # nulls not candidates
    ctx = Context(spark=spark)
    with pytest.raises(ValueError, match="lambda"):
        compile_pipeline(
            [{"$mmr": {"score": "$s", "input": "$e", "id": "id",
                       "lambda": 1.5}}], ctx)
    with pytest.raises(ValueError, match="k >= 1"):
        compile_pipeline(
            [{"$mmr": {"score": "$s", "input": "$e", "id": "id",
                       "k": 0}}], ctx)


# --------------------------------------------------------------- $rankEval


def test_rank_eval_known_values(spark):
    # one query: ranks 1..4, gains [3, 0, 2, 1] (linear dcg, k=3)
    rows = [(1, 1, 3.0), (2, 2, 0.0), (3, 3, 2.0), (4, 4, 1.0)]
    df = spark.createDataFrame(rows, "id long, r long, gain double")
    out = compile_pipeline(
        [{"$rankEval": {"by": 1, "rank": "$r", "gain": "$gain", "k": 3}}],
        Context(spark=spark))(df).collect()
    row = out[0]
    dcg = 3 / math.log2(2) + 0 / math.log2(3) + 2 / math.log2(4)
    idcg = 3 / math.log2(2) + 2 / math.log2(3) + 1 / math.log2(4)
    assert row["ndcg"] == math.floor(dcg / idcg * 1e6 + 0.5) / 1e6
    assert row["precision"] == math.floor(2 / 3 * 1e6 + 0.5) / 1e6
    assert row["recall"] == math.floor(2 / 3 * 1e6 + 0.5) / 1e6
    assert row["mrr"] == 1.0  # first relevant at rank 1
    assert row["n_relevant"] == 3
    # AP@3: relevant at ranks 1 and 3 within k -> (1/1 + 2/3)/min(3,3)
    assert row["ap"] == math.floor((1.0 + 2 / 3) / 3 * 1e6 + 0.5) / 1e6


def test_rank_eval_no_relevant_and_exp(spark):
    rows = [(1, "q", 1, 0.0), (2, "q", 2, 0.0),
            (3, "p", 1, 1.0), (4, "p", 2, 2.0)]
    df = spark.createDataFrame(rows, "id long, q string, r long, g double")
    out = compile_pipeline(
        [{"$rankEval": {"by": "$q", "rank": "$r", "gain": "$g",
                        "k": 2, "dcg": "exp"}}],
        Context(spark=spark))(df)
    rows_ = {r["_id"]: r for r in out.collect()}
    q = rows_["q"]
    assert q["ndcg"] == 0.0 and q["precision"] == 0.0
    assert q["recall"] is None and q["mrr"] is None and q["ap"] is None
    assert q["n_relevant"] == 0
    p = rows_["p"]
    # exp gains: 2^1-1=1 at rank1, 2^2-1=3 at rank2; ideal = 3, 1
    dcg = 1 / math.log2(2) + 3 / math.log2(3)
    idcg = 3 / math.log2(2) + 1 / math.log2(3)
    assert p["ndcg"] == math.floor(dcg / idcg * 1e6 + 0.5) / 1e6
    assert p["mrr"] == 1.0
    assert p["ap"] == 1.0  # both ranks relevant: (1/1 + 2/2)/2


def test_rank_eval_validation(spark):
    ctx = Context(spark=spark)
    with pytest.raises(ValueError, match="k >= 1"):
        compile_pipeline(
            [{"$rankEval": {"by": 1, "rank": "$r", "gain": "$g",
                            "k": 0}}], ctx)
    with pytest.raises(ValueError, match="dcg"):
        compile_pipeline(
            [{"$rankEval": {"by": 1, "rank": "$r", "gain": "$g",
                            "dcg": "log"}}], ctx)


def test_mmr_as_replaces_existing_column(spark):
    df = spark.createDataFrame(
        [(1, 0.9, [1.0, 0.0], "old"), (2, 0.5, [0.0, 1.0], "old")],
        "id long, s double, e array<double>, tag string")
    out = compile_pipeline(
        [{"$mmr": {"score": "$s", "input": "$e", "id": "id",
                   "k": 2, "as": "tag"}},
         {"$project": {"id": 1, "tag": 1}}],
        Context(spark=spark))(df)
    got = {r["id"]: r["tag"] for r in out.collect()}
    assert got == {1: 1, 2: 2}  # replaced, not duplicated


def test_mmr_duplicate_ids_collapse(spark):
    # two rows share id 1: selection sees ONE candidate (the higher
    # score), so ranks are unique per id and id 2 still gets selected
    df = spark.createDataFrame(
        [(1, 0.9, [1.0, 0.0]), (1, 0.8, [1.0, 0.0]),
         (2, 0.7, [0.0, 1.0])],
        "id long, s double, e array<double>")
    out = compile_pipeline(
        [{"$mmr": {"score": "$s", "input": "$e", "id": "id",
                   "k": 2, "lambda": 1.0}}],
        Context(spark=spark))(df)
    got = sorted((r["id"], r["mmr_rank"]) for r in out.collect())
    # both id-1 source rows carry rank 1; id 2 holds rank 2
    assert got == [(1, 1), (1, 1), (2, 2)]


def test_mmr_nan_score_is_not_a_candidate(spark):
    df = spark.createDataFrame(
        [(1, 0.5, [1.0]), (2, float("nan"), [1.0])],
        "id long, s double, e array<double>")
    out = compile_pipeline(
        [{"$mmr": {"score": "$s", "input": "$e", "id": "id", "k": 2}}],
        Context(spark=spark))(df)
    assert [r["id"] for r in out.collect()] == [1]
