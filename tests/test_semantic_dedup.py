"""$semanticDedup (functions/datapipe.py): SemDeDup-style cluster-bounded
cosine dedup pinned against an independent driver-side reference
implementation (same contract re-derived from scratch: md5-seeded Lloyd
clustering, same-cell pairs, keep-farthest-from-centroid)."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from pincette_mongo_streams_spark import Context, compile_pipeline


def _lloyd_ref(vecs, k, iterations):
    """Independent Lloyd reference (the $kmeans contract): returns
    (cell assignment, final centroids)."""
    order = sorted(vecs, key=lambda i: (
        hashlib.md5(f"kmeans:{i}".encode()).hexdigest(), i))
    cents = [list(vecs[i]) for i in order[:k]]

    def assign(v):
        ds = [sum((x - y) ** 2 for x, y in zip(v, ct)) for ct in cents]
        return ds.index(min(ds))

    for _ in range(iterations):
        cells = {i: assign(v) for i, v in vecs.items()}
        for ci in range(len(cents)):
            members = [vecs[i] for i, cl in cells.items() if cl == ci]
            if not members:
                continue
            cents[ci] = [
                math.floor(sum(col) / len(members) * 1e9 + 0.5) / 1e9
                for col in zip(*members)
            ]
    return {i: assign(v) for i, v in vecs.items()}, cents


def _ref_semantic_dedup(vecs, k, iterations, threshold, keep):
    cells, cents = _lloyd_ref(vecs, k, iterations)

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v] if n > 0 else v

    def r9(x):
        return math.floor(x * 1e9 + 0.5) / 1e9

    units = {i: unit(v) for i, v in vecs.items()}
    cd = {
        i: r9(min(sum((x - y) ** 2 for x, y in zip(v, ct)) for ct in cents))
        for i, v in vecs.items()
    }
    dropped = set()
    ids = sorted(vecs)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1:]:
            if cells[a] != cells[b]:
                continue
            cos = r9(sum(x * y for x, y in zip(units[a], units[b])))
            if cos < threshold:
                continue
            if keep == "minId":
                dropped.add(b)
            elif cd[a] < cd[b]:
                dropped.add(a)
            elif cd[b] < cd[a]:
                dropped.add(b)
            else:
                dropped.add(max(a, b))
    return set(ids) - dropped


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _vecs(emb):
    return {r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in emb.collect()}


def test_keep_far_matches_reference(spark, emb):
    out = compile_pipeline(
        [{"$semanticDedup": {"input": "$embedding", "id": "vec_id",
                             "k": 3, "iterations": 1, "threshold": 0.3}}],
        Context(spark=spark),
    )(emb)
    got = {r["vec_id"] for r in out.select("vec_id").collect()}
    want = _ref_semantic_dedup(_vecs(emb), 3, 1, 0.3, "far")
    assert got == want
    assert 0 < len(got) < emb.count()  # some drop, some survive


def test_keep_min_id_matches_reference(spark, emb):
    out = compile_pipeline(
        [{"$semanticDedup": {"input": "$embedding", "id": "vec_id",
                             "k": 3, "iterations": 1, "threshold": 0.3,
                             "keep": "minId"}}],
        Context(spark=spark),
    )(emb)
    got = {r["vec_id"] for r in out.select("vec_id").collect()}
    assert got == _ref_semantic_dedup(_vecs(emb), 3, 1, 0.3, "minId")


def test_transitive_annotate_is_a_partition(spark, emb):
    """Annotate mode labels every row; labels are component min-ids, so a
    label always names a row that carries it, and dropping mode keeps
    exactly one row per label."""
    ctx = Context(spark=spark)
    spec = {"input": "$embedding", "id": "vec_id", "k": 3,
            "iterations": 1, "threshold": 0.3, "transitive": True}
    lab = compile_pipeline(
        [{"$semanticDedup": {**spec, "as": "cluster_id"}}], ctx
    )(emb)
    rows = {r["vec_id"]: r["cluster_id"] for r in lab.collect()}
    assert len(rows) == emb.count()  # annotate never drops
    labels = set(rows.values())
    assert labels <= set(rows)  # every label is a member's min id
    for vid, cl in rows.items():
        assert cl <= vid  # component label = min id in the component
    kept = compile_pipeline([{"$semanticDedup": spec}], ctx)(emb)
    kept_ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    assert kept_ids == labels  # exactly the representative per cluster


def test_spec_validation(spark):
    ctx = Context(spark=spark)
    with pytest.raises(ValueError, match="keep must be"):
        compile_pipeline(
            [{"$semanticDedup": {"input": "$e", "keep": "best"}}], ctx)
    with pytest.raises(ValueError, match="pairwise"):
        compile_pipeline(
            [{"$semanticDedup": {"input": "$e", "keep": "far",
                                 "transitive": True}}], ctx)
    with pytest.raises(ValueError, match="requires transitive"):
        compile_pipeline(
            [{"$semanticDedup": {"input": "$e", "as": "c"}}], ctx)


def test_plan_is_cell_equi_join(spark, emb):
    """The 100 TB contract: the pair join is a hash equi-join on the cell
    id — no cartesian/BNLJ anywhere in the plan."""
    out = compile_pipeline(
        [{"$semanticDedup": {"input": "$embedding", "id": "vec_id",
                             "k": 4, "iterations": 1, "threshold": 0.3}}],
        Context(spark=spark),
    )(emb)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
