"""$kmeans (functions/datapipe.py): deterministic Lloyd iterations pinned
against an independent driver-side reference implementation."""

import hashlib
import math

from pyspark.sql import functions as F

from pincette_mongo_streams_spark import Context, compile_pipeline


def _ref_kmeans(vecs, k, iterations):
    """Independent re-implementation of the operator's contract: md5-seeded
    init, argmin-Euclidean assign (first index wins ties), mean update
    rounded half-up to 9 digits, empty cells keep their centroid."""
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
    return {i: assign(v) for i, v in vecs.items()}


def test_kmeans_matches_reference(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ctx = Context(spark=spark)
    out = compile_pipeline(
        [{"$kmeans": {"input": "$embedding", "id": "vec_id", "k": 4,
                      "iterations": 2, "as": "cluster"}},
         {"$project": {"vec_id": 1, "cluster": 1}}],
        ctx,
    )(emb).collect()
    got = {r["vec_id"]: r["cluster"] for r in out}
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in emb.collect()}
    assert got == _ref_kmeans(vecs, 4, 2)
    # labels live in 0..k-1 and every cluster is non-trivial on this data
    assert set(got.values()) == {0, 1, 2, 3}


def test_kmeans_deterministic_and_distance(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 100
    )
    ctx = Context(spark=spark)
    run = compile_pipeline(
        [{"$kmeans": {"input": "$embedding", "id": "vec_id", "k": 3,
                      "iterations": 3, "as": "cl", "distanceAs": "d"}}],
        ctx,
    )
    a = {(r["vec_id"], r["cl"], round(r["d"], 6)) for r in run(emb).collect()}
    b = {(r["vec_id"], r["cl"], round(r["d"], 6)) for r in run(emb).collect()}
    assert a == b
    assert all(d >= 0 for _, _, d in a)


def test_kmeans_fewer_rows_than_k(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 1.0])], "vec_id long, e array<double>"
    )
    out = compile_pipeline(
        [{"$kmeans": {"input": "$e", "id": "vec_id", "k": 5,
                      "iterations": 2, "as": "cluster"}}],
        Context(spark=spark),
    )(df).collect()
    got = {r["vec_id"]: r["cluster"] for r in out}
    # k clamps to the data: both points are their own (distinct) centroids
    assert got[1] != got[2]
