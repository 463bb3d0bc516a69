"""Pins for the `_spread` fan-out gate (dp_dedup._spread, r12).

The gate's job: fan per-row-heavy hash stages out across cores when the
input arrives effectively narrow, and NEVER reshuffle inputs that are
already wide.  "Effectively" is the operative word — `getNumPartitions()`
counts byte-range splits, but a parquet row group is indivisible, so a
small single-row-group file "split" 32 ways still executes as ONE task
(measured r12: minhash serialized 0.44 s -> 3.5 s under a 16 KB
openCostInBytes that manufactured 32 fictional splits).  The r12 gate
bounds effective parallelism by the row-group count for exchange-free
file-backed plans, and adds a `light=True` path for stages whose compute
per byte is on the order of moving the payload ($fingerprint), for which
a reshuffle can never pay on small inputs.
"""

import os

import pytest

from pyspark.sql import functions as F

from pincette_mongo_streams_spark.functions import dp_dedup
from pincette_mongo_streams_spark.functions.dp_dedup import (
    _row_group_bound,
    _spread,
)

from conftest import SF_DIR, load


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_row_group_bound_counts_footers(spark):
    df = load(spark, "documents")
    import pyarrow.parquet as pq

    expected = pq.ParquetFile(
        f"{SF_DIR}/documents.parquet").metadata.num_row_groups
    assert _row_group_bound(df) == expected


def test_row_group_bound_none_for_local_frames(spark):
    df = spark.createDataFrame([(1, "a")], ["id", "t"])
    assert _row_group_bound(df) is None


def test_heavy_spread_fires_on_fictional_splits(spark):
    """A single-row-group file reported as many splits must still fan
    out: the splits are empty, the rows all land in one task."""
    prev = spark.conf.get("spark.sql.files.openCostInBytes", None)
    spark.conf.set("spark.sql.files.openCostInBytes", "1024")
    try:
        df = load(spark, "documents")
        # fictional splits: reported >= 2 despite one row group
        assert df.rdd.getNumPartitions() >= 2
        out = _spread(df)
        assert "RoundRobin" in _plan(out)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.files.openCostInBytes")
        else:
            spark.conf.set("spark.sql.files.openCostInBytes", prev)


def test_spread_skips_post_shuffle_frames(spark):
    """After a real Exchange the reported partition count is real — the
    row-group bound must not force a second shuffle."""
    parallelism = spark.sparkContext.defaultParallelism
    df = load(spark, "documents").repartition(parallelism)
    out = _spread(df)
    assert out is df


def test_light_spread_never_reshuffles_small_inputs(spark):
    """One codegen pass over the payload costs what the move costs — a
    fan-out cannot amortize below the 32 MB serial-input threshold."""
    df = load(spark, "documents")
    out = _spread(df, light=True)
    assert out is df


def test_fingerprint_stage_is_exchange_free(spark, sf_dir):
    """$fingerprint (light) compiles to a pure map over the scan."""
    from pincette_mongo_streams_spark.context import Context
    from pincette_mongo_streams_spark.pipeline import compile_pipeline

    df = load(spark, "documents")
    out = compile_pipeline(
        [{"$fingerprint": {"input": "$text", "as": "fp"}},
         {"$project": {"doc_id": 1, "fp": 1}}],
        Context(spark=spark))(df)
    assert "RoundRobin" not in _plan(out)


def test_minhash_stage_still_spreads_narrow_input(spark):
    """$minhash (heavy, ~32 hashes per shingle) keeps the fan-out when
    the input is effectively narrow."""
    from pincette_mongo_streams_spark.context import Context
    from pincette_mongo_streams_spark.pipeline import compile_pipeline

    df = load(spark, "documents")
    if df.rdd.getNumPartitions() >= max(
            2, spark.sparkContext.defaultParallelism // 2):
        pytest.skip("input already wide at this core count")
    out = compile_pipeline(
        [{"$minhash": {"input": "$text", "as": "sig"}}],
        Context(spark=spark))(df)
    assert "RoundRobin" in _plan(out)


def test_pq_meta_object_store_scheme(monkeypatch):
    """ADVICE r13: non-local URI schemes resolve through pyarrow.fs, so
    the row-group bound and the light-spread size gate also apply on
    object-store inputs (the old os.stat path threw and was swallowed —
    gates silently never fired off file://)."""
    from pyarrow import fs as pafs

    path = f"{SF_DIR}/documents.parquet"
    class _Stub:
        @staticmethod
        def from_uri(uri):
            return pafs.LocalFileSystem(), uri.split("://", 1)[1]

    monkeypatch.setattr(pafs, "FileSystem", _Stub)
    import pyarrow.parquet as pq

    expected = pq.ParquetFile(path).metadata.num_row_groups
    n, size = dp_dedup._pq_meta(f"mock-s3://{path}")
    assert size == os.path.getsize(path)
    assert n == expected
    # need_rg=False skips the footer read entirely (no parquet open)
    n2, size2 = dp_dedup._pq_meta(f"mock-s3://{path}", need_rg=False)
    assert n2 is None and size2 == size


def test_pq_meta_local_paths_unchanged():
    path = f"{SF_DIR}/documents.parquet"
    import pyarrow.parquet as pq

    expected = pq.ParquetFile(path).metadata.num_row_groups
    for uri in (path, f"file://{path}"):
        n, size = dp_dedup._pq_meta(uri)
        assert n == expected and size == os.path.getsize(path)


def test_row_group_bound_skips_many_files(spark, monkeypatch):
    """>64 input files: the bound cannot bind below the split count and
    per-file footer reads would cost driver round trips for nothing."""
    df = load(spark, "documents")
    monkeypatch.setattr(
        type(df), "inputFiles",
        lambda self: [f"/nope/f{i}.parquet" for i in range(65)])
    assert _row_group_bound(df) is None
