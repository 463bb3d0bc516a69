"""Source/sink registry roundtrips (sources/registry.py).

The reference's I/O is injected publishers + Kafka/Mongo callbacks
(Base.java:77,94); here the registry fronts Spark's batch/streaming
readers and writers.  The Kafka connector jar is not in this image, so
the kafka paths are covered by wiring-validation only.
"""

import pytest

from pincette_mongo_streams_spark.sources.registry import read_source, write_sink


def test_parquet_source_reads_testdata(spark):
    df = read_source(spark, "parquet", "/root/testdata/sf0.001/region.parquet")
    assert df.count() == 5


@pytest.mark.parametrize("kind", ["parquet", "orc", "json", "csv"])
def test_batch_roundtrip(spark, tmp_path, kind):
    src = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    path = str(tmp_path / f"out_{kind}")
    write_sink(src, kind, path)
    schema = "id long, s string" if kind in ("json", "csv") else None
    back = read_source(spark, kind, path, schema=schema)
    got = sorted((r["id"], r["s"]) for r in back.collect())
    assert got == [(1, "a"), (2, "b")]


def test_kafka_source_requires_schema(spark):
    with pytest.raises(ValueError):
        read_source(spark, "kafka",
                    {"kafka.bootstrap.servers": "x:9092", "subscribe": "t"})


def test_unknown_kinds_rejected(spark):
    with pytest.raises(ValueError):
        read_source(spark, "xml", "/tmp/nope")
    df = spark.createDataFrame([(1,)], "i long")
    with pytest.raises(ValueError):
        write_sink(df, "xml", "/tmp/nope")


def test_partitioned_write_enables_pruning(spark, tmp_path):
    src = read_source(spark, "parquet", "/root/testdata/sf0.001/nation.parquet")
    path = str(tmp_path / "nation_part")
    write_sink(src, "parquet", path, partition_by=["n_regionkey"])
    back = read_source(spark, "parquet", path).filter("n_regionkey = 2")
    assert back.count() == src.filter("n_regionkey = 2").count()
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the filter must prune partitions at the scan, not post-filter rows
    assert "PartitionFilters: [" in plan and "n_regionkey" in \
        [l for l in plan.splitlines() if "PartitionFilters" in l][0]


def test_bucketed_write_skips_join_shuffle(spark, tmp_path):
    src = read_source(spark, "parquet", "/root/testdata/sf0.001/customer.parquet")
    path = str(tmp_path / "cust_bucketed")
    spark.sql("DROP TABLE IF EXISTS cust_bucketed")
    write_sink(src, "parquet", path, bucket_by=(4, ["c_custkey"]),
               table="cust_bucketed")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffle-join path: on a tiny table the planner prefers
        # broadcast and ignores bucketing; at scale the bucketed layout is
        # what removes the exchange
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        t = spark.table("cust_bucketed")
        joined = t.alias("a").join(t.alias("b"), "c_custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, \
            "bucketed self-join still shuffles"
        assert "Bucketed: true" in plan
        assert joined.count() == src.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS cust_bucketed")


def test_text_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([("hello",), ("world",)], "value string")
    path = str(tmp_path / "txt")
    write_sink(df, "text", path)
    back = read_source(spark, "text", path)
    assert sorted(r.value for r in back.collect()) == ["hello", "world"]


def test_avro_gated_without_jar(spark, tmp_path):
    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises((RuntimeError, Exception)):
        write_sink(df, "avro", str(tmp_path / "av"))


def test_kafka_reader_options_plumbing():
    """Broker-less smoke check of the kafka option plumbing (the full
    path is untested wiring: no broker/jar in this harness — SCALE.md)."""
    from pincette_mongo_streams_spark.sources.registry import (
        kafka_reader_options,
    )

    opts = kafka_reader_options({
        "kafka.bootstrap.servers": "h1:9092,h2:9092",
        "subscribe": "events",
        "startingOffsets": "earliest",
    })
    assert opts["subscribe"] == "events"
    with pytest.raises(ValueError, match="bootstrap"):
        kafka_reader_options({"subscribe": "events"})
    with pytest.raises(ValueError, match="exactly one"):
        kafka_reader_options({"kafka.bootstrap.servers": "h:9092"})
    with pytest.raises(ValueError, match="exactly one"):
        kafka_reader_options({"kafka.bootstrap.servers": "h:9092",
                              "subscribe": "a", "assign": "b"})


def test_delta_source_gated(spark, tmp_path):
    import pytest
    from pincette_mongo_streams_spark.sources.registry import read_source

    with pytest.raises(RuntimeError, match="delta-spark"):
        read_source(spark, "delta", str(tmp_path / "nope"))
