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
