"""Batch + streaming source/sink wiring.

Spark-first mapping of the reference's I/O model (Kafka in / Kafka +
MongoDB out):

- ``kafka``: ``spark.readStream.format("kafka")`` with the message value
  parsed by ``from_json`` against a declared schema (the engine is
  fixed-schema per pipeline — SURVEY.md §1); the ``__key`` column maps to
  the Kafka key.  The Kafka sink honors a per-row ``topic`` column, which
  makes ``$send`` near-native.
- ``parquet``/``json``/``csv``: batch scans (predicate pushdown + column
  pruning at the scan — keep filters early in the pipeline).
- ``memory``: test sink.

Connectors whose jars are not in this image (Kafka SQL, MongoDB, Delta)
are import-gated: the wiring is real, the smoke tests use files.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_source(
    spark: SparkSession,
    kind: str,
    path_or_options: Any,
    schema: Optional[T.StructType | str] = None,
    streaming: bool = False,
) -> DataFrame:
    reader = spark.readStream if streaming else spark.read
    # file formats take the schema on the reader; the kafka source forbids
    # a user schema (its frame is fixed key/value/...) — there the schema
    # types the from_json value parse instead
    if schema is not None and kind != "kafka":
        reader = reader.schema(schema)
    if kind == "parquet":
        return reader.parquet(path_or_options)
    if kind == "orc":
        return reader.orc(path_or_options)
    if kind == "json":
        return reader.json(path_or_options)
    if kind == "csv":
        return reader.option("header", True).csv(path_or_options)
    if kind == "text":
        return reader.text(path_or_options)
    if kind in ("avro", "delta"):
        # jar-dependent formats: gate so environments without the jar get
        # a clear error instead of a ClassNotFound stack — but ONLY
        # rewrap missing-data-source errors: a bad path or corrupt file
        # must surface as itself for users who do have the jar
        pkg = {"avro": "spark-avro", "delta": "delta-spark"}[kind]
        try:
            return reader.format(kind).load(path_or_options)
        except Exception as e:  # pragma: no cover - depends on jars
            msg = str(e)
            if ("Failed to find" in msg and "data source" in msg) or \
                    "ClassNotFoundException" in msg:
                raise RuntimeError(
                    f"{kind} source needs the {pkg} package on the classpath"
                ) from e
            raise
    if kind == "kafka":
        if schema is None:
            raise ValueError("kafka source needs a value schema (fixed-schema engine)")
        df = (
            reader.format("kafka")
            .options(**kafka_reader_options(path_or_options))
            .load()
        )
        parsed = df.select(
            F.col("key").cast("string").alias("__key"),
            F.from_json(F.col("value").cast("string"), schema).alias("__doc"),
        )
        return parsed.select("__key", "__doc.*")
    raise ValueError(f"unknown source kind {kind}")


def kafka_reader_options(options: Any) -> dict:
    """Validate/normalize the option dict handed to ``format("kafka")``.

    Split out from ``read_source`` so the plumbing is assertable without
    a broker or the kafka-sql jar (neither exists in this harness — the
    end-to-end Kafka path is documented as untested wiring in SCALE.md).
    Catches the two config mistakes a broker-less environment can't:
    missing bootstrap servers and zero/multiple subscription modes."""
    opts = dict(options)
    if not opts.get("kafka.bootstrap.servers"):
        raise ValueError("kafka source needs kafka.bootstrap.servers")
    modes = [k for k in ("subscribe", "subscribePattern", "assign")
             if k in opts]
    if len(modes) != 1:
        raise ValueError(
            "kafka source needs exactly one of subscribe / "
            f"subscribePattern / assign, got {modes or 'none'}"
        )
    return opts


def write_sink(
    df: DataFrame,
    kind: str,
    path_or_options: Any,
    mode: str = "overwrite",
    partition_by: Optional[list[str]] = None,
    bucket_by: Optional[tuple[int, list[str]]] = None,
    table: Optional[str] = None,
):
    """Batch/streaming sink dispatch.

    Scale levers on the batch file sinks:
    - ``partition_by``: hive-style directory partitioning — downstream
      scans prune partitions on those columns for free.
    - ``bucket_by = (n, cols)``: persists a hash-bucketed layout (requires
      ``table``, Spark bucketing is catalog-metadata); a later join or
      aggregation on the bucket columns skips its shuffle entirely — the
      pre-shuffled-at-rest layout for repeated 100 TB joins.
    """
    if df.isStreaming:
        if kind == "kafka":
            opts = dict(path_or_options)
            value = F.to_json(F.struct(*[c for c in df.columns if c != "__key"]))
            out = df.select(
                F.col("__key").alias("key") if "__key" in df.columns else F.lit(None).alias("key"),
                value.alias("value"),
                *([F.col("topic")] if "topic" in df.columns else []),
            )
            return out.writeStream.format("kafka").options(**opts).start()
        if kind == "memory":
            return df.writeStream.format("memory").queryName(path_or_options).outputMode(
                "update").start()
        if kind == "parquet":
            return df.writeStream.format("parquet").option("path", path_or_options).start()
        raise ValueError(f"unknown streaming sink {kind}")
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by is not None:
        if not table:
            raise ValueError("bucket_by needs a table name (catalog metadata)")
        n, cols = bucket_by
        writer = writer.bucketBy(n, *cols).sortBy(*cols)
        if kind in ("parquet", "orc", "json", "csv"):
            return writer.option("path", path_or_options).format(kind).saveAsTable(table)
        raise ValueError(f"unknown bucketed sink {kind}")
    if kind == "parquet":
        return writer.parquet(path_or_options)
    if kind == "orc":
        return writer.orc(path_or_options)
    if kind == "json":
        return writer.json(path_or_options)
    if kind == "csv":
        return writer.option("header", True).csv(path_or_options)
    if kind == "text":
        return writer.text(path_or_options)
    if kind == "avro":
        try:
            return writer.format("avro").save(path_or_options)
        except Exception as e:  # pragma: no cover - depends on jars
            raise RuntimeError(
                "avro sink needs the spark-avro package on the classpath"
            ) from e
    raise ValueError(f"unknown batch sink {kind}")
