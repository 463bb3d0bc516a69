"""Streaming throughput bench: the sf events table replayed as a file
stream through ``run_streaming``.  Three configs:

- ``hdfs`` / ``rocksdb``: the reference's canonical stateful shape —
  ``$deduplicate`` (event_id) then update-mode ``$group`` (per-user
  count/sum) — under each state-store provider;
- ``per_message_rocksdb``: the SAME pipeline under the reference-parity
  EMISSION protocol (``emission="per_message"``: $deduplicate feeds an
  applyInPandasWithState $group that emits once per state-CHANGING
  message) — directly comparable to the ``rocksdb`` row; the delta is
  the per-message operator + 8x the emitted rows.
- ``per_message_rocksdb_p8`` (r7): the same with ``state_partitions=8``
  — state-commit overhead, not the Python fold, floors the row above
  (BENCH_AB_r07.md).

Prints ONE JSON line::

    {"metric": "streaming_events_per_sec", "value": <hdfs ev/s>,
     "unit": "events/sec",
     "providers": {"hdfs": {...}, "rocksdb": {...},
                   "per_message_rocksdb": {...}},
     "events": N, "batches": B, "sf": ...}

Not part of bench.py's driver metric — this records the streaming story
(VERDICT r5 Next #1): events/sec, state rows (dedup keys + group keys),
and the RocksDB-vs-heap delta.  Run:  python bench_streaming.py
"""

import json
import os
import shutil
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_FILES = 8  # micro-batches: one file per trigger


def _parse_sf(sf_dir: str):
    """Scale factor from an `...sf<scale>` dir name; None for paths
    that don't follow the convention (advisor r6: don't crash the
    whole bench over a label)."""
    tail = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        return float(tail)
    except ValueError:
        return None


def main() -> None:
    from pyspark.sql import SparkSession

    from pincette_mongo_streams_spark import Context
    from pincette_mongo_streams_spark.streaming.runtime import run_streaming

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_events = events.count()
    work = tempfile.mkdtemp(prefix="bench_stream_")
    in_dir = os.path.join(work, "in")
    # replay corpus: N_FILES parquet files -> N_FILES micro-batches
    events.repartition(N_FILES).write.mode("overwrite").parquet(in_dir)
    schema = events.schema

    pipeline = [
        {"$deduplicate": "$event_id"},
        {"$group": {"_id": "$user_id",
                    "n": {"$count": {}},
                    "sum_v": {"$sum": "$value"}}},
    ]

    configs = {
        "hdfs": (pipeline, {"state_store": "hdfs"}),
        "rocksdb": (pipeline, {"state_store": "rocksdb"}),
        # SAME pipeline under the reference-parity emission protocol:
        # one emission per state-CHANGING message ($deduplicate is a
        # plan stage and chains into applyInPandasWithState)
        "per_message_rocksdb": (pipeline,
                                {"state_store": "rocksdb",
                                 "emission": "per_message"}),
        # r7: same protocol with state partitions sized to the per-batch
        # volume instead of the CPU count — isolates the per-partition
        # state-commit overhead that floors the row above (each stateful
        # op commits one store instance per partition per micro-batch)
        "per_message_rocksdb_p8": (pipeline,
                                   {"state_store": "rocksdb",
                                    "emission": "per_message",
                                    "state_partitions": 8}),
    }
    results = {}
    for name, (pipe, kw) in configs.items():
        ckpt = os.path.join(work, f"ckpt_{name}")
        source = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(in_dir))
        emitted = [0]

        def sink(batch_df, epoch):
            emitted[0] += batch_df.count()

        t0 = time.perf_counter()
        q = run_streaming(
            source, pipe, Context(spark=spark), sink,
            trigger={"availableNow": True}, checkpoint=ckpt, **kw,
        )
        finished = q.awaitTermination(600)
        if not finished:  # timed-out partial run = meaningless numbers
            q.stop()
            raise RuntimeError(
                f"streaming bench ({name}) did not finish in 600s")
        dt = time.perf_counter() - t0
        q.restore_state_store_conf()  # no conf bleed between configs
        prog = q.lastProgress or {}
        state = (prog.get("stateOperators") or [])
        results[name] = {
            "sec": round(dt, 3),
            "events_per_sec": round(n_events / dt, 1),
            "emitted_rows": emitted[0],
            "state_rows": sum(s.get("numRowsTotal", 0) for s in state),
        }

    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({
        "metric": "streaming_events_per_sec",
        "value": results["hdfs"]["events_per_sec"],
        "unit": "events/sec",
        "providers": results,
        "events": n_events,
        "batches": N_FILES,
        "sf": _parse_sf(SF_DIR),
        "loadavg": list(os.getloadavg()),
    }))


if __name__ == "__main__":
    sys.exit(main())
