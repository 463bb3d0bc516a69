"""Focused per-query bench: N timed runs of selected headline queries
through the noop sink, bench-identical session config, plus a job-count
audit via the status tracker.

Usage: python tools/qbench.py [-n RUNS] [name ...]   (default: all 16, n=5)

Prints one line per query: name, per-run seconds, min, median, jobs.
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
EXTRA_CONF = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")

HEADLINE = [
    "match_basic", "project_compute", "group_accumulators", "group_addtoset",
    "bucket", "lookup_array_size", "lookup_pipeline", "deduplicate",
    "expr_math", "fingerprint", "token_count", "minhash_signature",
    "simhash", "ann_topk", "dedup_exact", "bm25_search",
]


def main() -> None:
    args = sys.argv[1:]
    n = 5
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    names = args or HEADLINE

    from pyspark.sql import SparkSession

    import bench

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions",
                str(bench._derived_shuffle_partitions()))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.sql.files.openCostInBytes",
                str(bench._derived_open_cost()))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .config("spark.ui.enabled", "false")
    )
    for kv in filter(None, EXTRA_CONF.split(";")):
        k, _, v = kv.partition("=")
        spark = spark.config(k.strip(), v.strip())
    spark = spark.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # warmup (JIT + page cache), 2 passes over the selected set
    for _ in range(2):
        for name in names:
            qs[name](spark, SF_DIR).write.mode("overwrite") \
                .format("noop").save()

    out = {}
    for name in names:
        runs = []
        builds = []
        jobs = None
        for i in range(n):
            sc.setJobGroup(f"qb-{name}-{i}", name)
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 3))
            builds.append(round(t1 - t0, 3))
            jobs = len(tracker.getJobIdsForGroup(f"qb-{name}-{i}"))
            sc.setJobGroup(None, None)
        out[name] = {"runs": runs, "min": min(runs),
                     "median": round(statistics.median(runs), 3),
                     "build_min": min(builds), "jobs": jobs}
        print(f"{name:22s} min={min(runs):.3f} med={out[name]['median']:.3f} "
              f"build={min(builds):.3f} jobs={jobs} runs={runs}", flush=True)
    print(json.dumps({"queries": out,
                      "loadavg": [round(x, 2) for x in os.getloadavg()]}))
    spark.stop()


if __name__ == "__main__":
    main()
