"""Dump .explain("formatted") for named queries (default: the 16 bench
headline queries) to plans/<outdir>/<name>_<tag>.txt.

Usage: python tools/plan_dump.py <tag> [outdir] [name ...]
  tag     e.g. "before" / "after"  (file suffix)
  outdir  e.g. "r13" (default)     (subdir of plans/)

Uses the bench-identical session config so plan shapes (AQE, shuffle
partitions, open cost) match what bench.py executes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
    "match_basic", "project_compute", "group_accumulators", "group_addtoset",
    "bucket", "lookup_array_size", "lookup_pipeline", "deduplicate",
    "expr_math", "fingerprint", "token_count", "minhash_signature",
    "simhash", "ann_topk", "dedup_exact", "bm25_search",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "r13"
    names = sys.argv[3:] or HEADLINE

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
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    dest = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", outdir)
    os.makedirs(dest, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(dest, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        ex = plan.count("Exchange")
        py = (plan.count("BatchEvalPython") + plan.count("ArrowEvalPython")
              + plan.count("MapInArrow") + plan.count("MapInPandas")
              + plan.count("FlatMapGroupsInPandas"))
        joins = [j for j in ("BroadcastHashJoin", "SortMergeJoin",
                             "ShuffledHashJoin", "BroadcastNestedLoopJoin",
                             "CartesianProduct") if j in plan]
        print(f"{name}: Exchange={ex} PyNodes={py} joins={joins} -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
