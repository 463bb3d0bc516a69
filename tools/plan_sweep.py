"""Build EVERY registered query's physical plan and summarize its shape:
shuffle-exchange count, broadcast count, python-eval nodes, join types,
cartesian products, scan count.  Plan-only (no execution).

Usage: python tools/plan_sweep.py [out.tsv]
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/plan_sweep.tsv"

    from pyspark.sql import SparkSession

    import bench

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions",
                str(bench._derived_shuffle_partitions()))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.sql.files.openCostInBytes",
                str(bench._derived_open_cost()))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    rows = []
    for name, fn in qs.items():
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
            shuf = len(re.findall(r"(?<!Broadcast)(?<!Reused)Exchange", plan))
            bc = plan.count("BroadcastExchange")
            py = sum(plan.count(k) for k in (
                "BatchEvalPython", "ArrowEvalPython", "MapInArrow",
                "MapInPandas", "FlatMapGroupsInPandas"))
            joins = ",".join(sorted({j for j in (
                "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
                "BroadcastNestedLoopJoin", "CartesianProduct") if j in plan}))
            scans = plan.count("Scan parquet") + plan.count("Scan ExistingRDD")
            rows.append((name, shuf, bc, py, scans, joins))
        except Exception as e:  # noqa: BLE001
            rows.append((name, -1, -1, -1, -1, f"ERR:{type(e).__name__}:{e}"[:120]))
    with open(out_path, "w") as f:
        f.write("name\tshuffles\tbroadcasts\tpynodes\tscans\tjoins\n")
        for r in rows:
            f.write("\t".join(str(x) for x in r) + "\n")
    err = [r for r in rows if r[1] == -1]
    print(f"wrote {len(rows)} rows to {out_path}; errors: {len(err)}")
    for r in err:
        print("  ", r[0], r[5])
    spark.stop()


if __name__ == "__main__":
    main()
