"""Noop-sink timing sweep over ALL registered queries (default sf0.1) —
the guide-§1 measure-everything pass that surfaced every r13 non-headline
defect.  Usage: python tools/time_sweep.py   (writes /tmp/time_sweep.json)
Host caveat: re-measure outliers isolated (neighbor-load spikes)."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# ADVICE r13: derive core count / driver memory like bench.py instead of
# hard-coding local[32]/48g — on smaller hosts the sweep session would
# oversubscribe or fail to launch, skewing the timings it exists to take
CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
MEM = os.environ.get("SPARK_GRAFT_MEM", "48g")
from pyspark.sql import SparkSession
import bench
spark = (SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", str(bench._derived_shuffle_partitions()))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    .config("spark.sql.files.openCostInBytes", str(bench._derived_open_cost()))
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", MEM)
    .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E
Q = E.queries()
# warmup
Q["match_basic"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
out = {}  # noqa
for name, fn in Q.items():
    spark.sparkContext.setJobDescription(f"sweep:{name}")
    t0 = time.time()
    try:
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 3)
    except Exception as e:
        out[name] = f"ERR {type(e).__name__}: {str(e)[:120]}"
    print(f"{name}\t{out[name]}", flush=True)
with open("/tmp/time_sweep.json", "w") as f:
    json.dump(out, f, indent=1)
