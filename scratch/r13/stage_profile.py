"""r13 stage-level attribution probe: run one registered query with the
Spark UI enabled, then dump per-stage task counts / executor time /
shuffle bytes from the REST API -- the r12 protocol (§7.1 of the guide:
read the stage table, don't guess). Usage:
  python scratch/r13/stage_profile.py <query> [runs]
"""
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
from streamprocessing_with_kafka_spark.plans.registry import registry  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
name = sys.argv[1]
runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

from pyspark.sql import SparkSession  # noqa: E402
from streamprocessing_with_kafka_spark.session import (  # noqa: E402
    _RUNTIME_CONFS,
    ensure_runtime_confs,
)

cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
b = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("r13stageprofile")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.ui.enabled", "true")
    .config("spark.ui.port", "4050")
)
for k, v in _RUNTIME_CONFS.items():
    b = b.config(k, v)
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
ensure_runtime_confs(spark)

q = registry()[name]
# warm laps: sf0.001 then full volume
q.fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
q.fn(spark, SF).write.format("noop").mode("overwrite").save()

best, marker = float("inf"), None
for i in range(runs):
    spark.sparkContext.setJobDescription(f"r13profile:{name}:{i}")
    t0 = time.time()
    q.fn(spark, SF).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    if dt < best:
        best, marker = dt, f"r13profile:{name}:{i}"
    print(f"run {i}: {dt:.3f}s", flush=True)

app_id = spark.sparkContext.applicationId
base = f"http://localhost:4050/api/v1/applications/{app_id}"
jobs = json.load(urllib.request.urlopen(f"{base}/jobs"))
best_jobs = [j for j in jobs if j.get("description") == marker]
stage_ids = sorted({s for j in best_jobs for s in j["stageIds"]})
stages = json.load(urllib.request.urlopen(f"{base}/stages"))
by_id = {}
for s in stages:
    by_id.setdefault(s["stageId"], s)

print(f"\nbest run = {best:.3f}s  ({marker}); {len(best_jobs)} jobs, {len(stage_ids)} stages")
print(f"{'stage':>6} {'tasks':>6} {'exec_s':>8} {'cpu_s':>8} {'sh_read_MB':>10} {'sh_write_MB':>11} {'in_MB':>8}  first_submit->completion  name")
t_first = None
for sid in stage_ids:
    s = by_id.get(sid)
    if not s or s.get("status") == "SKIPPED":
        print(f"{sid:>6}  SKIPPED")
        continue
    sub = s.get("firstTaskLaunchedTime", "")
    comp = s.get("completionTime", "")
    print(
        f"{sid:>6} {s['numCompleteTasks']:>6} {s['executorRunTime']/1e3:>8.2f} "
        f"{s.get('executorCpuTime',0)/1e9:>8.2f} {s['shuffleReadBytes']/1e6:>10.1f} "
        f"{s['shuffleWriteBytes']/1e6:>11.1f} {s['inputBytes']/1e6:>8.1f}  "
        f"{sub[-12:]} -> {comp[-12:]}  {s['name'][:60]}"
    )
spark.stop()
