"""r13 optimization probe: settled-floor timings + formatted plans for
the 17 bench queries. Settled floor = min of N runs in ONE warm session
(the bench's min-of-3 after a cold start pays JIT/heap-growth transients;
the floor is the plan's actual cost). Usage:
  python scratch/r13/probe_bench.py [runs] [query ...]
Writes plans to plans/r13/<query>_<tag>.txt when PLAN_TAG is set.
"""
import json, os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
from streamprocessing_with_kafka_spark.plans.registry import registry  # noqa: E402
from streamprocessing_with_kafka_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 6
names = sys.argv[2:]
tag = os.environ.get("PLAN_TAG", "")

spark = get_spark("r13probe")
qs = {n: q for n, q in registry().items() if (n in names if names else q.bench)}

# one full warm lap at the probe SF so min-of-N sits on the floor
for n, q in sorted(qs.items()):
    q.fn(spark, SF).write.format("noop").mode("overwrite").save()

out = {}
for n, q in sorted(qs.items()):
    spark.sparkContext.setJobDescription(f"r13probe:{n}")
    best, runs = float("inf"), []
    for _ in range(RUNS):
        t0 = time.time()
        q.fn(spark, SF).write.format("noop").mode("overwrite").save()
        runs.append(round(time.time() - t0, 3))
        best = min(best, runs[-1])
    out[n] = best
    print(f"{n}: min={best:.3f} runs={runs}", flush=True)
    if tag:
        df = q.fn(spark, SF)
        p = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(f"plans/r13/{n}_{tag}.txt", "w") as f:
            f.write(p)
print(json.dumps({"floor_total": round(sum(out.values()), 3), "queries": out}))
spark.stop()
