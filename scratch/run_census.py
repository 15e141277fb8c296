"""Full-registry wall-time census at sf0.1: one pass per query in ONE
warm session (the r7 protocol -- single-pass numbers are noisy; treat
isolated probes as the signal for any apparent mover).

Usage: python scratch/run_census.py out.json   [SF_DIR=...]
"""
import json
import os
import sys
import time

sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
out_path = sys.argv[1] if len(sys.argv) > 1 else "scratch/census.json"

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)

from streamprocessing_with_kafka_spark.session import get_spark  # noqa: E402
from streamprocessing_with_kafka_spark.plans.registry import registry  # noqa: E402

spark = get_spark("census")
spark.sparkContext.setLogLevel("ERROR")
spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()  # warm

times: dict[str, float] = {}
t_all = time.time()
# FIXED sorted order, not registry order: the registry head is the
# driver's correctness window, which is re-pinned every round -- in r9
# the re-pin reordered which heavy queries precede which, and the
# shared-session GC/heap bleed made census totals incomparable to r8's
# (mm_decode census-min 4.2 s vs isolated 0.53 s). Sorted order is
# stable across window re-pins, so cross-round census totals compare.
for name, q in sorted(registry().items()):
    t0 = time.time()
    try:
        q.fn(spark, sf_dir).collect()
        times[name] = round(time.time() - t0, 3)
    except Exception as e:  # record, keep sweeping
        times[name] = -1.0
        print(f"ERROR {name}: {e}", file=sys.stderr)

with open(out_path, "w") as f:
    json.dump(times, f, indent=1, sort_keys=False)
ok = [v for v in times.values() if v >= 0]
print(
    json.dumps(
        {
            "queries": len(times),
            "errors": len(times) - len(ok),
            "total_sec": round(sum(ok), 1),
            "median_sec": round(sorted(ok)[len(ok) // 2], 3) if ok else None,
            "load_at_finish": list(os.getloadavg()),
        }
    )
)
