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

# Optional full JIT warm lap at sf0.001 (WARM_LAP=1): the r11 mover
# adjudication showed the FIRST queries of a sorted pass pay the fresh
# session's C2/codegen cold-start (agg_abc_parts read ~6-11 s cold vs
# 1.8 s deep-warm). Default OFF so totals stay comparable to the
# r7-r11 protocol; flip it on if a round re-baselines the composite.
if os.environ.get("WARM_LAP") == "1":
    for _name, _q in sorted(registry().items()):
        try:
            _q.fn(spark, "/root/testdata/sf0.001").collect()
        except Exception:
            pass

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
