"""Targeted oracle parity: named queries vs their oracle SQL at the
given SFs (default all three). Bare session, same compare as the driver.
Usage: python scratch/r13/check_subset.py q1 q2 ... [--sfs 0.001,0.01,0.1]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession  # noqa: E402

args = sys.argv[1:]
sfs = ["0.001", "0.01", "0.1"]
if "--sfs" in args:
    i = args.index("--sfs")
    sfs = args[i + 1].split(",")
    args = args[:i] + args[i + 2:]

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E  # noqa: E402
from streamprocessing_with_kafka_spark.functions.lineage import (  # noqa: E402
    drain_ephemeral_checkpoints,
)
from tests.oracle_harness import compare, duckdb_conn  # noqa: E402

qs, osql = E.queries(), E.oracle_sql()
fails = 0
for sf_tag in sfs:
    sf = f"/root/testdata/sf{sf_tag}"
    con = duckdb_conn(sf)
    for name in args:
        t0 = time.time()
        errs = compare(qs[name](spark, sf), con, osql[name], name)
        fails += bool(errs)
        print(
            f"  {'OK ' if not errs else 'FAIL'} sf{sf_tag} {name}"
            f" ({time.time()-t0:.1f}s)"
            + ("\n    " + "\n    ".join(errs) if errs else ""),
            flush=True,
        )
        drain_ephemeral_checkpoints()
print("ALL PASS" if not fails else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
