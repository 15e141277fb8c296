"""Dump explain("formatted") for named queries to plans/r13/<q>_<tag>.txt.
Usage: PLAN_TAG=before python scratch/r13/dump_plans.py q1 q2 ...
Compile-only (no execution); sf0.1 so plan shapes match the bench."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
from streamprocessing_with_kafka_spark.plans.registry import registry  # noqa: E402
from streamprocessing_with_kafka_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
tag = os.environ.get("PLAN_TAG", "before")
spark = get_spark("r13plandump")
spark.sparkContext.setLogLevel("ERROR")
for name in sys.argv[1:]:
    df = registry()[name].fn(spark, SF)
    p = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    out = f"plans/r13/{name}_{tag}.txt"
    with open(out, "w") as f:
        f.write(p)
    print(f"wrote {out} ({p.count('Exchange')} Exchange lines)")
spark.stop()
