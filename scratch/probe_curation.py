import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "8").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E
from tests.oracle_harness import compare, duckdb_conn
sf = "/root/testdata/sf0.01"
con = duckdb_conn(sf)
qs, osql = E.queries(), E.oracle_sql()
t0 = time.time()
try:
    df = qs["text_curation_pipeline"](spark, sf)
    errs = compare(df, con, osql["text_curation_pipeline"], "curation")
    print(("OK " if not errs else "FAIL"), f"rows={df.count()} ({time.time()-t0:.1f}s)")
    for e in errs: print("   ", e[:500])
    # plan check: one scan, shuffle count
    plan = df._jdf.queryExecution().explainString(spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    import re
    print("scans:", plan.count("Scan parquet"), "shuffles:", len(re.findall(r"Exchange (?:hash|range|Single)", plan)), "wgl:", plan.count("WindowGroupLimit"))
except Exception as ex:
    print("ERR", type(ex).__name__, str(ex)[:400])
