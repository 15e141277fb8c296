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
errs = compare(qs["join_salted_skew"](spark, sf), con, osql["join_salted_skew"], "join_salted_skew")
print(("OK " if not errs else "FAIL"), f"({time.time()-t0:.1f}s)")
for e in errs: print("   ", e[:400])
