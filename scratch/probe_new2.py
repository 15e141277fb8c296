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
for name in ["text_pii_scrub", "text_chunk"]:
    t0 = time.time()
    sdf = qs[name](spark, sf)
    errs = compare(sdf, con, osql[name], name)
    print(("OK " if not errs else "FAIL"), name, f"({time.time()-t0:.1f}s)")
    for e in errs: print("   ", e)
