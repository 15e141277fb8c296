import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]").config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E
# probe 1: entry twice on one session (driver may re-invoke)
a = E.entry(spark).count(); b = E.entry(spark).count()
print("double entry:", a, b)
# probe 2: schema stability across runs
s1 = E.entry(spark).schema; s2 = E.entry(spark).schema
print("schema stable:", s1 == s2)
# probe 3: bad sf_dir error quality
try:
    E.queries()["crud_scan"](spark, "/root/testdata/sf9")
    print("bad dir: NO ERROR (lazy)")
except Exception as e:
    print("bad dir error:", type(e).__name__, str(e)[:90])
