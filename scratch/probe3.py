from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
# can we set it at runtime?
try:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    print("runtime set OK, rows:", df.count())
except Exception as e:
    print("runtime set FAILED:", str(e)[:200])
try:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    print("tz set OK")
except Exception as e:
    print("tz FAILED", e)
spark.stop()
