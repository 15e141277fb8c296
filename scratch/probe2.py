import duckdb
from pyspark.sql import SparkSession, functions as F

# nanos lossless at micro precision?
print(duckdb.sql("SELECT count(*) FROM '/root/testdata/sf0.01/events.parquet' WHERE epoch_ns(ts) % 1000 != 0").fetchone())

spark = (SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.001"
ev = spark.read.parquet(f"{sf}/events.parquet")
ev.printSchema()
ev2 = ev.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
s = ev2.select(F.window("ts", "10 minutes").start.alias("ws"), "event_id").orderBy("event_id").limit(3).collect()
print("spark :", [(r.event_id, str(r.ws)) for r in s])
d = duckdb.sql(f"SELECT event_id, CAST(time_bucket(INTERVAL '10 minutes', ts) AS TIMESTAMP) ws FROM '{sf}/events.parquet' ORDER BY event_id LIMIT 3").fetchall()
print("duckdb:", [(r[0], str(r[1])) for r in d])

# session_window + lag-based SQL equivalence check later; check props JSON extraction parity
s = ev2.select("event_id", F.get_json_object("props", "$.k").cast("int").alias("k")).orderBy("event_id").limit(3).collect()
d = duckdb.sql(f"SELECT event_id, CAST(json_extract_string(props,'$.k') AS INT) k FROM '{sf}/events.parquet' ORDER BY event_id LIMIT 3").fetchall()
print("json spark :", [(r.event_id, r.k) for r in s])
print("json duckdb:", d)

# read_json_auto availability for file fixtures
try:
    print(duckdb.sql("SELECT 1 WHERE EXISTS (SELECT * FROM duckdb_functions() WHERE function_name='read_json_auto')").fetchall())
except Exception as e:
    print("ERR", e)
spark.stop()
