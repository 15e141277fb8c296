"""Cross-engine determinism probes: Spark vs DuckDB."""
import duckdb
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

sf = "/root/testdata/sf0.001"

# 1. timestamp formatting parity
s = spark.read.parquet(f"{sf}/orders.parquet").select(
    "o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("d")
).orderBy("o_orderkey").limit(5).collect()
d = duckdb.sql(f"SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') d FROM '{sf}/orders.parquet' ORDER BY o_orderkey LIMIT 5").fetchall()
print("TS spark :", [(r.o_orderkey, r.d) for r in s])
print("TS duckdb:", d)

# 2. md5 parity + hex->bigint in duckdb
s = spark.createDataFrame([("hello world",)], ["t"]).select(
    F.md5("t").alias("h"),
    F.conv(F.substring(F.md5("t"), 1, 15), 16, 10).cast("bigint").alias("hi")).collect()
print("MD5 spark :", s)
for expr in ["md5('hello world')",
             "CAST(('0x' || substr(md5('hello world'),1,15)) AS BIGINT)",
             ]:
    try:
        print("duckdb", expr, "=>", duckdb.sql(f"SELECT {expr}").fetchone())
    except Exception as e:
        print("duckdb", expr, "ERR", type(e).__name__, str(e)[:100])

# 3. decimal sum -> double parity
s = spark.read.parquet(f"{sf}/lineitem.parquet").agg(
    F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double").alias("s")).collect()[0].s
d = duckdb.sql(f"SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) FROM '{sf}/lineitem.parquet'").fetchone()[0]
print("DECSUM spark", repr(s), "duckdb", repr(d), "equal:", s == d)

# raw double sum (probably nondeterministic order; check anyway)
s2 = spark.read.parquet(f"{sf}/lineitem.parquet").agg(F.sum("l_extendedprice").alias("s")).collect()[0].s
d2 = duckdb.sql(f"SELECT SUM(l_extendedprice) FROM '{sf}/lineitem.parquet'").fetchone()[0]
print("DBLSUM spark", repr(s2), "duckdb", repr(d2), "equal:", s2 == d2)

# 4. cosine: spark aggregate/zip_with vs duckdb list_dot_product
emb = spark.read.parquet(f"{sf}/embeddings.parquet")
pair = emb.alias("a").crossJoin(emb.alias("b")).filter("a.vec_id=1 AND b.vec_id=2")
dot = F.aggregate(F.zip_with(F.col("a.embedding"), F.col("b.embedding"),
        lambda x, y: x.cast("double") * y.cast("double")), F.lit(0.0), lambda acc, v: acc + v)
s = pair.select(dot.alias("dot")).collect()[0].dot
for expr in [f"SELECT list_dot_product(a.embedding, b.embedding) FROM '{sf}/embeddings.parquet' a, '{sf}/embeddings.parquet' b WHERE a.vec_id=1 AND b.vec_id=2",
             f"SELECT list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) FROM '{sf}/embeddings.parquet' a, '{sf}/embeddings.parquet' b WHERE a.vec_id=1 AND b.vec_id=2"]:
    try:
        d = duckdb.sql(expr).fetchone()[0]
        print("DOT spark", repr(s), "duckdb", repr(d), "equal:", s == d)
    except Exception as e:
        print("DOT ERR", str(e)[:120])

# 5. double->varchar formatting
s = spark.createDataFrame([(1.5, 400.0, 123.45)], ["a","b","c"]).select(
    F.col("a").cast("string"), F.col("b").cast("string"), F.col("c").cast("string")).collect()
print("D2S spark :", s)
print("D2S duckdb:", duckdb.sql("SELECT CAST(1.5E0 AS VARCHAR), CAST(400.0E0 AS VARCHAR), CAST(123.45E0 AS VARCHAR)").fetchone())

# 6. round() half-cases
s = spark.createDataFrame([(2.675,),(2.5,),(-2.5,)], ["x"]).select(F.round("x", 2).alias("r2"), F.round("x", 0).alias("r0")).collect()
print("ROUND spark :", s)
print("ROUND duckdb:", duckdb.sql("SELECT round(x,2), round(x,0) FROM (VALUES (2.675E0),(2.5E0),(-2.5E0)) t(x)").fetchall())

# 7. time_bucket vs window
s = spark.read.parquet(f"{sf}/events.parquet").select(
    F.window("ts", "10 minutes").start.alias("ws")).orderBy("ws").limit(3).collect()
d = duckdb.sql(f"SELECT time_bucket(INTERVAL '10 minutes', ts) ws FROM '{sf}/events.parquet' ORDER BY ws LIMIT 3").fetchall()
print("WIN spark :", [r.ws for r in s])
print("WIN duckdb:", d)
spark.stop()
