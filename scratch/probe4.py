import duckdb
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions","8")
    .config("spark.sql.session.timeZone","UTC")
    .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

# 1. shiftleft by column in Spark SQL expr
try:
    r = spark.range(5).select(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(id AS INT))").alias("s")).collect()
    print("shiftleft-by-col:", [x.s for x in r])
except Exception as e:
    print("shiftleft FAIL:", str(e)[:120])
# duckdb shift
print("duckdb shift:", duckdb.sql("SELECT (1::BIGINT << x) FROM (VALUES (0),(3),(59)) t(x)").fetchall())

# 2. duckdb lambda in list_transform/list_filter
for q in ["SELECT list_transform([1,2,3], x -> x*2)",
          "SELECT list_filter(['a','the','b'], x -> list_contains(['the','a'], x))",
          "SELECT list_transform(range(1,4), i -> i*10)"]:
    try: print("lambda:", duckdb.sql(q).fetchone())
    except Exception as e: print("lambda FAIL:", q, str(e)[:100])

# 3. bit_count + xor parity
s = spark.range(1).select(F.bit_count(F.lit(0xF0F).cast("long")).alias("b"),
                          F.lit(12).cast("long").bitwiseXOR(F.lit(10)).alias("x")).collect()
print("spark bits:", s)
print("duckdb bits:", duckdb.sql("SELECT bit_count(3855::BIGINT), xor(12::BIGINT, 10::BIGINT)").fetchone())

# 4. hex casing on substring of blob
s = spark.range(1).select(F.hex(F.substring(F.encode(F.lit("hello"), "UTF-8"), 1, 3)).alias("h"),
                          F.md5(F.encode(F.lit("hello"), "UTF-8")).alias("m")).collect()
print("spark hex/md5(blob):", s)
for q in ["SELECT hex(substring(encode('hello'),1,3)), md5(encode('hello'))",
          "SELECT hex(encode('hello')[1:3])"]:
    try: print("duckdb:", duckdb.sql(q).fetchone())
    except Exception as e: print("duckdb FAIL:", q, "|", str(e)[:100])

# 5. cosine distribution on embeddings (find thresholds)
print(duckdb.sql("""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM '/root/testdata/sf0.01/embeddings.parquet'),
p AS (SELECT a.vec_id ia, b.vec_id ib, a.label la, b.label lb,
        list_dot_product(a.v,b.v)/(sqrt(list_dot_product(a.v,a.v))*sqrt(list_dot_product(b.v,b.v))) c
      FROM e a, e b WHERE a.vec_id < b.vec_id)
SELECT CASE WHEN la=lb THEN 'same' ELSE 'diff' END grp, min(c), max(c), avg(c),
       quantile_cont(c, 0.99) q99, count(*) FILTER (c >= 0.9) n90, count(*) FILTER (c >= 0.8) n80
FROM p GROUP BY 1
""").fetchall())
print("labels:", duckdb.sql("SELECT label, count(*) FROM '/root/testdata/sf0.01/embeddings.parquet' GROUP BY 1 ORDER BY 1").fetchall())

# 6. documents shingle overlap for jaccard threshold
print(duckdb.sql("""
WITH d AS (SELECT doc_id, string_split(text, ' ') w FROM '/root/testdata/sf0.01/documents.parquet'),
sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w)-1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) s FROM d),
cnt AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
pairs AS (SELECT a.doc_id ia, b.doc_id ib, count(*) inter FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1,2)
SELECT max(inter*1.0/(ca.n+cb.n-inter)) maxj, quantile_cont(inter*1.0/(ca.n+cb.n-inter), 0.999) q999, count(*)
FROM pairs JOIN cnt ca ON ia=ca.doc_id JOIN cnt cb ON ib=cb.doc_id
""").fetchall())
spark.stop()
