"""CSV ingestion surface (format widening beside the JSON twin, S3/S4).

Null-safe CSV deserialize with the same contract as json_source: corrupt
input yields NULLs plus a corruption flag, it never throws -- one poison
line in a 100 TB load must route to the dead-letter side, not kill the
job. Parsing is Spark's native `from_csv` (JVM-side univocity parser,
PERMISSIVE + columnNameOfCorruptRecord), so the hot path stays in
whole-stage codegen; the file-based `spark.read.csv` path shares the
parser and is pinned equivalent in tests/test_csv_source.py.

Corrupt-record classes (deterministic modular classes on o_orderkey, the
FIXTURES.md pattern):
  k % 31 == 0 -> unterminated quote (syntactic: parser flags the line)
  k % 13 == 0 -> short row, 2 of 5 fields (syntactic: parser flags it)
  k %  7 == 0 -> quantity 'abc' (SEMANTIC: parses as a string fine; only
                 the typed try_cast nulls it -- is_corrupt stays false,
                 the validation layer owns it, mirroring the reference's
                 parse-vs-validate split)

Observed PERMISSIVE semantics (pinned by the oracle + tests):
  - unterminated quote: first field swallows the quote-stripped remainder,
    other fields NULL, corrupt column = raw line
  - short row: parsed prefix kept, missing fields NULL, corrupt set
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from streamprocessing_with_kafka_spark.sources.tables import load_table

CSV_FIELDS = (
    "order_id STRING, product_name STRING, quantity STRING, "
    "price STRING, order_date STRING"
)
_CORRUPT = "_corrupt_record"
CSV_OPTIONS = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT}


def csv_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(raw_key, line): deterministic CSV order lines derived from
    `orders`, with the corrupt classes above."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    # NULL source fields serialize as EMPTY CSV fields (standard CSV
    # NULL encoding, parsed back to NULL). The bare concat_ws form
    # SKIPPED a NULL component -- silently collapsing the column count
    # and shifting every later field -- and the short-class concat
    # NULLED the whole line (r9 mixed-nulls sweep).
    good = F.concat_ws(
        ",",
        F.coalesce(k.cast("string"), F.lit("")),
        F.coalesce(
            F.concat(F.lit("Product "), F.col("o_orderpriority")), F.lit("")
        ),
        F.coalesce(
            F.when(k % 7 == 0, F.lit("abc")).otherwise(
                (k % 50 + 1).cast("string")
            ),
            F.lit(""),
        ),
        F.coalesce((k % 1900 + 100).cast("string"), F.lit("")),
        F.coalesce(F.date_format("o_orderdate", "yyyy-MM-dd"), F.lit("")),
    )
    line = (
        F.when(k % 31 == 0, F.lit('"broken'))
        .when(
            k % 13 == 0,
            F.concat(
                k.cast("string"),
                F.coalesce(
                    F.concat(F.lit(",Product "), F.col("o_orderpriority")),
                    F.lit(","),
                ),
            ),
        )
        .otherwise(good)
    )
    return o.select(k.alias("raw_key"), line.alias("line"))


def csv_parse_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 (CSV flavor): null-safe parse + typed coercion + corruption flag."""
    parsed = csv_lines(spark, sf_dir).select(
        "raw_key",
        F.from_csv("line", f"{CSV_FIELDS}, {_CORRUPT} STRING", CSV_OPTIONS).alias("p"),
    )
    return parsed.select(
        "raw_key",
        F.col("p.order_id").alias("order_id"),
        F.col("p.product_name").alias("product_name"),
        F.col("p.quantity").try_cast("double").alias("quantity"),
        F.col("p.price").try_cast("double").alias("price"),
        F.col("p.order_date").alias("order_date"),
        F.col(f"p.{_CORRUPT}").isNotNull().alias("is_corrupt"),
    )


# the oracle mirrors the parser's observed PERMISSIVE outcomes per class
# (the same semantic-mirror pattern as JSON_PARSE_ORDERS_SQL's json_valid)
CSV_PARSE_ORDERS_SQL = """
WITH c AS (
  SELECT o_orderkey AS raw_key,
    CASE WHEN o_orderkey % 31 = 0 THEN 1
         WHEN o_orderkey % 13 = 0 THEN 2
         ELSE 0 END AS cls,
    CAST(o_orderkey AS VARCHAR) AS k_str,
    'Product ' || o_orderpriority AS pname,
    CASE WHEN o_orderkey % 7 = 0 THEN 'abc'
         ELSE CAST(o_orderkey % 50 + 1 AS VARCHAR) END AS qty_str,
    CAST(o_orderkey % 1900 + 100 AS VARCHAR) AS price_str,
    strftime(o_orderdate, '%Y-%m-%d') AS date_str
  FROM orders
)
SELECT raw_key,
  CASE WHEN cls = 1 THEN 'broken' ELSE k_str END AS order_id,
  CASE WHEN cls = 1 THEN NULL ELSE pname END AS product_name,
  TRY_CAST(CASE WHEN cls = 0 THEN qty_str END AS DOUBLE) AS quantity,
  TRY_CAST(CASE WHEN cls = 0 THEN price_str END AS DOUBLE) AS price,
  CASE WHEN cls = 0 THEN date_str END AS order_date,
  cls != 0 AS is_corrupt
FROM c
"""
