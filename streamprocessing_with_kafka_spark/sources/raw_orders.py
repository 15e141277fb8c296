"""Deterministic raw-order message stream derived from the `orders` table.

The reference's native input is a schemaless JSON order message with five
required fields (reference: src/app/order_validator.py:39-45) and every
interesting malformation class (missing fields, non-numeric / negative
numerics, epoch-days dates, missing date -- FIXTURES.md §1). The driver's
testdata has no such messy table, so we derive one *deterministically* from
`orders` using modular classes on `o_orderkey`; the identical derivation is
expressed in ANSI SQL for the DuckDB oracle, which is what makes the whole
reference pipeline hash-checkable.

Row classes (first matching CASE wins within a column):
  o_orderkey % 13 == 0 -> order_id missing        (key defaults to 'unknown')
  o_orderkey % 17 == 0 -> product_name missing
  o_orderkey %  7 == 0 -> quantity non-numeric    ('abc')
  o_orderkey % 11 == 0 -> quantity negative       ('-5')
  o_orderkey % 19 == 0 -> price non-numeric       ('xyz')
  o_orderkey % 23 == 0 -> price negative          ('-42')
  o_orderkey % 29 == 0 -> order_date missing      (reference poison pill ST4)
  o_orderkey %  5 == 0 -> order_date as epoch-days digit string (T7 path)
Overlaps (e.g. 7*19=133) produce multi-error rows exercising the '; '
message accumulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from streamprocessing_with_kafka_spark.sources.tables import load_table


def raw_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        F.when(k % 13 == 0, F.lit(None).cast("string"))
        .otherwise(k.cast("string"))
        .alias("order_id"),
        F.when(k % 17 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("Product "), F.col("o_orderpriority")))
        .alias("product_name"),
        F.when(k % 7 == 0, F.lit("abc"))
        .when(k % 11 == 0, F.lit("-5"))
        .otherwise((k % 50 + 1).cast("string"))
        .alias("quantity"),
        F.when(k % 19 == 0, F.lit("xyz"))
        .when(k % 23 == 0, F.lit("-42"))
        .otherwise((k % 1900 + 100).cast("string"))
        .alias("price"),
        F.when(k % 29 == 0, F.lit(None).cast("string"))
        .when(
            k % 5 == 0,
            F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")).cast(
                "string"
            ),
        )
        .otherwise(F.date_format("o_orderdate", "yyyy-MM-dd"))
        .alias("order_date"),
    )


# ANSI-SQL twin of raw_orders() for the DuckDB oracle. Kept adjacent so the
# two stay in lockstep; every oracle query over the message stream starts
# from this CTE.
RAW_ORDERS_SQL = """
SELECT
  CASE WHEN o_orderkey % 13 = 0 THEN NULL
       ELSE CAST(o_orderkey AS VARCHAR) END AS order_id,
  CASE WHEN o_orderkey % 17 = 0 THEN NULL
       ELSE 'Product ' || o_orderpriority END AS product_name,
  CASE WHEN o_orderkey % 7 = 0 THEN 'abc'
       WHEN o_orderkey % 11 = 0 THEN '-5'
       ELSE CAST(o_orderkey % 50 + 1 AS VARCHAR) END AS quantity,
  CASE WHEN o_orderkey % 19 = 0 THEN 'xyz'
       WHEN o_orderkey % 23 = 0 THEN '-42'
       ELSE CAST(o_orderkey % 1900 + 100 AS VARCHAR) END AS price,
  CASE WHEN o_orderkey % 29 = 0 THEN NULL
       WHEN o_orderkey % 5 = 0
         THEN CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS VARCHAR)
       ELSE strftime(o_orderdate, '%Y-%m-%d') END AS order_date
FROM orders
"""
