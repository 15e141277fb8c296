"""Headline relational analytics: aggregation, joins, windows, rollup, set
ops, top-k. The reference has none of these (SURVEY.md §2.6) -- its only
query is `SELECT * FROM enriched_orders` -- but this engine is the superset
surface a user migrating off it onto Spark gets, and these queries are the
bench workload.

Scale notes (each query's plan audited with .explain):
  - dimension joins (nation, customer, part) are explicit `broadcast()`:
    at 100 TB the fact side streams, no shuffle for the dim side.
  - aggregates use dec_sum (order-independent; still map-side partial agg).
  - top-k = window row_number with a deterministic tie-break, which Spark
    executes as partial top-k per partition before the single shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from streamprocessing_with_kafka_spark.functions.numeric import dec_sum, dec_sum_sql
from streamprocessing_with_kafka_spark.sources.tables import load_table


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            (dec_sum("l_quantity") / cnt.cast("double")).alias("avg_qty"),
            (dec_sum("l_extendedprice") / cnt.cast("double")).alias("avg_price"),
            (dec_sum("l_discount") / cnt.cast("double")).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = f"""
SELECT l_returnflag, l_linestatus,
  {dec_sum_sql('l_quantity')} AS sum_qty,
  {dec_sum_sql('l_extendedprice')} AS sum_base_price,
  {dec_sum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
  {dec_sum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
  {dec_sum_sql('l_quantity')} / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
  {dec_sum_sql('l_extendedprice')} / CAST(COUNT(*) AS DOUBLE) AS avg_price,
  {dec_sum_sql('l_discount')} / CAST(COUNT(*) AS DOUBLE) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders |X| customer |X| nation, revenue per nation; dims broadcast."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            dec_sum("o_totalprice").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


REVENUE_BY_NATION_SQL = f"""
SELECT n_name,
  {dec_sum_sql('o_totalprice')} AS revenue,
  COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def top_orders_per_customer(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Ranking window: top-k orders per customer, deterministic tie-break."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rank_in_cust", F.row_number().over(w))
        .filter(F.col("rank_in_cust") <= k)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank_in_cust")
    )


TOP_ORDERS_PER_CUSTOMER_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rank_in_cust
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank_in_cust
  FROM orders
)
WHERE rank_in_cust <= 3
"""


def order_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (status, priority): multi-level aggregate in one pass."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        dec_sum("o_totalprice").alias("total_revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


ORDER_ROLLUP_SQL = f"""
SELECT o_orderstatus, o_orderpriority,
  {dec_sum_sql('o_totalprice')} AS total_revenue,
  COUNT(*) AS n_orders
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def urgent_not_fulfilled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set ops: customers with urgent orders EXCEPT customers with
    fulfilled ('F') orders -- distinct semantics in both engines."""
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    fulfilled = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return urgent.subtract(fulfilled)  # EXCEPT DISTINCT semantics


URGENT_NOT_FULFILLED_SQL = """
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""


def top_parts_by_revenue(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Top-k fact-side aggregate joined to a broadcast dimension."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = li.groupBy("l_partkey").agg(
        dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )
    return (
        rev.join(F.broadcast(p), rev.l_partkey == p.p_partkey)
        .select("p_partkey", "p_name", "p_brand", "revenue")
        .orderBy(F.col("revenue").desc(), F.col("p_partkey").asc())
        .limit(k)
    )


TOP_PARTS_BY_REVENUE_SQL = f"""
SELECT p_partkey, p_name, p_brand, revenue
FROM (
  SELECT l_partkey, {dec_sum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
  FROM lineitem GROUP BY l_partkey
) r
JOIN part ON l_partkey = p_partkey
ORDER BY revenue DESC, p_partkey ASC
LIMIT 10
"""


SALT_BUCKETS = 8


def salted_revenue_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation: the skew-proof rewrite of a groupBy
    on a low-cardinality/hot key (o_orderstatus has 3 values, so a plain
    groupBy funnels the whole table through 3 reducers at 100 TB).

    Phase 1 groups on (key, salt) -- SALT_BUCKETS x the reducers, each a
    bounded slice of the hot key; phase 2 combines the per-salt partials.
    The salt is derived from the row's own PK (deterministic, not rand()),
    and the partial sums STAY decimal until the final cast so the result
    is bit-identical to the unsalted single-phase oracle -- salting is a
    pure physical rewrite, invisible in the answer.
    """
    o = load_table(spark, sf_dir, "orders")
    salted = o.withColumn("_salt", F.pmod(F.col("o_orderkey"), F.lit(SALT_BUCKETS)))
    partial = salted.groupBy("o_orderstatus", "_salt").agg(
        F.sum(F.col("o_totalprice").cast("decimal(28,10)")).alias("rev_part"),
        F.count(F.lit(1)).alias("n_part"),
    )
    return partial.groupBy("o_orderstatus").agg(
        F.sum("rev_part").cast("double").alias("revenue"),
        F.sum("n_part").alias("n_orders"),
    )


SALTED_REVENUE_BY_STATUS_SQL = f"""
SELECT o_orderstatus,
  {dec_sum_sql('o_totalprice')} AS revenue,
  COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
"""
