"""Bucketed co-located joins: pre-shuffle big tables ONCE at write time so
every subsequent join/aggregation on the bucket key runs with ZERO
exchanges.

This is the core 100 TB technique the rest of the engine's ad-hoc queries
cannot show: a fact-to-fact join (orders |X| lineitem) cannot broadcast
either side, so the naive plan shuffles BOTH tables on every query. With
both tables bucketed by the join key into the same bucket count, Spark's
scan exposes a HashPartitioning that already satisfies the join's
distribution requirement -- the physical plan is SortMergeJoin over two
bucketed scans with NO Exchange (asserted by tests/test_bucketing.py).
Amortization: one shuffle at ingest time serves every downstream join,
instead of one shuffle per query per table.

Bucketed tables need the session catalog (`saveAsTable`); bucket metadata
lives in the metastore, so plain parquet paths cannot carry it. Bucket
count here is sized for the local fixtures -- on a cluster, pick
buckets ~= total cores x small multiple and keep it EQUAL across tables
joined together (unequal counts fall back to a shuffle on one side).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, functions as F

from streamprocessing_with_kafka_spark.functions.numeric import dec_sum, dec_sum_sql
from streamprocessing_with_kafka_spark.sources.tables import load_table

N_BUCKETS = 8


def _tag(sf_dir: str) -> str:
    return re.sub(r"[^A-Za-z0-9]+", "_", sf_dir.strip("/")).lower()


def ensure_bucketed_tables(spark: SparkSession, sf_dir: str) -> None:
    """Materialize bucketed copies of orders + lineitem keyed by the join
    key (idempotent per session/warehouse): the one-time ingest shuffle."""
    import shutil
    from urllib.parse import urlparse

    tag = _tag(sf_dir)
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        table = f"bkt_{name}_{tag}"
        if not spark.catalog.tableExists(table):
            # a managed-table location can survive from a previous
            # session's warehouse while the in-memory catalog starts
            # empty; saveAsTable refuses to reuse it, so clear it first
            shutil.rmtree(f"{warehouse}/{table}", ignore_errors=True)
            (
                load_table(spark, sf_dir, name)
                .write.bucketBy(N_BUCKETS, key)
                .sortBy(key)
                .mode("overwrite")
                .saveAsTable(table)
            )


def bucketed_order_lineitem_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact join + aggregate on the bucket key, exchange-free:
    revenue and line count per order priority for open orders."""
    ensure_bucketed_tables(spark, sf_dir)
    tag = _tag(sf_dir)
    o = spark.table(f"bkt_orders_{tag}")
    li = spark.table(f"bkt_lineitem_{tag}")
    return (
        o.filter(F.col("o_orderstatus") == "O")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


BUCKETED_JOIN_SQL = f"""
SELECT o_orderpriority,
  {dec_sum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
  COUNT(*) AS n_lines
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderstatus = 'O'
GROUP BY o_orderpriority
"""
