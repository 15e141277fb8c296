"""Slowly-changing-dimension (Type 2) versioning -- the dimension-history
operator a warehouse sitting next to this engine needs (the reference's
JDBC sink only ever keeps the LATEST row per key via PK upsert,
`docs/kafka-connector-configurations.md:94-116`; SCD2 is the richer
contract that keeps every version with validity intervals).

The change source here is the `orders` stream read as a keyed attribute
feed: each order is an observation of its customer's current
`o_orderpriority`. SCD2 folds consecutive repeat observations away and
emits one row per VERSION with [valid_from, valid_to) intervals, a
monotone version number, and an is_current flag.

Scale notes: one hash partitioning on the dimension key carries the whole
operator -- the change-detection lag window and the interval lead/version
windows all share PARTITION BY o_custkey, so Catalyst plans a single
Exchange; the filter between them is partitioning-preserving (only a
re-sort, no second shuffle). State per key is bounded by the version
count, not the observation count, because the filter drops repeats before
the second window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from streamprocessing_with_kafka_spark.sources.tables import load_table


def scd2_versions(
    obs: DataFrame, key: str, attr: str, ts: str, tiebreak: str
) -> DataFrame:
    """Generic SCD2 fold: (key, ts, attr) observations -> versioned rows.

    Observation order within a key is (ts, tiebreak) -- the tiebreak makes
    same-timestamp observations deterministic. A version opens when the
    attribute differs from the previous observation's (or there is none),
    closes at the next version's valid_from (half-open interval), and the
    open version is flagged is_current.

    Change detection is NULL-safe: `eqNullSafe` treats NULL as a value, so
    value -> NULL and NULL -> value transitions open versions, and a key
    whose first observation is NULL still gets its opening version (flagged
    by row_number, since NULL eqNullSafe NULL would otherwise swallow it)."""
    w = W.partitionBy(key).orderBy(ts, tiebreak)
    prev = F.lag(attr).over(w)
    first = F.row_number().over(w) == 1
    changes = (
        obs.select(key, ts, tiebreak, attr)
        .withColumn("chg", first | ~prev.eqNullSafe(F.col(attr)))
        .filter("chg")
    )
    wv = W.partitionBy(key).orderBy(ts, tiebreak)
    nxt = F.lead(ts).over(wv)
    return changes.select(
        F.col(key),
        F.col(attr),
        F.col(ts).alias("valid_from"),
        nxt.alias("valid_to"),
        F.row_number().over(wv).alias("version"),
        nxt.isNull().alias("is_current"),
    )


def customer_priority_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-priority history as an SCD2 dimension."""
    o = load_table(spark, sf_dir, "orders")
    return scd2_versions(
        o, key="o_custkey", attr="o_orderpriority", ts="o_orderdate",
        tiebreak="o_orderkey",
    )


CUSTOMER_PRIORITY_SCD2_SQL = """
WITH flagged AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
    ROW_NUMBER() OVER w = 1
      OR lag(o_orderpriority) OVER w IS DISTINCT FROM o_orderpriority AS chg
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
)
SELECT o_custkey, o_orderpriority,
  o_orderdate AS valid_from,
  lead(o_orderdate) OVER wv AS valid_to,
  ROW_NUMBER() OVER wv AS version,
  lead(o_orderdate) OVER wv IS NULL AS is_current
FROM flagged WHERE chg
WINDOW wv AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""
