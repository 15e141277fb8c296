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
    by row_number, since NULL eqNullSafe NULL would otherwise swallow it).

    NULL-TIMESTAMP observations are excluded up front: they cannot be
    placed on the validity timeline, and engine NULL ordering (Spark
    NULLS FIRST vs standard NULLS LAST on ASC) would otherwise slot
    them at opposite ends of each key's history, shifting every version
    number (r9 mixed-nulls sweep)."""
    w = W.partitionBy(key).orderBy(ts, tiebreak)
    prev = F.lag(attr).over(w)
    first = F.row_number().over(w) == 1
    changes = (
        obs.filter(F.col(ts).isNotNull())
        .select(key, ts, tiebreak, attr)
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
  FROM orders WHERE o_orderdate IS NOT NULL
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


# ----------------------------------------------------- snapshot diff (CDC)

#: deterministic two-snapshot derivation from the one documents table:
#:   previous snapshot = docs with doc_id % 23 != 0 (so % 23 == 0 docs are
#:     ADDED in current), with text suffixed ' v1' where doc_id % 29 == 0
#:     (those docs are CHANGED in current)
#:   current snapshot  = docs with doc_id % 31 != 0 (so % 31 == 0 docs are
#:     REMOVED from previous)
#: Production swaps these predicates for two real snapshot reads.
SNAP_ADD_MOD, SNAP_CHANGE_MOD, SNAP_REMOVE_MOD = 23, 29, 31


def snapshot_diff(prev: DataFrame, cur: DataFrame) -> DataFrame:
    """Corpus snapshot diff -- the CDC/data-versioning audit between two
    immutable snapshot reads: per doc_id, added / removed / changed /
    unchanged, decided by content fingerprint.

    Scale design: ONE full-outer equi join on doc_id of two narrow
    (doc_id, fingerprint) projections -- the md5 collapses arbitrary text
    to 32 bytes BEFORE the shuffle, so the exchange carries fingerprints,
    never documents. Both snapshots hash-partition on the same key; with
    bucketed snapshot storage the exchange disappears entirely. Anything
    smarter (sort-merge over snapshot manifests, Iceberg-style) changes
    the physical strategy, not this logical contract."""
    p = prev.select("doc_id", F.md5("text").alias("_pf"))
    c = cur.select("doc_id", F.md5("text").alias("_cf"))
    return (
        p.join(c, on="doc_id", how="full_outer")
        .select(
            "doc_id",
            F.when(F.col("_pf").isNull(), F.lit("added"))
            .when(F.col("_cf").isNull(), F.lit("removed"))
            .when(F.col("_pf") != F.col("_cf"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("status"),
        )
    )


def documents_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """snapshot_diff over the deterministic two-snapshot derivation."""
    d = load_table(spark, sf_dir, "documents")
    prev = d.filter(F.col("doc_id") % SNAP_ADD_MOD != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % SNAP_CHANGE_MOD == 0, F.concat("text", F.lit(" v1"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    cur = d.filter(F.col("doc_id") % SNAP_REMOVE_MOD != 0).select("doc_id", "text")
    return snapshot_diff(prev, cur)


SNAPSHOT_DIFF_SQL = f"""
WITH prev AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % {SNAP_CHANGE_MOD} = 0 THEN text || ' v1'
                  ELSE text END) AS pf
  FROM documents WHERE doc_id % {SNAP_ADD_MOD} != 0
),
cur AS (
  SELECT doc_id, md5(text) AS cf
  FROM documents WHERE doc_id % {SNAP_REMOVE_MOD} != 0
)
SELECT COALESCE(prev.doc_id, cur.doc_id) AS doc_id,
  CASE WHEN prev.pf IS NULL THEN 'added'
       WHEN cur.cf IS NULL THEN 'removed'
       WHEN prev.pf != cur.cf THEN 'changed'
       ELSE 'unchanged' END AS status
FROM prev FULL OUTER JOIN cur ON prev.doc_id = cur.doc_id
"""
