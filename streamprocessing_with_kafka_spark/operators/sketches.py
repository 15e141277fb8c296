"""Approximate sketch operators over `events`: HyperLogLog distinct
counts and approximate quantiles.

These are the constant-memory summaries a 100 TB pipeline uses where an
exact answer would need a full shuffle of the key space:

  - `approx_distinct_users`: HLL++ (`approx_count_distinct`) -- a few KB
    of state per group regardless of cardinality, map-side combinable,
    one narrow aggregate instead of an expand-dedupe-count shuffle.
  - `approx_value_quantiles`: Greenwald-Khanna (`percentile_approx`) --
    mergeable per-partition summaries, no global sort.

No DuckDB oracle SQL: both engines implement DIFFERENT sketch algorithms
(DuckDB's approx_count_distinct is its own HLL variant), so hash equality
is impossible by construction -- the driver records a rows-only check,
and tests/test_sketches.py bounds the error against the exact answers
instead (the correct correctness statement for an approximate operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from streamprocessing_with_kafka_spark.sources.tables import load_table

RSD = 0.02  # requested relative standard deviation for HLL


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: approximate distinct users + exact event count."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=RSD).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


def approx_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: approximate p50/p95/p99 of `value`."""
    ev = load_table(spark, sf_dir, "events")
    q = F.percentile_approx("value", [0.5, 0.95, 0.99], 10_000)
    return ev.groupBy("event_type").agg(
        q.getItem(0).alias("p50"),
        q.getItem(1).alias("p95"),
        q.getItem(2).alias("p99"),
    )
