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


def kll_daily_value_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, sk, n): per-day KLL sketches of `value` -- the materialized
    summary table of the sketch-rollup pattern. Each sketch is ~KB
    regardless of row count, built in one map-side-combinable aggregate."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.kll_sketch_agg_double("value").alias("sk"),
        F.count(F.lit(1)).alias("n"),
    )


def value_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global p50/p95/p99 of `value` answered from MERGED per-day KLL
    sketches -- the mergeable-summary pattern that makes quantiles over
    arbitrary time ranges O(|days|) instead of a rescan of raw data.

    At 100 TB the daily sketch table IS the stored artifact (a few KB per
    day); any range query folds the covered days' sketches with the
    binary kll_sketch_merge (KLL merge is lossless w.r.t. its error
    bound: the merged sketch carries the SAME rank-error guarantee as one
    built over the concatenated data -- unlike merged GK/percentile_approx
    summaries, whose error degrades under merge). The fold runs over a
    collect_list of sketch blobs: summary-sized by construction, never
    row data."""
    daily = kll_daily_value_sketches(spark, sf_dir)
    merged = daily.agg(F.collect_list("sk").alias("sks")).select(
        F.aggregate(
            F.slice("sks", 2, 1 << 30),
            # try_element_at: an EMPTY sketch list (no events) must seed
            # the fold with NULL and yield null quantiles -- plain
            # element_at throws INVALID_ARRAY_INDEX under ANSI mode
            F.try_element_at("sks", F.lit(1)),
            lambda acc, x: F.kll_sketch_merge_double(acc, x),
        ).alias("sk"),
    )
    return merged.select(
        F.kll_sketch_get_quantile_double("sk", F.lit(0.5)).alias("p50"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.95)).alias("p95"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.99)).alias("p99"),
    )


def hll_daily_user_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, sk, n): per-day DataSketches HLL blobs of user_id -- the
    distinct-count side of the mergeable-summary pattern."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("n"),
    )


def distinct_users_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global distinct users answered by UNIONING per-day HLL sketches
    (hll_union_agg is a true aggregate -- no fold needed). The union
    deduplicates users active on many days, which a sum of daily distinct
    counts cannot do: summaries stay a few KB per day, and any time range
    answers in O(|days|) without touching raw events."""
    daily = hll_daily_user_sketches(spark, sf_dir)
    return daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("distinct_users"),
        F.sum("n").alias("n_events"),
    )
