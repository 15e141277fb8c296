"""Streaming drift audit: compare each arriving micro-batch of events
against a FROZEN baseline window -- the continuous twin of
operators/profile.profile_drift.

Production shape: the baseline is a reference window of the historical
stream (yesterday, the last good deploy, the training window), profiled
ONCE into a |event_types|-row frame of counts and exact-decimal moment
sums; it broadcasts onto every micro-batch. Each batch pays one
map-side-combinable aggregate over its own rows plus a types-sized
full-outer join -- a type that newly appears (no baseline row) or
vanishes (no batch row) zero-fills its counts and flags on the volume
ratio, which is exactly the alert those cases deserve.

Scoring is operators/profile.drift_score -- the SAME column expressions
as the batch monitor -- so a micro-batch equal to the batch operator's
second window reproduces its audit rows bit-for-bit
(tests/test_streaming_drift.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from streamprocessing_with_kafka_spark.functions.numeric import dec_sum
from streamprocessing_with_kafka_spark.operators.profile import drift_score


def _stats(e: DataFrame, suffix: str) -> DataFrame:
    """Per-type (n, users, exact-decimal sum, sum-of-squares) with
    columns named for drift_score's `suffix` side."""
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias(f"n_{suffix}"),
        F.countDistinct("user_id").alias(f"users_{suffix}"),
        dec_sum(F.col("value")).alias(f"_s_{suffix}"),
        dec_sum(F.col("value") * F.col("value")).alias(f"_q_{suffix}"),
    )


def drift_baseline(e: DataFrame) -> DataFrame:
    """Freeze the baseline window's per-type stats (the 'a' side)."""
    return _stats(e, "a")


def batch_drift_audit(batch: DataFrame, baseline: DataFrame) -> DataFrame:
    """Score one batch of events against the frozen baseline; emits
    profile_drift's schema. Missing sides zero-fill counts (sums stay
    NULL, matching the batch operator's empty-window semantics)."""
    joined = (
        F.broadcast(baseline)
        .join(_stats(batch, "b"), "event_type", "full_outer")
        .select(
            "event_type",
            *[
                F.coalesce(F.col(c), F.lit(0)).alias(c)
                for c in ("n_a", "n_b", "users_a", "users_b")
            ],
            "_s_a",
            "_s_b",
            "_q_a",
            "_q_b",
        )
    )
    return drift_score(joined)


def drift_audit_sink(baseline: DataFrame, audit_dir: str):
    """foreachBatch fn appending one audit frame per micro-batch to a
    parquet log (batch_id-stamped, so replays overwrite-by-append are
    deduplicable downstream)."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        batch_drift_audit(batch, baseline).withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("append").parquet(audit_dir)

    return write_batch
