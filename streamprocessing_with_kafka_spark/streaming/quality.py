"""Streaming data-quality audit: score each arriving micro-batch of
orders against the set-level constraint suite -- the continuous twin of
operators/quality.orders_audit_frame, sharing that function VERBATIM so
the batch and streaming verdicts cannot drift apart.

Production shape: the customer dimension is frozen once into a distinct
key projection (the FK-containment referee) and broadcast onto every
micro-batch; each batch then pays one map-side-combinable aggregate
over its own rows plus the keys-only semi join.  Per-batch semantics by
design: uniqueness means "unique within this batch" (cross-batch PK
replays are the dedup/upsert sinks' concern), completeness/domain/
bounds/FK rows read identically to the batch report.  A batch equal to
the whole table therefore reproduces operators/quality.quality_report's
orders rows bit-for-bit (tests/test_streaming_quality.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from streamprocessing_with_kafka_spark.operators.quality import (
    orders_audit_frame,
)


def quality_referee(customer: DataFrame) -> DataFrame:
    """Freeze the FK referee: the distinct customer-key projection."""
    return customer.select("c_custkey").distinct()


def batch_quality_audit(batch: DataFrame, referee: DataFrame) -> DataFrame:
    """The five constraint rows for one micro-batch of orders."""
    return orders_audit_frame(batch, F.broadcast(referee))


def quality_audit_sink(referee: DataFrame, audit_dir: str):
    """foreachBatch fn appending one batch_id-stamped audit frame per
    micro-batch to a parquet log."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        batch_quality_audit(batch, referee).withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("append").parquet(audit_dir)

    return write_batch
