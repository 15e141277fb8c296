"""Parquet lake layout + maintenance: date-partitioned writes, partition-
pruned reads, and small-file compaction.

At 100 TB the table layout IS the query plan: a date-partitioned lake turns
every time-bounded query into a directory prune (zero I/O for excluded
days), and sorting within files gives parquet row-group min/max stats that
prune inside the day. The compactor fixes the operational failure mode of
streaming ingestion -- thousands of tiny files per partition -- which
otherwise drowns the scan in open/footer overhead and breaks split
planning.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from streamprocessing_with_kafka_spark.sources.tables import load_table


def write_events_partitioned(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    """Materialize events as a date-partitioned, user/time-sorted lake.

    `repartition(event_date)` gives one shuffle task per day -> one file
    per partition dir (no small files at write time); `sortWithinPartitions`
    orders rows so row-group stats prune on user_id/ts range predicates.
    """
    e = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    (
        e.repartition("event_date")
        .sortWithinPartitions("user_id", "ts")
        .write.partitionBy("event_date")
        .mode("overwrite")
        .parquet(out_dir)
    )


def read_events_day(spark: SparkSession, lake_dir: str, day: str) -> DataFrame:
    """Day-bounded read; the filter must become a PartitionFilters prune
    (asserted in tests), never a full-lake scan."""
    return spark.read.parquet(lake_dir).filter(F.col("event_date") == day)


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 << 20,
) -> int:
    """Compact a parquet directory into ~target-sized files; returns the
    output file count.

    Sizing reads ONLY filesystem metadata (no data scan). Compaction
    writes to a NEW location and the caller swaps atomically (rename /
    metastore pointer) -- rewriting in place while readers stream the same
    files is how lakes corrupt themselves. Local paths here; on object
    stores the same logic runs against the store's listing API.
    """
    total = 0
    for root, _dirs, files in os.walk(src_dir):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src_dir)
    df.repartition(n_files).write.mode("overwrite").parquet(dst_dir)
    out = 0
    for root, _dirs, files in os.walk(dst_dir):
        out += sum(f.endswith(".parquet") for f in files)
    return out
