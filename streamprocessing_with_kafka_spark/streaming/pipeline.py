"""Structured Streaming layer: the reference's consume -> validate/enrich
-> route -> produce loop (SURVEY.md §3.2) as one streaming DataFrame
program. The transforms are the *same* pure functions the batch/oracle
path uses -- streaming is just a different execution mode of the same
logical plan.

Reference semantics -> Spark:
  at-least-once commit-after-write (ST1)  -> checkpointLocation WAL
                                             (exactly-once for the split,
                                             idempotent-upsert for JDBC)
  max_poll_records batching (ST2)         -> maxOffsetsPerTrigger
  running counters (ST3)                  -> df.observe + listener
  poison-pill livelock (ST4, a defect)    -> fixed: such rows route to
                                             invalid_orders
  graceful shutdown (ST5)                 -> query.stop() / awaitTermination
  dead-letter channel (ST6)               -> invalid branch of the split

Scale notes: the pipeline is a narrow map (no shuffle); parallelism =
kafka partitions x executors. The two-way split runs inside ONE
foreachBatch so each micro-batch is read once and both branches commit
atomically with the same epoch.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from streamprocessing_with_kafka_spark.operators.route import route, to_kafka_records
from streamprocessing_with_kafka_spark.operators.validate import validate_and_enrich
from streamprocessing_with_kafka_spark.schema import ORDER_RAW_SCHEMA
from streamprocessing_with_kafka_spark.session import ensure_runtime_confs


def transform_orders(raw: DataFrame) -> DataFrame:
    """Shared streaming/batch core: corrupt-drop -> validate -> route.

    Counted-and-dropped corrupt records mirror safe_deserializer
    (order_validator.py:57-69): a row whose every payload field is null
    but _corrupt_record is set never parsed at all.
    """
    parsed = raw.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record", "id")
    return route(validate_and_enrich(parsed))


def file_order_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """S4-as-stream: watch a directory of JSON order lines."""
    ensure_runtime_confs(spark)
    return (
        spark.readStream.schema(ORDER_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 16)  # ST2 micro-batch bound
        .json(input_dir)
    )


def kafka_order_stream(
    spark: SparkSession,
    bootstrap: str,
    topic: str = "orders",
    max_offsets_per_trigger: int = 10_000,
) -> DataFrame:
    """S2: Kafka consumer source. Mirrors the reference's consumer config
    (order_validator.py:71-91): earliest offsets, bounded batches; group
    offsets are replaced by the checkpoint WAL (stronger)."""
    ensure_runtime_confs(spark)
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("maxOffsetsPerTrigger", max_offsets_per_trigger)
        .option("failOnDataLoss", "false")
        .load()
    )
    return raw.select(
        F.from_json(
            F.col("value").cast("string"),
            ORDER_RAW_SCHEMA,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("o")
    ).select("o.*")


def kafka_split_sink(
    routed: DataFrame, bootstrap: str, checkpoint: str, available_now: bool = False
) -> StreamingQuery:
    """K1 + R1(c): one kafka writer serves both topics via the per-row
    `topic` column; producer opts mirror the reference's durability config
    (acks=all, bounded in-flight -- order_validator.py:139-141).
    `available_now` drains the source then stops (ST5), for bounded
    integration runs."""
    records = to_kafka_records(routed)
    writer = (
        records.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("kafka.acks", "all")
        .option("kafka.max.in.flight.requests.per.connection", "1")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_file_pipeline(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """File-in, file-out pipeline: both branches written per micro-batch in
    a single pass (R1 option b), parquet dirs standing in for topics."""
    routed = transform_orders(file_order_stream(spark, input_dir))
    # ST3 running counters, observable via StreamingQueryListener
    routed = routed.observe(
        "counters",
        F.count(F.lit(1)).alias("processed"),
        F.count_if(F.col("is_valid")).alias("valid"),
        F.count_if(~F.col("is_valid")).alias("invalid"),
    )

    def write_split(batch: DataFrame, batch_id: int) -> None:
        batch.persist()
        try:
            for target in ("enriched_orders", "invalid_orders"):
                (
                    batch.filter(F.col("target") == target)
                    .drop("target")
                    .write.mode("append")
                    .parquet(f"{output_dir}/{target}")
                )
        finally:
            batch.unpersist()

    writer = routed.writeStream.foreachBatch(write_split).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stop_all(spark: SparkSession) -> None:
    """ST5 graceful shutdown."""
    for q in spark.streams.active:
        q.stop()
