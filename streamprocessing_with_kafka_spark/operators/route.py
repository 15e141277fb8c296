"""Content-based stream routing + keying (SURVEY.md §2.3 R1/R2, §2.2 T9/T10).

The reference picks a target topic per record and keys the Kafka message by
order_id (src/app/order_validator.py:263-283). In Spark the split is a
derived `target` column: the kafka sink honors a per-row `topic` column, so
one writer serves both branches in a single pass (no double-read, no
side-output machinery). Partitioning by key comes free from Kafka's default
hash partitioner on the `key` column -- at scale that is what preserves
per-order ordering without a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

ENRICHED_TOPIC = "enriched_orders"
INVALID_TOPIC = "invalid_orders"


def route(df: DataFrame) -> DataFrame:
    """Add `target` (topic) + `kafka_key` columns to a validated frame."""
    return df.withColumns(
        {
            "target": F.when(F.col("is_valid"), F.lit(ENRICHED_TOPIC)).otherwise(
                F.lit(INVALID_TOPIC)
            ),
            # T9: reference defaults a missing order_id key to 'unknown'
            # (order_validator.py:267-269).
            "kafka_key": F.coalesce(F.col("order_id"), F.lit("unknown")),
        }
    )


ROUTE_SQL = """
SELECT *,
  CASE WHEN is_valid THEN 'enriched_orders' ELSE 'invalid_orders' END AS target,
  coalesce(order_id, 'unknown') AS kafka_key
FROM validated
"""


def to_kafka_records(df: DataFrame) -> DataFrame:
    """Shape a routed frame into kafka-sink columns (key, value, topic).

    T10: the reference wraps every outgoing payload in a Kafka Connect
    schema envelope (order_validator.py:95-123) because its JDBC sink needs
    a Struct. Spark's JDBC writer does not, so the envelope is optional; we
    emit the payload JSON and keep the envelope available for downstream
    Connect consumers via `envelope=True` in plans/registry usage.
    """
    payload = F.struct(
        "order_id",
        "product_name",
        "quantity",
        "price",
        "order_date",
        "total_price",
    )
    return df.select(
        F.col("kafka_key").alias("key"),
        F.to_json(payload).alias("value"),
        F.col("target").alias("topic"),
    )


def connect_envelope(df: DataFrame) -> DataFrame:
    """Exact Kafka-Connect envelope {"schema": ..., "payload": ...} as in
    order_validator.py:95-123 -- six optional fields, string/double types."""
    fields = [
        ("order_id", "string"),
        ("product_name", "string"),
        ("quantity", "double"),
        ("price", "double"),
        ("order_date", "string"),
        ("total_price", "double"),
    ]
    schema = F.struct(
        F.lit("struct").alias("type"),
        F.array(
            *[
                F.struct(
                    F.lit(t).alias("type"),
                    F.lit(True).alias("optional"),
                    F.lit(n).alias("field"),
                )
                for n, t in fields
            ]
        ).alias("fields"),
        F.lit(True).alias("optional"),
    )
    payload = F.struct(*[F.col(n) for n, _ in fields])
    return df.withColumn(
        "value", F.to_json(F.struct(schema.alias("schema"), payload.alias("payload")))
    )
