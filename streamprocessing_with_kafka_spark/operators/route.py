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


ENVELOPE_FIELDS = [
    ("order_id", "string"),
    ("product_name", "string"),
    ("quantity", "double"),
    ("price", "double"),
    ("order_date", "string"),
    ("total_price", "double"),
]


def connect_envelope(df: DataFrame) -> DataFrame:
    """Exact Kafka-Connect envelope {"schema": ..., "payload": ...} as in
    order_validator.py:95-123 -- six optional fields, string/double types."""
    fields = ENVELOPE_FIELDS
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


def _envelope_sql() -> str:
    """DuckDB twin of connect_envelope's `value`: the static schema header
    is generated from the SAME field list, the payload is concatenated
    field-wise with to_json per value (DuckDB's to_json matches Spark's
    JSON output for strings and for the plain decimal doubles in play;
    null fields are omitted by both engines)."""
    header = (
        '{"schema":{"type":"struct","fields":['
        + ",".join(
            f'{{"type":"{t}","optional":true,"field":"{n}"}}'
            for n, t in ENVELOPE_FIELDS
        )
        + '],"optional":true},"payload":{'
    )
    parts = ",\n    ".join(
        f"CASE WHEN {n} IS NOT NULL THEN '\"{n}\":' || to_json({n}) END"
        for n, _ in ENVELOPE_FIELDS
    )
    return (
        f"SELECT kafka_key, '{header}' || concat_ws(',',\n    {parts}\n  ) "
        "|| '}}' AS value FROM routed"
    )


ENVELOPE_SQL = _envelope_sql()
