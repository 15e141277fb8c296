"""Live-broker integration test for the S2 -> T* -> K1/R2 path (reference
`src/app/order_validator.py:71-142`): bytes through a REAL Kafka broker.

The sandbox ships neither a broker nor the spark-sql-kafka connector JAR,
so this is skip-guarded three ways (env var set, TCP reachable, connector
loadable) and runs wherever those hold -- e.g. `docker compose up kafka`
plus `--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>`, with
`SPARK_GRAFT_KAFKA_BOOTSTRAP=localhost:9092`. The file-source twins in
test_streaming.py cover the identical transform semantics unconditionally.
"""

import json
import os
import socket
import uuid

import pytest

from pyspark.sql import functions as F

BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP", "")


def _reachable(bootstrap: str) -> bool:
    try:
        host, port = bootstrap.split(",")[0].rsplit(":", 1)
        with socket.create_connection((host, int(port)), timeout=2):
            return True
    except Exception:
        return False


def _connector_available(spark) -> bool:
    try:
        spark.read.format("kafka").option("kafka.bootstrap.servers", BOOTSTRAP).option(
            "subscribe", "__probe__"
        ).option("startingOffsets", "earliest").option("endingOffsets", "earliest").load()
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not BOOTSTRAP or not _reachable(BOOTSTRAP),
    reason="no live Kafka broker (set SPARK_GRAFT_KAFKA_BOOTSTRAP)",
)


def test_orders_roundtrip_through_live_broker(spark, tmp_path):
    from streamprocessing_with_kafka_spark.streaming.pipeline import (
        kafka_order_stream,
        kafka_split_sink,
        transform_orders,
    )

    if not _connector_available(spark):
        pytest.skip("spark-sql-kafka connector not on the classpath")

    run = uuid.uuid4().hex[:8]
    in_topic = f"orders_{run}"
    enriched_topic = f"enriched_orders_{run}"  # to_kafka_records targets
    invalid_topic = f"invalid_orders_{run}"

    # produce: one valid order, one invalid (bad quantity), one corrupt blob
    msgs = [
        json.dumps(
            {"order_id": "o1", "product_name": "WASP", "quantity": "2",
             "price": "200.0", "order_date": "2025-11-09"}
        ),
        json.dumps(
            {"order_id": "o2", "product_name": "gadget", "quantity": "not_a_number",
             "price": "1.5", "order_date": "2025-11-09"}
        ),
        "{corrupt",
    ]
    spark.createDataFrame([(m,) for m in msgs], "value string").select(
        F.col("value").cast("binary").alias("value")
    ).write.format("kafka").option("kafka.bootstrap.servers", BOOTSTRAP).option(
        "topic", in_topic
    ).save()

    routed = transform_orders(kafka_order_stream(spark, BOOTSTRAP, topic=in_topic))
    routed = routed.withColumn(
        "target",
        F.when(F.col("target") == "enriched_orders", enriched_topic).otherwise(invalid_topic),
    )
    q = kafka_split_sink(
        routed, BOOTSTRAP, str(tmp_path / "ckpt"), available_now=True
    )
    assert q.awaitTermination(120), "sink did not drain within 120s"

    def read_topic(topic):
        return (
            spark.read.format("kafka")
            .option("kafka.bootstrap.servers", BOOTSTRAP)
            .option("subscribe", topic)
            .option("startingOffsets", "earliest")
            .load()
            .select(
                F.col("key").cast("string").alias("key"),
                F.col("value").cast("string").alias("value"),
            )
            .collect()
        )

    enriched = read_topic(enriched_topic)
    invalid = read_topic(invalid_topic)
    # valid order enriched with total_price, keyed by order_id (T6/T9)
    assert len(enriched) == 1 and enriched[0].key == "o1"
    assert json.loads(enriched[0].value)["total_price"] == 400.0
    # invalid order dead-lettered under its key; the uncoercible quantity
    # is nulled by try_cast so to_json omits it (T2/ST6). Corrupt blob
    # dropped entirely (S3).
    assert len(invalid) == 1 and invalid[0].key == "o2"
    assert "total_price" not in json.loads(invalid[0].value)
