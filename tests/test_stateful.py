"""Stateful streaming operators: watermark-bounded dedup and per-key
running counters (the durable twins of the reference's ST3 in-memory
tallies and its poll-interval "dedupe")."""

import json

from pyspark.sql import functions as F

from streamprocessing_with_kafka_spark.streaming.pipeline import (
    file_order_stream,
    transform_orders,
)
from streamprocessing_with_kafka_spark.streaming.stateful import (
    dedup_within_watermark,
    running_counters_stateful,
)


def _write_orders(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


ROWS = [
    {"order_id": "1", "product_name": "a", "quantity": "1", "price": "10",
     "order_date": "2024-01-05"},
    {"order_id": "1", "product_name": "a", "quantity": "1", "price": "10",
     "order_date": "2024-01-05"},  # redelivery of the same key
    {"order_id": "2", "product_name": "b", "quantity": "2", "price": "5",
     "order_date": "2024-01-06"},
    {"order_id": "3", "product_name": "c", "quantity": "-1", "price": "5",
     "order_date": "2024-01-06"},  # invalid: negative quantity
]


def test_dedup_within_watermark_drops_redelivery(spark, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    _write_orders(inp / "a.json", ROWS)
    routed = transform_orders(file_order_stream(spark, str(inp)))
    deduped = dedup_within_watermark(routed)
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_wm")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT order_id FROM dedup_wm").collect()
    assert sorted(r["order_id"] for r in got) == ["1", "2", "3"]


def test_running_counters_accumulate_across_batches(spark, tmp_path):
    """applyInPandasWithState: totals survive across micro-batches via the
    checkpointed state store (the reference's counters reset on restart)."""
    inp, ckpt = tmp_path / "in", tmp_path / "ckpt"
    inp.mkdir()
    _write_orders(inp / "a.json", ROWS)

    def run_once():
        routed = transform_orders(file_order_stream(spark, str(inp)))
        counters = running_counters_stateful(routed)
        emitted = []

        def collect_batch(batch, batch_id):
            emitted.extend(batch.collect())

        q = (
            counters.writeStream.foreachBatch(collect_batch)
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .outputMode("update")
            .start()
        )
        q.awaitTermination(120)
        return {
            r["target"]: (r["processed"], r["valid"], r["invalid"])
            for r in emitted
        }

    first = run_once()
    # 4 rows: 3 valid (incl. the redelivered key -- dedup is a separate
    # operator), 1 invalid
    assert first["enriched_orders"] == (3, 3, 0)
    assert first["invalid_orders"] == (1, 0, 1)

    # second batch arrives; state carries the old totals forward
    _write_orders(inp / "b.json", [
        {"order_id": "9", "product_name": "z", "quantity": "2", "price": "3",
         "order_date": "2024-01-07"},
        {"order_id": "10", "product_name": "w", "quantity": "x", "price": "3",
         "order_date": "2024-01-07"},
    ])
    second = run_once()
    assert second["enriched_orders"] == (4, 4, 0)
    assert second["invalid_orders"] == (2, 0, 2)


def test_tws_counters_accumulate_across_batches(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 state v2): same durable totals
    as the applyInPandasWithState twin, on the successor API."""
    from streamprocessing_with_kafka_spark.streaming.stateful import (
        HAS_TWS,
        running_counters_tws,
    )

    if not HAS_TWS:
        import pytest

        pytest.skip(
            "transformWithState unavailable: needs Spark >= 4.0 AND the "
            "TWS runner's protobuf transport (absent in this container)"
        )

    inp, ckpt = tmp_path / "in", tmp_path / "ckpt"
    inp.mkdir()
    _write_orders(inp / "a.json", ROWS)

    def run_once():
        routed = transform_orders(file_order_stream(spark, str(inp)))
        counters = running_counters_tws(routed)
        emitted = []

        def collect_batch(batch, batch_id):
            emitted.extend(batch.collect())

        q = (
            counters.writeStream.foreachBatch(collect_batch)
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .outputMode("update")
            .start()
        )
        q.awaitTermination(120)
        return {
            r["target"]: (r["processed"], r["valid"], r["invalid"])
            for r in emitted
        }

    first = run_once()
    assert first["enriched_orders"] == (3, 3, 0)
    assert first["invalid_orders"] == (1, 0, 1)

    _write_orders(inp / "b.json", [
        {"order_id": "9", "product_name": "z", "quantity": "2", "price": "3",
         "order_date": "2024-01-07"},
    ])
    second = run_once()
    assert second["enriched_orders"] == (4, 4, 0)
    assert second["invalid_orders"] == (1, 0, 1)
