"""Stream-static enrichment and watermarked stream-stream joins."""

import json

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from streamprocessing_with_kafka_spark.streaming.joins import (
    enrich_with_catalog,
    join_orders_payments,
)


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_stream_static_enrichment(spark, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    _write(inp / "a.json", [
        {"order_id": "1", "product_name": "widget", "total_price": 20.0},
        {"order_id": "2", "product_name": "mystery", "total_price": 5.0},
    ])
    schema = StructType([
        StructField("order_id", StringType()),
        StructField("product_name", StringType()),
        StructField("total_price", DoubleType()),
    ])
    catalog = spark.createDataFrame(
        [("widget", "tools", 7.5)], "product_name string, category string, unit_cost double"
    )
    stream = spark.readStream.schema(schema).json(str(inp))
    out = []
    q = (
        enrich_with_catalog(stream, catalog)
        .writeStream.foreachBatch(lambda b, _id: out.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["order_id"]: (r["category"], r["unit_cost"]) for r in out}
    assert got == {"1": ("tools", 7.5), "2": (None, None)}  # left join keeps misses


ORDER_SCHEMA = StructType([
    StructField("order_id", StringType()),
    StructField("order_ts", TimestampType()),
    StructField("total_price", DoubleType()),
])
PAY_SCHEMA = StructType([
    StructField("pay_order_id", StringType()),
    StructField("pay_ts", TimestampType()),
    StructField("amount", DoubleType()),
])


def test_stream_stream_join_within_window(spark, tmp_path):
    odir, pdir = tmp_path / "orders", tmp_path / "pays"
    odir.mkdir(), pdir.mkdir()
    _write(odir / "o.json", [
        {"order_id": "1", "order_ts": "2024-01-01 10:00:00", "total_price": 20.0},
        {"order_id": "2", "order_ts": "2024-01-01 10:05:00", "total_price": 30.0},
        {"order_id": "3", "order_ts": "2024-01-01 10:10:00", "total_price": 40.0},
    ])
    _write(pdir / "p.json", [
        {"pay_order_id": "1", "pay_ts": "2024-01-01 10:20:00", "amount": 20.0},  # in window
        {"pay_order_id": "2", "pay_ts": "2024-01-01 12:00:00", "amount": 30.0},  # too late
        {"pay_order_id": "9", "pay_ts": "2024-01-01 10:21:00", "amount": 1.0},   # no order
    ])
    orders = spark.readStream.schema(ORDER_SCHEMA).json(str(odir))
    pays = spark.readStream.schema(PAY_SCHEMA).json(str(pdir))
    out = []
    q = (
        join_orders_payments(orders, pays)
        .writeStream.foreachBatch(lambda b, _id: out.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert [(r["order_id"], r["amount"]) for r in out] == [("1", 20.0)]


def test_stream_stream_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    """Unpaid orders must surface null-extended once the watermark passes
    their join window; orders whose window is still open at end-of-stream
    must NOT emit (the engine cannot yet prove them unpaid)."""
    from streamprocessing_with_kafka_spark.streaming.joins import (
        join_orders_payments_left_outer,
    )

    odir, pdir = tmp_path / "orders", tmp_path / "pays"
    odir.mkdir(), pdir.mkdir()
    # batch 1: one paid order, one unpaid order
    _write(odir / "a.json", [
        {"order_id": "1", "order_ts": "2024-01-01 10:00:00", "total_price": 20.0},
        {"order_id": "2", "order_ts": "2024-01-01 10:05:00", "total_price": 30.0},
    ])
    _write(pdir / "a.json", [
        {"pay_order_id": "1", "pay_ts": "2024-01-01 10:20:00", "amount": 20.0},
    ])
    # batch 2: far-future rows on BOTH sides push the global (min) watermark
    # to 22:00, far past order 2's 11:05 close -> its null row must flush.
    # The 23:00 order itself stays buffered (window still open) and must
    # not emit by end-of-stream.
    _write(odir / "b.json", [
        {"order_id": "late", "order_ts": "2024-01-01 23:00:00", "total_price": 1.0},
    ])
    _write(pdir / "b.json", [
        {"pay_order_id": "nobody", "pay_ts": "2024-01-01 23:00:00", "amount": 9.0},
    ])
    orders = (
        spark.readStream.schema(ORDER_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(odir))
    )
    pays = (
        spark.readStream.schema(PAY_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(pdir))
    )
    out = []
    q = (
        join_orders_payments_left_outer(orders, pays)
        .writeStream.foreachBatch(lambda b, _id: out.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {r["order_id"]: (r["pay_ts"] is not None, r["amount"]) for r in out}
    assert got["1"] == (True, 20.0)  # matched pair
    assert got["2"] == (False, None)  # proven-unpaid null extension
    assert "late" not in got  # window still open at end of stream
