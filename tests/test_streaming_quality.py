"""Streaming quality audit: a micro-batch equal to the whole orders
table must reproduce the batch constraint report's orders rows
bit-for-bit; a planted-dirty batch flags its violations online."""

import json

from streamprocessing_with_kafka_spark.operators.quality import (
    orders_audit_frame,
)
from streamprocessing_with_kafka_spark.sources.tables import load_table
from streamprocessing_with_kafka_spark.streaming.quality import (
    batch_quality_audit,
    quality_audit_sink,
    quality_referee,
)

ORDER_SCHEMA = (
    "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
    "o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING"
)


def _canon(rows):
    return sorted(tuple(r) for r in rows)


def test_batch_audit_matches_batch_report(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    audit = batch_quality_audit(orders, quality_referee(customer))
    expected = orders_audit_frame(orders, customer)
    assert _canon(audit.collect()) == _canon(expected.collect())


def test_dirty_batch_flags_online(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    batch = spark.createDataFrame(
        [
            (1, 1, "O", 10.0, t0, "1-URGENT"),
            (1, 2, "X", -5.0, t0, "1-URGENT"),  # dup PK, bad status, bad price
            (2, 99, "F", 20.0, t0, "1-URGENT"),  # dangling FK
        ],
        ORDER_SCHEMA,
    )
    referee = spark.createDataFrame([(1,), (2,)], "c_custkey BIGINT")
    out = {r.check_name: r for r in batch_quality_audit(batch, referee).collect()}
    assert out["unique_o_orderkey"].metric == round(2 / 3, 6)
    assert out["domain_o_orderstatus"].metric == round(2 / 3, 6)
    assert out["bounds_o_totalprice"].metric == round(2 / 3, 6)
    assert out["fk_o_custkey_in_customer"].metric == round(2 / 3, 6)
    assert not out["unique_o_orderkey"].passed


def test_streaming_audit_end_to_end(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    inp, ckpt, audit = tmp_path / "ord", tmp_path / "ckpt", tmp_path / "audit"
    inp.mkdir()
    with open(inp / "b0.json", "w") as f:
        for r in orders.collect():
            d = r.asDict()
            d["o_orderdate"] = d["o_orderdate"].isoformat()
            f.write(json.dumps(d) + "\n")
    stream = spark.readStream.schema(ORDER_SCHEMA).json(str(inp))
    q = (
        stream.writeStream.foreachBatch(
            quality_audit_sink(quality_referee(customer), str(audit))
        )
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain"
    got = spark.read.parquet(str(audit)).drop("batch_id")
    expected = orders_audit_frame(orders, customer)
    assert _canon(got.collect()) == _canon(expected.collect())
