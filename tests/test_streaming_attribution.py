"""Streaming attribution twin: per-purchase online verdicts must
aggregate to the batch operator's exact daily numbers, with the last
click carried in state ACROSS micro-batches and late rows dropped."""

import json
import time
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

import streamprocessing_with_kafka_spark.operators.timeseries as ts_mod
from streamprocessing_with_kafka_spark.streaming.attribution import attribution_stream

EV_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)

BATCH1 = [
    # user 1: click late on day 1 -- the purchase arrives in BATCH 2
    {"event_id": 1, "ts": "2024-05-01T22:00:00", "user_id": 1, "event_type": "click", "value": 0.0},
    # user 2: click + same-day purchase 2h later -> attributed
    {"event_id": 2, "ts": "2024-05-01T08:00:00", "user_id": 2, "event_type": "click", "value": 0.0},
    {"event_id": 3, "ts": "2024-05-01T10:00:00", "user_id": 2, "event_type": "purchase", "value": 12.5},
    # user 3: purchase with no click ever -> unattributed
    {"event_id": 4, "ts": "2024-05-01T11:00:00", "user_id": 3, "event_type": "purchase", "value": 7.25},
]
BATCH2 = [
    # user 1: purchase on day 2, 11h after the batch-1 click -> attributed
    # ONLY if the click state survived the micro-batch boundary
    {"event_id": 5, "ts": "2024-05-02T09:00:00", "user_id": 1, "event_type": "purchase", "value": 40.0},
    # user 2: purchase 26h after its click -> stale, unattributed
    {"event_id": 6, "ts": "2024-05-02T10:00:00", "user_id": 2, "event_type": "purchase", "value": 3.125},
    # LATE replay of user 2's day-1 purchase -> dropped
    {"event_id": 3, "ts": "2024-05-01T10:00:00", "user_id": 2, "event_type": "purchase", "value": 999.0},
]


def test_streaming_attribution_converges_to_batch_daily(spark, tmp_path):
    inp, ckpt = tmp_path / "ev", tmp_path / "ckpt"
    inp.mkdir()
    with open(inp / "b1.json", "w") as f:
        for r in BATCH1:
            f.write(json.dumps(r) + "\n")
    time.sleep(1.1)
    with open(inp / "b2.json", "w") as f:
        for r in BATCH2:
            f.write(json.dumps(r) + "\n")

    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(inp))
    )
    q = (
        attribution_stream(stream)
        .writeStream.format("memory")
        .queryName("attr_streamed")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM attr_streamed").collect()

    # the late replay was dropped; every real purchase judged exactly once
    assert sorted(r.event_id for r in got) == [3, 4, 5, 6]
    verdicts = {r.event_id: r.attributed for r in got}
    assert verdicts == {3: True, 4: False, 5: True, 6: False}

    # daily aggregation of the stream == the batch operator
    on_time = [r for r in BATCH1 + BATCH2 if r["value"] != 999.0]
    ev = spark.createDataFrame(
        [
            (r["event_id"], r["ts"].replace("T", " "), r["user_id"], r["event_type"], r["value"], "{}")
            for r in on_time
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type",
        "value", "props"
    )
    orig = ts_mod.load_table
    try:
        ts_mod.load_table = lambda s, d, n: ev
        batch = {r.day.isoformat(): r for r in ts_mod.attribution_last_touch(spark, "x").collect()}
    finally:
        ts_mod.load_table = orig

    dec = lambda v: Decimal(repr(v)).quantize(  # noqa: E731
        Decimal("1.0000000000"), rounding=ROUND_HALF_UP
    )
    daily: dict = {}
    for r in got:
        d = daily.setdefault(r.ts.date().isoformat(), [0, 0, Decimal(0)])
        d[0] += 1
        if r.attributed:
            d[1] += 1
            d[2] += dec(r.value)
    assert daily.keys() == batch.keys()
    for day, (n, n_attr, val) in daily.items():
        b = batch[day]
        assert (n, n_attr) == (b.purchases, b.attributed), day
        expect = float(val) if n_attr else None
        assert b.attributed_value == expect, day


def test_streaming_attribution_null_purchase_value_stays_null(spark, tmp_path):
    """A purchase with a NULL value must attribute normally and carry
    the NULL through -- pre-fix float(NaN) emitted NaN where the batch
    operator keeps NULL (r9 mixed-nulls twin audit)."""
    rows = [
        {"event_id": 1, "ts": "2024-05-01T08:00:00", "user_id": 9,
         "event_type": "click", "value": 0.0},
        {"event_id": 2, "ts": "2024-05-01T09:00:00", "user_id": 9,
         "event_type": "purchase", "value": None},
    ]
    inp, ckpt = tmp_path / "ev", tmp_path / "ckpt"
    inp.mkdir()
    with open(inp / "b1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(inp))
    )
    q = (
        attribution_stream(stream)
        .writeStream.format("memory")
        .queryName("attr_nulls")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM attr_nulls").collect()
    assert len(got) == 1
    assert got[0].value is None and got[0].attributed
