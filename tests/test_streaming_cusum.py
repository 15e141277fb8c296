"""Streaming CUSUM twin: with the model frozen from the batch moment
pass, the O(1)-state online detector must emit cusum values and alarms
BIT-IDENTICAL to the batch closed-form windows over the same hourly
series, with state carrying the running sums across micro-batches and
late buckets dropped."""

import json
import time

from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

import streamprocessing_with_kafka_spark.operators.timeseries as ts_mod
from streamprocessing_with_kafka_spark.operators.timeseries import (
    CUSUM_H,
    CUSUM_K,
    cusum_changepoints,
)
from streamprocessing_with_kafka_spark.streaming.cusum import cusum_stream

HOURLY_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("bucket", TimestampType()),
        StructField("x", DoubleType()),
    ]
)


def _events(spark):
    rows = []
    eid = 0
    for hour in range(30):
        level = 5.0 if hour < 20 else 9.5  # upward shift at hour 20
        rows.append(
            (eid, f"2024-02-{1 + hour // 24:02d} {hour % 24:02d}:00:00", 1,
             "shifted", level + (hour % 4) * 0.25, "{}")
        )
        eid += 1
    return spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type",
        "value", "props"
    )


def test_streaming_cusum_converges_to_batch(spark, tmp_path):
    ev = _events(spark)

    orig = ts_mod.load_table
    try:
        ts_mod.load_table = lambda s, d, n: ev
        batch = sorted(
            cusum_changepoints(spark, "ignored").collect(), key=lambda r: r.bucket
        )
    finally:
        ts_mod.load_table = orig
    assert any(r.is_alarm for r in batch)  # the shift fires the detector

    # frozen model = the batch operator's own moment pass
    xs = [r.x for r in batch]
    n = len(xs)
    mu = sum(xs) / n
    sigma = max(sum(v * v for v in xs) / n - mu * mu, 0.0) ** 0.5
    model = {"shifted": (mu, CUSUM_K * sigma, CUSUM_H * sigma)}

    half = len(batch) // 2
    b1 = [
        {"event_type": r.event_type, "bucket": r.bucket.isoformat(sep=" "), "x": r.x}
        for r in batch[:half]
    ]
    # second file: the rest, plus a LATE replay of the first bucket
    b2 = [
        {"event_type": r.event_type, "bucket": r.bucket.isoformat(sep=" "), "x": r.x}
        for r in batch[half:]
    ] + [
        {"event_type": "shifted", "bucket": batch[0].bucket.isoformat(sep=" "), "x": 1e9}
    ]

    inp, ckpt = tmp_path / "hourly", tmp_path / "ckpt"
    inp.mkdir()
    with open(inp / "b1.json", "w") as f:
        for r in b1:
            f.write(json.dumps(r) + "\n")
    time.sleep(1.1)
    with open(inp / "b2.json", "w") as f:
        for r in b2:
            f.write(json.dumps(r) + "\n")

    stream = (
        spark.readStream.schema(HOURLY_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(inp))
    )
    q = (
        cusum_stream(stream, model)
        .writeStream.format("memory")
        .queryName("cusum_streamed")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(120)
    got = {r.bucket: r for r in spark.sql("SELECT * FROM cusum_streamed").collect()}

    assert len(got) == len(batch)  # late replay dropped, nothing re-emitted
    for b in batch:
        g = got[b.bucket]
        assert g.x == b.x
        assert g.cusum_up == b.cusum_up, b.bucket
        assert g.cusum_dn == b.cusum_dn, b.bucket
        assert g.is_alarm == b.is_alarm, b.bucket


def test_streaming_cusum_null_hours_match_batch(spark, tmp_path):
    """NULL-value parity (r9 mixed-nulls twin audit): an all-NULL hour
    rolls up to x = NULL; before the first non-NULL hour the batch
    window sums are NULL (NULL cusums), and afterwards a NULL hour is a
    zero-increment step (sum() skips the NULL term). Pre-fix the twin
    raised on NaN inside the exact-decimal running sums."""
    rows, eid = [], 0
    for hour in range(24):
        level = 5.0 if hour < 16 else 9.5
        if hour in (0, 7):  # leading + mid-stream all-NULL hours
            rows.append((eid, f"2024-02-01 {hour:02d}:00:00", 1, "ns",
                         None, "{}"))
        else:
            rows.append((eid, f"2024-02-01 {hour:02d}:00:00", 1, "ns",
                         level + (hour % 4) * 0.25, "{}"))
        eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type",
        "value", "props"
    )

    orig = ts_mod.load_table
    try:
        ts_mod.load_table = lambda s, d, n: ev
        batch = sorted(
            cusum_changepoints(spark, "ignored").collect(), key=lambda r: r.bucket
        )
    finally:
        ts_mod.load_table = orig

    # frozen model exactly as the batch moment pass computes it: count
    # includes the NULL-x hours, the sums skip them
    xs = [r.x for r in batch]
    nn = [v for v in xs if v is not None]
    n = len(xs)
    mu = sum(nn) / n
    sigma = max(sum(v * v for v in nn) / n - mu * mu, 0.0) ** 0.5
    model = {"ns": (mu, CUSUM_K * sigma, CUSUM_H * sigma)}

    half = len(batch) // 2
    mk = lambda r: {"event_type": r.event_type,  # noqa: E731
                    "bucket": r.bucket.isoformat(sep=" "), "x": r.x}
    inp, ckpt = tmp_path / "hourly", tmp_path / "ckpt"
    inp.mkdir()
    with open(inp / "b1.json", "w") as f:
        for r in batch[:half]:
            f.write(json.dumps(mk(r)) + "\n")
    time.sleep(1.1)
    with open(inp / "b2.json", "w") as f:
        for r in batch[half:]:
            f.write(json.dumps(mk(r)) + "\n")
    stream = (
        spark.readStream.schema(HOURLY_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(inp))
    )
    q = (
        cusum_stream(stream, model)
        .writeStream.format("memory")
        .queryName("cusum_nulls")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(120)
    got = {r.bucket: r for r in spark.sql("SELECT * FROM cusum_nulls").collect()}

    assert len(got) == len(batch) == 24
    for b in batch:
        g = got[b.bucket]
        assert (g.x, g.cusum_up, g.cusum_dn, g.is_alarm) == (
            b.x, b.cusum_up, b.cusum_dn, b.is_alarm,
        ), b.bucket
    by_hour = {b: r for b, r in got.items()}
    first = min(by_hour)
    assert by_hour[first].x is None and by_hour[first].cusum_up is None
    assert any(r.is_alarm for r in got.values())  # shift still fires
