"""Streaming Holt twin: closed hourly buckets must emit bit-identical
(x, level, trend, forecast) to the batch operator over the same events,
including buckets whose events SPAN micro-batches (the exact-decimal
open-bucket state), and late events for closed buckets must drop."""

import json

from pyspark.sql import functions as F

from streamprocessing_with_kafka_spark.operators.timeseries import holt_forecast
from streamprocessing_with_kafka_spark.sources.tables import load_table
from streamprocessing_with_kafka_spark.streaming.holt import holt_stream

EV_SCHEMA = "event_type STRING, ts TIMESTAMP, value DOUBLE"
SENTINEL_TS = "2030-01-01T00:00:00"


def _run(spark, tmp_path, name, batches):
    import time

    inp, ckpt = tmp_path / "ev", tmp_path / "ckpt"
    inp.mkdir()
    for i, rows in enumerate(batches):
        if i:
            time.sleep(1.1)
        with open(inp / f"b{i}.json", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(inp))
    )
    q = (
        holt_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain"
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_streaming_holt_converges_to_batch(spark, sf_dir, tmp_path):
    rows = sorted(
        (
            {"event_type": r.event_type, "ts": str(r.ts).replace(" ", "T"),
             "value": float(r.value)}
            for r in load_table(spark, sf_dir, "events").collect()
        ),
        key=lambda r: r["ts"],
    )
    # split MID-STREAM so several buckets span micro-batch boundaries
    cut1, cut2 = len(rows) // 3 + 7, 2 * len(rows) // 3 + 3
    types = sorted({r["event_type"] for r in rows})
    flush = [{"event_type": t, "ts": SENTINEL_TS, "value": 0.0} for t in types]
    got = _run(
        spark, tmp_path, "holt_conv",
        [rows[:cut1], rows[cut1:cut2], rows[cut2:], flush],
    )
    streamed = {
        (r.event_type, r.bucket): (r.x, r.level, r.trend, r.forecast)
        for r in got
    }
    want = {
        (r.event_type, r.bucket): (r.x, r.level, r.trend, r.forecast)
        for r in holt_forecast(spark, sf_dir).collect()
    }
    assert streamed == want and streamed  # sentinel buckets never close


def test_streaming_holt_drops_closed_bucket_late_rows(spark, tmp_path):
    base = [
        {"event_type": "t", "ts": f"2024-01-01T{h:02d}:15:00", "value": float(h + 1)}
        for h in range(4)
    ]
    late = [
        # bucket 0 closed when bucket 1 arrived -> must not re-emit or shift
        {"event_type": "t", "ts": "2024-01-01T00:45:00", "value": 999.0},
        {"event_type": "t", "ts": "2024-01-01T09:00:00", "value": 0.0},  # flush
    ]
    got = _run(spark, tmp_path, "holt_late", [base, late])
    xs = {r.bucket.hour: r.x for r in got}
    assert xs == {0: 1.0, 1: 2.0, 2: 3.0, 3: 4.0}, xs


def test_streaming_holt_null_values_match_batch(spark, tmp_path):
    """NULL-value parity (r9 mixed-nulls twin audit): an hour whose
    values are all NULL closes with x = NULL (Spark sum semantics) and
    that NULL lag nulls the next K-1 forecasts, exactly like batch; an
    hour mixing NULL and values sums the non-NULLs. Pre-fix the twin
    raised on NaN -> Decimal quantization at the first NULL value."""
    import pandas as pd  # noqa: F401  (env sanity: twin needs pandas)

    rows = []
    # type "a": 16 hourly buckets; hour 2 is ALL-NULL, hour 5 mixes
    for h in range(16):
        if h == 2:
            rows.append({"event_type": "a", "ts": f"2024-01-01T{h:02d}:10:00",
                         "value": None})
        elif h == 5:
            rows.append({"event_type": "a", "ts": f"2024-01-01T{h:02d}:05:00",
                         "value": None})
            rows.append({"event_type": "a", "ts": f"2024-01-01T{h:02d}:25:00",
                         "value": 5.5})
        else:
            rows.append({"event_type": "a", "ts": f"2024-01-01T{h:02d}:15:00",
                         "value": 1.0 + 0.25 * h})
    flush = [{"event_type": "a", "ts": SENTINEL_TS, "value": 0.0}]
    cut = len(rows) // 2
    got = _run(spark, tmp_path, "holt_nulls", [rows[:cut], rows[cut:] + flush])
    got = [r for r in got if str(r.bucket) < "2030"]

    # batch twin over the same events, via a parquet events table
    d = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(i, r["ts"].replace("T", " "), 1, r["event_type"], r["value"], "{}")
         for i, r in enumerate(rows)],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(
        d + "/events.parquet"
    )
    batch = {str(r.bucket): r for r in holt_forecast(spark, d).collect()}

    assert len(got) == len(batch) == 16
    for g in got:
        b = batch[str(g.bucket)]
        assert (g.x, g.level, g.trend, g.forecast) == (
            b.x, b.level, b.trend, b.forecast,
        ), g.bucket
    by_hour = {r.bucket.hour: r for r in got}
    assert by_hour[2].x is None  # all-NULL hour closes with NULL x
    assert by_hour[5].x == 5.5  # mixed hour sums the non-NULLs
    # hour 13 still has the NULL lag (2) in its 12-window -> no forecast;
    # hour 14 is the first with a clean full window
    assert by_hour[13].forecast is None
    assert by_hour[14].forecast is not None
