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
