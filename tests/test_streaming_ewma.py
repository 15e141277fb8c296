"""Streaming EWMA twin: the state-backed incremental operator must
converge BIT-IDENTICALLY (rounded ewma values included) with the batch
`ewma_frame` over the same events when they arrive in order per user,
with the ring state carrying history ACROSS micro-batches, and must drop
late rows below the emitted frontier."""

import json
import time

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from streamprocessing_with_kafka_spark.operators.timeseries import EWMA_LAGS, ewma_frame
from streamprocessing_with_kafka_spark.streaming.ewma import ewma_stream

EV_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)

# user 0 gets MORE than EWMA_LAGS events split across the two batches, so
# the streamed ring both truncates and spans the micro-batch boundary;
# user 1 stays short-history.
_B1_U0 = [
    {"user_id": 0, "event_id": i, "ts": f"2024-01-01T00:0{i}:00", "value": 1.0 + 0.37 * i}
    for i in range(6)
]
BATCH1 = _B1_U0 + [
    {"user_id": 1, "event_id": 100, "ts": "2024-01-01T00:00:30", "value": -4.25},
]
_B2_U0 = [
    {"user_id": 0, "event_id": 6 + i, "ts": f"2024-01-01T01:0{i}:00", "value": 10.0 - 1.3 * i}
    for i in range(EWMA_LAGS)
]
BATCH2 = _B2_U0 + [
    {"user_id": 1, "event_id": 101, "ts": "2024-01-01T00:45:00", "value": 2.125},
    # LATE for user 1: before event 100's frontier -> dropped
    {"user_id": 1, "event_id": 99, "ts": "2024-01-01T00:00:10", "value": 999.0},
]


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_streaming_ewma_converges_to_batch(spark, tmp_path):
    inp, ckpt = tmp_path / "ev", tmp_path / "ckpt"
    inp.mkdir()
    _write(inp / "b1.json", BATCH1)
    time.sleep(1.1)  # file source orders batches by modification time
    _write(inp / "b2.json", BATCH2)
    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(inp))
    )
    q = (
        ewma_stream(stream)
        .writeStream.format("memory")
        .queryName("ewma_streamed")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM ewma_streamed").collect()

    on_time = [r for r in BATCH1 + BATCH2 if r["value"] != 999.0]
    batch = ewma_frame(
        spark.createDataFrame(
            [
                (r["user_id"], r["event_id"], r["ts"].replace("T", " "), r["value"])
                for r in on_time
            ],
            "user_id long, event_id long, ts string, value double",
        ).selectExpr("user_id", "event_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
    ).collect()

    got_map = {r.event_id: r for r in got}
    batch_map = {r.event_id: r for r in batch}
    assert got_map.keys() == batch_map.keys()  # late row dropped, rest emitted
    for eid, g in got_map.items():
        b = batch_map[eid]
        assert (g.user_id, g.ts, g.value) == (b.user_id, b.ts, b.value), eid
        assert g.n_hist == b.n_hist, eid
        assert g.ewma == b.ewma, eid  # bit-identical rounded doubles

    # each event emitted exactly once; ring truncation engaged for user 0
    assert len(got) == len(got_map)
    assert max(r.n_hist for r in got if r.user_id == 0) == EWMA_LAGS


def test_streaming_ewma_null_values_match_batch(spark, tmp_path):
    """NULL-value parity (r9 mixed-nulls twin audit): a NULL value keeps
    its row and its lag POSITION but contributes zero weight -- exactly
    the batch coalesce/CASE arms -- and must not poison the ring state
    for later rows (pre-fix float(None) pushed NaN into the ring). A
    leading all-NULL history emits a NULL ewma (batch den == 0)."""
    rows = [
        {"user_id": 7, "event_id": 0, "ts": "2024-01-01T00:00:00", "value": None},
        {"user_id": 7, "event_id": 1, "ts": "2024-01-01T00:01:00", "value": 4.0},
        {"user_id": 7, "event_id": 2, "ts": "2024-01-01T00:02:00", "value": None},
        {"user_id": 7, "event_id": 3, "ts": "2024-01-01T00:03:00", "value": 2.5},
    ]
    inp, ckpt = tmp_path / "ev", tmp_path / "ckpt"
    inp.mkdir()
    _write(inp / "b1.json", rows[:2])
    time.sleep(1.1)
    _write(inp / "b2.json", rows[2:])
    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(inp))
    )
    q = (
        ewma_stream(stream)
        .writeStream.format("memory")
        .queryName("ewma_nulls")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(120)
    got = {r.event_id: r for r in spark.sql("SELECT * FROM ewma_nulls").collect()}

    batch = {
        r.event_id: r
        for r in ewma_frame(
            spark.createDataFrame(
                [
                    (r["user_id"], r["event_id"], r["ts"].replace("T", " "), r["value"])
                    for r in rows
                ],
                "user_id long, event_id long, ts string, value double",
            ).selectExpr(
                "user_id", "event_id", "CAST(ts AS TIMESTAMP) AS ts", "value"
            )
        ).collect()
    }
    assert got.keys() == batch.keys()
    for eid, g in got.items():
        b = batch[eid]
        assert (g.value, g.n_hist, g.ewma) == (b.value, b.n_hist, b.ewma), eid
    # the NULL-semantics rows, directly:
    assert got[0].ewma is None and got[0].n_hist == 0  # nothing to weight
    assert got[1].ewma == 4.0  # lone non-null lag renormalizes to itself
    assert got[2].value is None and got[2].ewma == 4.0  # NULL row, carry-free
    assert got[3].n_hist == 2  # NULL lags not counted
