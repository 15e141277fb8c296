"""Streaming sessionization twin: native streaming `session_window`
must (a) merge cross-batch events into one session, (b) emit sessions
append-mode only once watermark-final, bit-identical to the batch
`session_events` rows over the same input, and (c) drop
watermark-late events rather than reopening closed sessions."""

import json
import time

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from streamprocessing_with_kafka_spark.functions.numeric import dec_sum
from streamprocessing_with_kafka_spark.streaming.sessionize import sessionized_stream

EV_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)

BATCH1 = [
    # user 0: two events 10 min apart -> one session...
    {"user_id": 0, "ts": "2024-01-01T00:00:00", "value": 1.25},
    {"user_id": 0, "ts": "2024-01-01T00:10:00", "value": 2.5},
    # user 1: a lone event
    {"user_id": 1, "ts": "2024-01-01T00:05:00", "value": 10.0},
]
BATCH2 = [
    # ...EXTENDED cross-batch: 25 min after 00:10 -> still the same
    # session (a per-batch groupBy would wrongly split here)
    {"user_id": 0, "ts": "2024-01-01T00:35:00", "value": -0.75},
    # user 1: exactly gap-width later -> still MERGES (session_window
    # extends through its closing boundary; pins the oracle's strict `>`)
    {"user_id": 1, "ts": "2024-01-01T00:35:00", "value": 0.5},
]
BATCH3 = [
    # watermark flush: pushes event-time far past every session end + delay
    {"user_id": 9, "ts": "2024-01-01T12:00:00", "value": 0.0},
]
BATCH4 = [
    # second flush batch: the 11:00 watermark from BATCH3 is applied and
    # every open session is EVICTED + emitted during this trigger
    {"user_id": 9, "ts": "2024-01-01T13:00:00", "value": 0.0},
]
LATE = [
    # arrives after eviction with watermark >= 11:00 -> dropped; would
    # otherwise re-emit a second (wrong) session row for user 0
    {"user_id": 0, "ts": "2024-01-01T00:45:00", "value": 999.0},
]


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run_stream(spark, tmp_path, name, batches):
    inp, ckpt = tmp_path / "ev", tmp_path / "ckpt"
    inp.mkdir()
    for i, rows in enumerate(batches):
        if i:
            time.sleep(1.1)  # file source orders batches by modification time
        _write(inp / f"b{i}.json", rows)
    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(inp))
    )
    q = (
        sessionized_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    assert q.awaitTermination(120), "stream did not drain"
    return spark.sql(f"SELECT * FROM {name}").collect()


def _batch_sessions(spark, rows):
    ev = spark.createDataFrame(
        [(r["user_id"], r["ts"].replace("T", " "), r["value"]) for r in rows],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dec_sum("value").alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
        .collect()
    )


def _key(rows):
    return sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events, r.total_value)
        for r in rows
    )


def test_streaming_sessions_converge_to_batch(spark, tmp_path):
    got = _run_stream(spark, tmp_path, "sessions_conv", [BATCH1, BATCH2, BATCH3])
    # every emitted session is final => matches the batch operator over the
    # same events, EXCEPT the flush user's session (never watermark-closed)
    want = [r for r in _batch_sessions(spark, BATCH1 + BATCH2 + BATCH3) if r.user_id != 9]
    assert _key(got) == _key(want)
    # the cross-batch merge: user 0's three events are ONE session
    u0 = [r for r in got if r.user_id == 0]
    assert len(u0) == 1 and u0[0].n_events == 3
    # the exact-gap boundary: user 1's second event lands exactly at
    # prev + gap and MERGES -- one session of two events
    u1 = [r for r in got if r.user_id == 1]
    assert len(u1) == 1 and u1[0].n_events == 2


def test_streaming_sessions_drop_watermark_late(spark, tmp_path):
    got = _run_stream(
        spark,
        tmp_path,
        "sessions_late",
        [BATCH1, BATCH2, BATCH3, BATCH4, LATE],
    )
    # the late event must NOT reopen user 0's evicted session or emit a
    # spurious second row for it
    u0 = [r for r in got if r.user_id == 0]
    assert len(u0) == 1 and u0[0].n_events == 3
    assert all(abs(r.total_value) < 100 for r in got)


def test_batch_session_oracle_agrees_on_exact_gap_boundary(spark, tmp_path):
    """Regression for the oracle boundary bug: an event at EXACTLY
    prev + gap merges in Spark's session_window; the DuckDB twin must
    use strict `>` to agree. Planted boundary data -- the sf tables'
    continuous timestamps never hit it."""
    import duckdb

    from streamprocessing_with_kafka_spark.operators.windows import (
        SESSION_EVENTS_SQL,
        session_events,
    )

    ev = _batch_frame(spark)
    d = str(tmp_path / "sf")
    ev.write.parquet(d + "/events.parquet")
    got = _key(session_events(spark, d).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet/*.parquet'"
    )
    want = sorted(
        (u, s.replace(tzinfo=None), e.replace(tzinfo=None), n, v)
        for (u, s, e, n, v) in con.execute(SESSION_EVENTS_SQL).fetchall()
    )
    assert got == want and len(got) == 2  # users 0 and 1, one session each


def _batch_frame(spark):
    rows = [r for r in BATCH1 + BATCH2]
    return spark.createDataFrame(
        [
            (i, r["user_id"], r["ts"].replace("T", " "), "click", r["value"], "{}")
            for i, r in enumerate(rows)
        ],
        "event_id long, user_id long, ts string, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
