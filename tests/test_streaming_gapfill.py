"""Streaming gap-fill twin: the state-backed incremental LOCF must
converge EXACTLY (bit-identical values) with the batch
`gapfill_hourly` over the same events when data arrives in hour order,
and must drop late events below the emitted frontier."""

import json
import time

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from streamprocessing_with_kafka_spark.operators.windows import gapfill_hourly
from streamprocessing_with_kafka_spark.streaming.gapfill import gapfilled_stream

EV_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)

BATCH1 = [
    # user 0: two observed hours with a 2-hour gap between them
    {"user_id": 0, "ts": "2024-01-01T00:10:00", "value": 1.25},
    {"user_id": 0, "ts": "2024-01-01T00:40:00", "value": 2.5},
    {"user_id": 0, "ts": "2024-01-01T03:05:00", "value": -0.75},
    # user 1: single hour
    {"user_id": 1, "ts": "2024-01-01T05:00:00", "value": 10.0},
]
BATCH2 = [
    # user 0: advances 2 hours -> one gap at 04:00 carrying -0.75
    {"user_id": 0, "ts": "2024-01-01T05:30:00", "value": 7.125},
    # user 1: jumps 3 hours -> gaps at 06:00, 07:00 carrying 10.0
    {"user_id": 1, "ts": "2024-01-01T08:59:59", "value": 0.5},
    # LATE: at the frontier bucket already emitted in batch 1 -> dropped
    {"user_id": 1, "ts": "2024-01-01T05:20:00", "value": 999.0},
]


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run_stream(spark, tmp_path, name):
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
        gapfilled_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_streaming_gapfill_converges_to_batch(spark, tmp_path):
    got = _run_stream(spark, tmp_path, "gapfilled")

    # batch twin over the SAME events minus the late (dropped) one
    on_time = [r for r in BATCH1 + BATCH2 if r["value"] != 999.0]
    batch = gapfill_hourly(
        spark.createDataFrame(
            [(r["user_id"], r["ts"].replace("T", " "), r["value"]) for r in on_time],
            "user_id long, ts string, value string",
        ).selectExpr(
            "user_id", "CAST(ts AS TIMESTAMP) AS ts", "CAST(value AS DOUBLE) AS value"
        )
    ).collect()

    key = lambda r: (r.user_id, r.bucket)  # noqa: E731
    got_map = {key(r): r for r in got}
    batch_map = {key(r): r for r in batch}
    assert got_map.keys() == batch_map.keys()
    for k, g in got_map.items():
        b = batch_map[k]
        assert g.is_gap == b.is_gap, k
        assert g.observed_value == b.observed_value, k
        assert g.filled_value == b.filled_value, k  # bit-identical decimals

    # each (user, bucket) emitted exactly once across micro-batches
    assert len(got) == len(got_map)
    # the 2-hour gap for user 0 and the 2 gaps for user 1 materialized
    gaps = sorted((r.user_id, r.bucket.hour) for r in got if r.is_gap)
    assert gaps == [(0, 1), (0, 2), (0, 4), (1, 6), (1, 7)]


def test_streaming_gapfill_state_survives_restart(spark, tmp_path):
    """The per-user frontier lives in the checkpointed state store: a NEW
    query started on the same checkpoint must continue from the frontier
    (no re-emission, no reset) when later files arrive."""
    inp, ckpt, out = tmp_path / "ev", tmp_path / "ckpt", tmp_path / "out"
    inp.mkdir()
    _write(inp / "b1.json", BATCH1)

    def run_once():
        # parquet sink: durable, checkpoint-recoverable (memory sink is not)
        stream = (
            spark.readStream.schema(EV_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(inp))
        )
        q = (
            gapfilled_stream(stream)
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(str(out)).collect()

    first = run_once()
    _write(inp / "b2.json", BATCH2)
    both = run_once()  # fresh query, same checkpoint
    first_keys = {(r.user_id, r.bucket) for r in first}
    second = [r for r in both if (r.user_id, r.bucket) not in first_keys]

    # the restarted query appended only post-restart rows: no (user, bucket)
    # appears twice in the durable sink
    assert len(both) == len({(r.user_id, r.bucket) for r in both}), (
        "frontier reset re-emitted rows"
    )
    emitted_later = {(r.user_id, r.bucket) for r in second}
    emitted_first = first_keys
    assert emitted_first and emitted_later

    # the union still equals the batch twin over all on-time events
    on_time = [r for r in BATCH1 + BATCH2 if r["value"] != 999.0]
    batch = gapfill_hourly(
        spark.createDataFrame(
            [(r["user_id"], r["ts"].replace("T", " "), r["value"]) for r in on_time],
            "user_id long, ts string, value string",
        ).selectExpr(
            "user_id", "CAST(ts AS TIMESTAMP) AS ts", "CAST(value AS DOUBLE) AS value"
        )
    ).collect()
    assert emitted_first | emitted_later == {(r.user_id, r.bucket) for r in batch}
    # gap rows carried the pre-restart LOCF value across the restart
    filled = {(r.user_id, r.bucket): r.filled_value for r in first + second}
    for b in batch:
        assert filled[(b.user_id, b.bucket)] == b.filled_value


NULL_BATCH1 = [
    # user 5: leading ALL-NULL hour (00), then an observed hour (01)
    {"user_id": 5, "ts": "2024-01-01T00:10:00", "value": None},
    {"user_id": 5, "ts": "2024-01-01T01:20:00", "value": 5.0},
    # user 6: one hour mixing NULL and non-NULL -> observed 3.0
    {"user_id": 6, "ts": "2024-01-01T00:00:00", "value": None},
    {"user_id": 6, "ts": "2024-01-01T00:30:00", "value": 3.0},
]
NULL_BATCH2 = [
    # user 5: ALL-NULL hour (02), true gap (03), observed (04)
    {"user_id": 5, "ts": "2024-01-01T02:30:00", "value": None},
    {"user_id": 5, "ts": "2024-01-01T04:40:00", "value": 7.0},
    # user 6: trailing ALL-NULL hour (01) -- must still emit + advance
    {"user_id": 6, "ts": "2024-01-01T01:15:00", "value": None},
]


def test_streaming_gapfill_null_hours_match_batch(spark, tmp_path):
    """NULL-value parity with the batch operator (the r8 gapfill pin's
    semantics, extended to the twin by the r9 mixed-nulls audit): an
    all-NULL hour is a gap that the ignore-nulls carry skips BUT still
    extends the spine and advances the frontier; an hour mixing NULL
    and values is observed; gap rows before any carry emit with filled
    NULL. Pre-fix the twin crashed on NaN->Decimal, dropped trailing
    all-NULL hours, and swallowed carry-less gap rows."""
    inp, ckpt = tmp_path / "ev", tmp_path / "ckpt"
    inp.mkdir()
    _write(inp / "b1.json", NULL_BATCH1)
    time.sleep(1.1)
    _write(inp / "b2.json", NULL_BATCH2)
    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(inp))
    )
    q = (
        gapfilled_stream(stream)
        .writeStream.format("memory")
        .queryName("gapfilled_nulls")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM gapfilled_nulls").collect()

    batch = gapfill_hourly(
        spark.createDataFrame(
            [
                (r["user_id"], r["ts"].replace("T", " "), r["value"])
                for r in NULL_BATCH1 + NULL_BATCH2
            ],
            "user_id long, ts string, value double",
        ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
    ).collect()

    key = lambda r: (r.user_id, r.bucket)  # noqa: E731
    got_map = {key(r): r for r in got}
    batch_map = {key(r): r for r in batch}
    assert got_map.keys() == batch_map.keys()
    for k, g in got_map.items():
        b = batch_map[k]
        assert (g.is_gap, g.observed_value, g.filled_value) == (
            b.is_gap,
            b.observed_value,
            b.filled_value,
        ), k
    # the specific NULL-semantics rows, asserted directly:
    u5 = {r.bucket.hour: r for r in got if r.user_id == 5}
    assert u5[0].is_gap and u5[0].filled_value is None
    assert u5[2].is_gap and u5[2].filled_value == 5.0  # all-NULL hour skipped by carry
    assert u5[3].is_gap and u5[3].filled_value == 5.0
    assert not u5[4].is_gap and u5[4].observed_value == 7.0
    u6 = {r.bucket.hour: r for r in got if r.user_id == 6}
    assert not u6[0].is_gap and u6[0].observed_value == 3.0  # mixed hour observed
    assert u6[1].is_gap and u6[1].filled_value == 3.0  # trailing all-NULL emitted
