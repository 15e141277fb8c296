"""Kill-and-resume checkpoint recovery (r6 verdict item 6): for the
stateful streaming twins with cross-batch state, stopping the query
mid-stream and RESTARTING a new query from the same checkpoint must
produce exactly the output of an uninterrupted run -- the stateful
equivalent of the reference's resume-after-failure delivery story
(/root/reference/src/app/order_validator.py:373-375, auto-commit resume
from the last committed offset).

Each case runs the same input twice:
  - uninterrupted: all batch files present, ONE query drains them;
  - resumed: stage 1 drains the first file(s) and stops (the "kill" --
    availableNow terminates exactly at a batch boundary, which is the
    recovery point checkpointing guarantees), then later files are
    written and a NEW query object restarts from the SAME checkpoint.

The assertions are chosen so they can only pass if operator STATE (not
just source offsets) survived the restart: a Bloom filter that forgot
its bits would stop flagging duplicates, a session store that lost its
open windows would split the cross-restart session, a CUSUM that lost
its running sums would restart the drift ramp at zero.
"""

import json
import time

import pytest

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _drain(spark, build_query, inp, ckpt, out):
    """Start -> availableNow-drain -> stop, into a DURABLE parquet sink
    (the memory sink refuses checkpoint recovery; the file sink is the
    fault-tolerant path, with _spark_metadata carrying exactly-once)."""
    q = (
        build_query(spark, str(inp))
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain"


def _run_both(spark, tmp_path, build_query, batches, split, key):
    """Uninterrupted run vs staged run with a restart after `split`
    files; returns (uninterrupted_rows, resumed_rows) keyed/sorted."""
    flat = tmp_path / "flat"
    flat.mkdir()
    for i, rows in enumerate(batches):
        if i:
            time.sleep(1.1)  # file source orders batches by mtime
        _write(flat / f"b{i}.json", rows)
    flat_out = tmp_path / "out_flat"
    _drain(spark, build_query, flat, tmp_path / "ckpt_flat", flat_out)
    uninterrupted = spark.read.parquet(str(flat_out)).collect()

    staged = tmp_path / "staged"
    staged.mkdir()
    ckpt, out = tmp_path / "ckpt_staged", tmp_path / "out_staged"
    for i, rows in enumerate(batches[:split]):
        if i:
            time.sleep(1.1)
        _write(staged / f"b{i}.json", rows)
    _drain(spark, build_query, staged, ckpt, out)
    # the query object is gone; only the checkpoint carries state now
    for i, rows in enumerate(batches[split:]):
        time.sleep(1.1)
        _write(staged / f"b{split + i}.json", rows)
    _drain(spark, build_query, staged, ckpt, out)
    resumed = spark.read.parquet(str(out)).collect()
    return sorted(uninterrupted, key=key), sorted(resumed, key=key)


# ---------------------------------------------------------------- bloom


def test_bloom_dedup_filter_state_survives_restart(spark, tmp_path):
    from streamprocessing_with_kafka_spark.streaming.bloom_dedup import (
        streaming_bloom_dedup,
    )
    from streamprocessing_with_kafka_spark.streaming.curation import (
        file_document_stream,
    )

    def doc(i, text):
        return {
            "doc_id": i,
            "text": text,
            "lang": "en",
            "source": "s",
            "n_chars": len(text),
        }

    originals = [doc(i, f"the quick document number {i} walks") for i in range(20)]
    # batch 2: exact copies of 10 originals (new doc_ids) + 5 fresh docs
    dups = [doc(100 + i, originals[i]["text"]) for i in range(10)]
    fresh = [doc(200 + i, f"an entirely fresh document {i}") for i in range(5)]

    def build(spark_, path):
        return streaming_bloom_dedup(file_document_stream(spark_, path))

    flat, resumed = _run_both(
        spark,
        tmp_path,
        build,
        [originals, dups + fresh],
        split=1,
        key=lambda r: r.doc_id,
    )
    assert [r.asDict() for r in flat] == [r.asDict() for r in resumed]
    flags = {r.doc_id: r.is_dup for r in resumed}
    # state proof: post-restart copies of PRE-restart docs still flagged
    assert all(flags[100 + i] for i in range(10))
    assert not any(flags[200 + i] for i in range(5))
    assert not any(flags[i] for i in range(20))


# ------------------------------------------------------------ sessions


def test_session_window_state_survives_restart(spark, tmp_path):
    from streamprocessing_with_kafka_spark.streaming.sessionize import (
        sessionized_stream,
    )

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("value", DoubleType()),
        ]
    )

    b1 = [
        {"user_id": 0, "ts": "2024-01-01T00:00:00", "value": 1.25},
        {"user_id": 0, "ts": "2024-01-01T00:10:00", "value": 2.5},
        {"user_id": 1, "ts": "2024-01-01T00:05:00", "value": 10.0},
    ]
    # user 0's 00:35 event falls INSIDE the 30-min gap after 00:10: the
    # open session in the restored state store must EXTEND, not split
    b2 = [
        {"user_id": 0, "ts": "2024-01-01T00:35:00", "value": -0.75},
        {"user_id": 1, "ts": "2024-01-01T02:00:00", "value": 0.5},
    ]
    # two flush batches: advance then APPLY the watermark so every
    # session is evicted + emitted before the final drain ends
    b3 = [{"user_id": 9, "ts": "2024-01-01T12:00:00", "value": 0.0}]
    b4 = [{"user_id": 9, "ts": "2024-01-01T13:00:00", "value": 0.0}]

    def build(spark_, path):
        stream = (
            spark_.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(path)
        )
        return sessionized_stream(stream)

    flat, resumed = _run_both(
        spark,
        tmp_path,
        build,
        [b1, b2, b3, b4],
        split=1,
        key=lambda r: (r.user_id, r.session_start),
    )
    assert [r.asDict() for r in flat] == [r.asDict() for r in resumed]
    sessions = {
        (r.user_id, r.session_start.isoformat(sep=" ")): r for r in resumed
    }
    merged = sessions[(0, "2024-01-01 00:00:00")]
    assert merged.n_events == 3  # 00:00 + 00:10 (pre-kill) + 00:35 (post)
    assert merged.session_end.isoformat(sep=" ") == "2024-01-01 01:05:00"


# --------------------------------------------------------------- cusum


def test_cusum_running_sums_survive_restart(spark, tmp_path):
    from streamprocessing_with_kafka_spark.streaming.cusum import cusum_stream

    schema = StructType(
        [
            StructField("event_type", StringType()),
            StructField("bucket", TimestampType()),
            StructField("x", DoubleType()),
        ]
    )
    # level 5 for 12 buckets, then a +4.5 shift: the post-restart alarm
    # height depends on sums accumulated PRE-restart
    rows = [
        {
            "event_type": "drift",
            "bucket": f"2024-02-01 {h:02d}:00:00",
            "x": 5.0 if h < 12 else 9.5,
        }
        for h in range(20)
    ]
    model = {"drift": (5.0, 0.25, 1.0)}  # (mu, k, h): low bar, fires fast

    def build(spark_, path):
        stream = (
            spark_.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(path)
        )
        return cusum_stream(stream, model)

    # split INSIDE the drift ramp: buckets 0-13 before the kill (two
    # alarmed buckets already), 14-19 after
    flat, resumed = _run_both(
        spark,
        tmp_path,
        build,
        [rows[:10], rows[10:14], rows[14:]],
        split=2,
        key=lambda r: r.bucket,
    )
    assert [r.asDict() for r in flat] == [r.asDict() for r in resumed]
    by_bucket = {r.bucket.hour: r for r in resumed}
    assert len(by_bucket) == 20
    # the ramp keeps RISING monotonically across the restart boundary --
    # a reset state store would restart the cusum from 0 at hour 14
    ramp = [by_bucket[h].cusum_up for h in range(12, 20)]
    assert all(b > a for a, b in zip(ramp, ramp[1:]))
    assert by_bucket[19].is_alarm


# ------------------------------------------------------------- minhash


def test_minhash_bucket_membership_survives_restart(spark, tmp_path):
    from streamprocessing_with_kafka_spark.streaming.curation import (
        file_document_stream,
    )
    from streamprocessing_with_kafka_spark.streaming.minhash_dedup import (
        streaming_minhash_candidates,
    )

    def doc(i, text):
        return {
            "doc_id": i,
            "text": text,
            "lang": "en",
            "source": "s",
            "n_chars": len(text),
        }

    texts = [
        "the quick brown fox jumps over the lazy dog tonight",
        "pack my box with five dozen liquor jugs again today",
        "sphinx of black quartz judge my vow every single time",
        "how vexingly quick daft zebras jump around the garden",
        "bright vixens jump while dozy fowl quack in the yard",
    ]
    originals = [doc(i, t) for i, t in enumerate(texts)]
    # post-restart EXACT COPIES of pre-restart docs: their candidate
    # pairs exist only if the (band, band_key) membership lists written
    # before the kill are still in the restored state store
    copies = [doc(100 + i, t) for i, t in enumerate(texts)]
    fresh = [
        doc(200 + j, f"completely unrelated fresh document number {j} here")
        for j in range(3)
    ]

    def build(spark_, path):
        return streaming_minhash_candidates(file_document_stream(spark_, path))

    flat, resumed = _run_both(
        spark,
        tmp_path,
        build,
        [originals, copies + fresh],
        split=1,
        key=lambda r: (r.band, r.doc_a, r.doc_b),
    )
    assert [r.asDict() for r in flat] == [r.asDict() for r in resumed]
    pairs = {(r.doc_a, r.doc_b) for r in resumed}
    # state proof: every copy pairs with its pre-restart original (exact
    # copies share ALL bands; one surviving bucket suffices per pair)
    assert all((i, 100 + i) in pairs for i in range(5))


# ----------------------------------------------------------- count-min


def test_count_min_counters_survive_restart(spark, tmp_path):
    """The CM twin's state is the cell counters themselves (groupBy
    aggregation state).  Complete-mode snapshots land in a durable sink
    via foreachBatch (the recoverable path for non-append sinks); the
    final snapshot after a mid-stream restart must carry counts from
    BOTH sides of the boundary -- a reset store would serve post-restart
    token counts only."""
    from streamprocessing_with_kafka_spark.streaming.count_min import (
        estimate_from_cells,
        streaming_cm_cells,
    )

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    b1 = [
        {"doc_id": 0, "text": "drift drift drift common"},
        {"doc_id": 1, "text": "drift drift drift common common common"},
    ]
    b2 = [
        {"doc_id": 2, "text": "drift drift common common"},
        {"doc_id": 3, "text": "common common common fresh fresh fresh"},
    ]
    exact = {"drift": 8, "common": 9, "fresh": 3}

    def drain_snapshots(inp, ckpt, snap):
        def write_snap(df, _epoch):
            df.write.mode("overwrite").parquet(str(snap))

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(inp))
        )
        q = (
            streaming_cm_cells(stream)
            .writeStream.foreachBatch(write_snap)
            .option("checkpointLocation", str(ckpt))
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180), "stream did not drain"

    flat = tmp_path / "flat"
    flat.mkdir()
    _write(flat / "b0.json", b1)
    time.sleep(1.1)
    _write(flat / "b1.json", b2)
    drain_snapshots(flat, tmp_path / "ckpt_flat", tmp_path / "snap_flat")

    staged = tmp_path / "staged"
    staged.mkdir()
    ckpt, snap = tmp_path / "ckpt_staged", tmp_path / "snap_staged"
    _write(staged / "b0.json", b1)
    drain_snapshots(staged, ckpt, snap)  # stage 1, then the "kill"
    time.sleep(1.1)
    _write(staged / "b1.json", b2)
    drain_snapshots(staged, ckpt, snap)  # NEW query, same checkpoint

    cells = lambda p: {  # noqa: E731
        (r.d, r.idx): r.counter for r in spark.read.parquet(str(p)).collect()
    }
    assert cells(tmp_path / "snap_flat") == cells(snap)

    probes = spark.createDataFrame([(t,) for t in exact], "term string")
    est = {
        r.term: r.cm_estimate
        for r in estimate_from_cells(
            spark.read.parquet(str(snap)), probes
        ).collect()
    }
    # tiny vocab in 4096 cells: no collisions, estimates are exact --
    # drift=8 spans the restart (6 pre + 2 post); 2 would mean reset state
    assert est == exact


# ---------------------------------------------------------------- ewma


def test_ewma_ring_state_survives_restart(spark, tmp_path):
    """The EWMA twin's state is the last K-1 values per user (the ring
    that makes the truncated formulation O(K)); the first post-restart
    row's n_hist can only be K if the pre-restart ring was restored."""
    from streamprocessing_with_kafka_spark.operators.timeseries import EWMA_LAGS
    from streamprocessing_with_kafka_spark.streaming.ewma import ewma_stream

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("value", DoubleType()),
        ]
    )
    rows = [
        {
            "user_id": 0,
            "event_id": i,
            "ts": f"2024-03-01T00:{i:02d}:00",
            "value": float(3 * i + 1) / 8.0,
        }
        for i in range(12)
    ]

    def build(spark_, path):
        stream = (
            spark_.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(path)
        )
        return ewma_stream(stream)

    # split at event 8: the ring holds events 1-7 (K-1 = 7 values) at the
    # kill, so event 8's window is full-depth immediately on resume
    flat, resumed = _run_both(
        spark,
        tmp_path,
        build,
        [rows[:8], rows[8:]],
        split=1,
        key=lambda r: r.event_id,
    )
    assert [r.asDict() for r in flat] == [r.asDict() for r in resumed]
    by_event = {r.event_id: r for r in resumed}
    assert len(by_event) == 12
    # state proof: a reset ring would restart history at the boundary
    # (n_hist == 1 for event 8); the restored ring keeps full depth
    assert by_event[8].n_hist == EWMA_LAGS
    assert by_event[0].n_hist == 1


# ---------------------------------------------------------------- holt


def test_holt_ring_and_open_bucket_sum_survive_restart(spark, tmp_path):
    """The Holt twin's state is the closed-bucket ring PLUS the open
    bucket's exact Decimal partial sum. Split INSIDE an open bucket: its
    emitted x must combine value parts from both sides of the restart,
    and post-restart buckets keep non-null level/trend only because the
    pre-restart ring (>= HOLT_LAGS - 1 closed buckets) was restored."""
    from streamprocessing_with_kafka_spark.operators.timeseries import (
        HOLT_HORIZON,
        HOLT_LAGS,
    )
    from streamprocessing_with_kafka_spark.streaming.holt import holt_stream

    schema = StructType(
        [
            StructField("event_type", StringType()),
            StructField("ts", TimestampType()),
            StructField("value", DoubleType()),
        ]
    )

    def ev(h, minute, v):
        return {
            "event_type": "t",
            "ts": f"2024-04-01 {h:02d}:{minute:02d}:00",
            "value": v,
        }

    # hours 0..11 close pre-kill (= HOLT_LAGS closed buckets in the
    # ring); hour 12 is OPEN at the kill with a partial sum of 5.25
    b1 = [ev(h, 0, float(h) + 0.5) for h in range(12)] + [ev(12, 10, 5.25)]
    # post-restart: hour 12 gains a second part, then hours 13..15 close
    # every earlier bucket
    b2 = [ev(12, 40, 7.0)] + [ev(h, 0, float(h) + 0.5) for h in range(13, 16)]

    def build(spark_, path):
        stream = (
            spark_.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(path)
        )
        return holt_stream(stream)

    flat, resumed = _run_both(
        spark, tmp_path, build, [b1, b2], split=1, key=lambda r: r.bucket
    )
    assert [r.asDict() for r in flat] == [r.asDict() for r in resumed]
    by_hour = {r.bucket.hour: r for r in resumed}
    assert sorted(by_hour) == list(range(15))  # hour 15 still open at end
    # open-bucket proof: hour 12's x sums the pre-kill 5.25 AND the
    # post-restart 7.0 -- a reset open_sum would emit 7.0
    assert by_hour[12].x == 12.25
    # ring proof: hour 12 closes with a full 12-bucket window (hours
    # 1..12) -- null level here would mean the ring was lost, and the
    # VALUES must equal _holt_row applied to the true closed-x window
    # (independent of any restored state): a garbage ring that happens
    # to be full-depth still fails here
    from streamprocessing_with_kafka_spark.streaming.holt import _holt_row

    true_x = [float(h) + 0.5 for h in range(12)]  # hours 0..11 closed
    assert (
        by_hour[11].level,
        by_hour[11].trend,
        by_hour[11].forecast,
    ) == _holt_row(true_x)
    assert (
        by_hour[12].level,
        by_hour[12].trend,
        by_hour[12].forecast,
    ) == _holt_row(true_x[1:] + [12.25])  # hours 1..11 + the split bucket
    assert by_hour[12].level is not None
    assert len(flat) == 15 and HOLT_LAGS == 12 and HOLT_HORIZON == 3


# ------------------------------------------------------------- gapfill


def test_gapfill_frontier_survives_restart(spark, tmp_path):
    """The gapfill twin's state is (frontier_hour, last_value). An event
    arriving AFTER the restart, hours past the frontier, must fill the
    intervening gap rows with the PRE-restart last observed value -- a
    reset frontier would treat it as the series start and emit no gaps."""
    from streamprocessing_with_kafka_spark.streaming.gapfill import (
        gapfilled_stream,
    )

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("value", DoubleType()),
        ]
    )
    b1 = [
        {"user_id": 7, "ts": "2024-05-01 00:30:00", "value": 10.0},
        {"user_id": 7, "ts": "2024-05-01 01:15:00", "value": 20.0},
        {"user_id": 7, "ts": "2024-05-01 02:45:00", "value": 30.0},
    ]
    b2 = [{"user_id": 7, "ts": "2024-05-01 06:05:00", "value": 60.0}]

    def build(spark_, path):
        stream = (
            spark_.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(path)
        )
        return gapfilled_stream(stream)

    flat, resumed = _run_both(
        spark, tmp_path, build, [b1, b2], split=1, key=lambda r: r.bucket
    )
    assert [r.asDict() for r in flat] == [r.asDict() for r in resumed]
    by_hour = {r.bucket.hour: r for r in resumed}
    assert sorted(by_hour) == [0, 1, 2, 3, 4, 5, 6]
    # frontier proof: hours 3-5 are synthesized gap rows carrying the
    # pre-restart last_value (30.0), emitted by the post-restart batch
    for h in (3, 4, 5):
        assert by_hour[h].is_gap and by_hour[h].filled_value == 30.0
        assert by_hour[h].observed_value is None
    assert not by_hour[6].is_gap and by_hour[6].filled_value == 60.0


# ------------------------------------------------- update-mode snapshots


def _drain_snapshots(spark, build_query, inp, ckpt, out, mode):
    """Drain an update/complete-mode twin into an append-only parquet log
    via foreachBatch (the recoverable path for non-append sinks);
    consumers take the latest snapshot per key."""

    def write_batch(df, _epoch):
        df.write.mode("append").parquet(str(out))

    q = (
        build_query(spark, str(inp))
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", str(ckpt))
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain"


def _run_both_snapshots(spark, tmp_path, build_query, batches, split, mode):
    """_run_both for update/complete-mode twins: returns the two parquet
    logs as (uninterrupted_rows, resumed_rows), unsorted."""
    flat = tmp_path / "flat"
    flat.mkdir()
    for i, rows in enumerate(batches):
        if i:
            time.sleep(1.1)
        _write(flat / f"b{i}.json", rows)
    _drain_snapshots(
        spark, build_query, flat, tmp_path / "ckpt_flat", tmp_path / "log_flat", mode
    )

    staged = tmp_path / "staged"
    staged.mkdir()
    ckpt, out = tmp_path / "ckpt_staged", tmp_path / "log_staged"
    for i, rows in enumerate(batches[:split]):
        if i:
            time.sleep(1.1)
        _write(staged / f"b{i}.json", rows)
    _drain_snapshots(spark, build_query, staged, ckpt, out, mode)
    for i, rows in enumerate(batches[split:]):
        time.sleep(1.1)
        _write(staged / f"b{split + i}.json", rows)
    _drain_snapshots(spark, build_query, staged, ckpt, out, mode)

    return (
        spark.read.parquet(str(tmp_path / "log_flat")).collect(),
        spark.read.parquet(str(out)).collect(),
    )


# ------------------------------------------------------------ reservoir


def test_reservoir_pool_survives_restart(spark, tmp_path):
    """The sampler's state is each stratum's K smallest md5-ranked
    (rank_key, doc_id) pairs. The final snapshot after a restart must be
    the bottom-K over BOTH sides of the boundary -- equal to the batch
    operator's deterministic answer over all docs; a reset pool would
    sample only post-restart arrivals (and report n_seen = 10, not 20)."""
    from pyspark.sql import functions as F

    from streamprocessing_with_kafka_spark.streaming.curation import (
        file_document_stream,
    )
    from streamprocessing_with_kafka_spark.streaming.reservoir import (
        streaming_stratified_sample,
    )

    def doc(i):
        return {
            "doc_id": i,
            "text": f"document body {i}",
            "lang": "en",
            "source": "s",
            "n_chars": 20,
        }

    K = 3
    b1 = [doc(i) for i in range(10)]
    b2 = [doc(i) for i in range(10, 20)]

    def build(spark_, path):
        return streaming_stratified_sample(file_document_stream(spark_, path), k=K)

    flat, resumed = _run_both_snapshots(
        spark, tmp_path, build, [b1, b2], split=1, mode="update"
    )

    def final_sample(rows):
        hi = max(r.n_seen for r in rows)
        return sorted(
            (r.doc_id, r.sample_rank) for r in rows if r.n_seen == hi
        ), hi

    flat_final, flat_seen = final_sample(flat)
    res_final, res_seen = final_sample(resumed)
    assert flat_final == res_final
    assert flat_seen == res_seen == 20
    # the definitional contract: identical to the batch rank over ALL 20
    # docs (state proof -- 7 of the bottom-3 candidates arrived pre-kill)
    expected = [
        (r.doc_id, i + 1)
        for i, r in enumerate(
            spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
            .select(
                "doc_id",
                F.md5(
                    F.concat(F.lit("strat|"), F.col("doc_id").cast("string"))
                ).alias("rk"),
            )
            .orderBy("rk")
            .limit(K)
            .collect()
        )
    ]
    assert res_final == sorted(expected)


# -------------------------------------------------------- heavy hitters


def test_spacesaving_counters_survive_restart(spark, tmp_path):
    """The SpaceSaving twin's state is the per-shard counter table. With
    capacity >= vocabulary the sketch is exact, so the final snapshot's
    est_count for a token seen on both sides of the restart must be the
    TOTAL -- post-restart-only counts would mean the counters reset."""
    from streamprocessing_with_kafka_spark.streaming.curation import (
        file_document_stream,
    )
    from streamprocessing_with_kafka_spark.streaming.heavy_hitters import (
        streaming_heavy_hitters,
    )

    def doc(i, text):
        return {
            "doc_id": i,
            "text": text,
            "lang": "en",
            "source": "s",
            "n_chars": len(text),
        }

    b1 = [
        doc(0, "alpha alpha alpha beta gamma"),
        doc(1, "alpha beta beta gamma gamma gamma"),
    ]
    b2 = [
        doc(2, "alpha alpha beta gamma"),
        doc(3, "delta delta epsilon"),
    ]
    exact = {"alpha": 6, "beta": 4, "gamma": 5, "delta": 2, "epsilon": 1}

    def build(spark_, path):
        return streaming_heavy_hitters(
            file_document_stream(spark_, path), capacity=64
        )

    flat, resumed = _run_both_snapshots(
        spark, tmp_path, build, [b1, b2], split=1, mode="update"
    )

    def final_counts(rows):
        # latest snapshot PER SHARD = rows at that shard's max total
        hi = {}
        for r in rows:
            hi[r.shard] = max(hi.get(r.shard, 0), r.shard_total)
        return {
            r.token: r.est_count for r in rows if r.shard_total == hi[r.shard]
        }

    assert final_counts(flat) == final_counts(resumed) == exact


# ------------------------------------------------------------------ wau


def test_wau_dedup_store_survives_restart(spark, tmp_path):
    """The WAU twin's load-bearing state is the dropDuplicates([user_id,
    report_day]) store: a user re-appearing AFTER the restart on a day
    they already supported must NOT increment the count. A reset store
    double-counts user 1 (wau=3 on their report days); the restored one
    keeps wau=2 and matches the uninterrupted run exactly."""
    from streamprocessing_with_kafka_spark.streaming.wau import wau_updates

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
        ]
    )
    b1 = [
        {"user_id": 1, "ts": "2024-06-03 08:00:00"},
        {"user_id": 2, "ts": "2024-06-03 09:00:00"},
    ]
    # user 1 again on the SAME day (pure replay for the dedup store),
    # plus a fresh user on the same day
    b2 = [
        {"user_id": 1, "ts": "2024-06-03 17:00:00"},
        {"user_id": 3, "ts": "2024-06-03 18:00:00"},
    ]

    def build(spark_, path):
        stream = (
            spark_.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(path)
        )
        return wau_updates(stream)

    flat, resumed = _run_both_snapshots(
        spark, tmp_path, build, [b1, b2], split=1, mode="complete"
    )

    def final_wau(rows):
        # complete-mode log: the final snapshot is the last full emission;
        # reconstruct it as max wau per report_day of the LAST epoch ==
        # max over the log (wau is monotone under complete mode here)
        out = {}
        for r in rows:
            d = r.report_day.date().isoformat()
            out[d] = max(out.get(d, 0), r.wau)
        return out

    flat_final, res_final = final_wau(flat), final_wau(resumed)
    assert flat_final == res_final
    # all three users support 2024-06-03's window; user 1's replay must
    # not have re-counted
    assert res_final["2024-06-03"] == 3
    assert all(v == 3 for v in res_final.values())


# ---------------------------------------------------------- attribution


def test_attribution_last_click_survives_restart(spark, tmp_path):
    """The attribution twin's state is one long per user: the latest
    click's microsecond stamp. A purchase arriving AFTER the restart
    must credit a click seen BEFORE it -- a reset store would leave
    last_click_us at -1 and emit attributed=false."""
    from streamprocessing_with_kafka_spark.streaming.attribution import (
        attribution_stream,
    )

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )

    def ev(eid, t, uid, typ, v=1.0):
        return {
            "event_id": eid,
            "ts": f"2024-07-01 {t}",
            "user_id": uid,
            "event_type": typ,
            "value": v,
            "props": "{}",
        }

    # user 1 clicks pre-kill; user 2 never clicks (control)
    b1 = [ev(1, "10:00:00", 1, "click"), ev(2, "10:01:00", 2, "view")]
    # both purchase post-restart, 30 min later (inside the 24h horizon)
    b2 = [
        ev(10, "10:30:00", 1, "purchase", 25.0),
        ev(11, "10:31:00", 2, "purchase", 9.0),
    ]

    def build(spark_, path):
        stream = (
            spark_.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(path)
        )
        return attribution_stream(stream)

    flat, resumed = _run_both(
        spark, tmp_path, build, [b1, b2], split=1, key=lambda r: r.event_id
    )
    assert [r.asDict() for r in flat] == [r.asDict() for r in resumed]
    by_event = {r.event_id: r for r in resumed}
    # state proof: the post-restart purchase credits the pre-kill click
    assert by_event[10].attributed
    assert by_event[10].since_click_us == 30 * 60 * 1_000_000
    assert not by_event[11].attributed


# ------------------------------------------------------------------ cep


def test_cep_click_and_error_stamps_survive_restart(spark, tmp_path):
    """The CEP twin's state is two longs per user (latest click, latest
    error). Post-restart purchases must match/block on PRE-restart
    stamps: user 1's click admits the match, user 2's newer error vetoes
    it -- a reset store would emit no match for either (and never a
    spurious one)."""
    from streamprocessing_with_kafka_spark.streaming.cep import cep_stream

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )

    def ev(eid, t, uid, typ):
        return {
            "event_id": eid,
            "ts": f"2024-07-02 {t}",
            "user_id": uid,
            "event_type": typ,
            "value": 1.0,
            "props": "{}",
        }

    b1 = [
        ev(1, "09:00:00", 1, "click"),
        ev(2, "09:00:00", 2, "click"),
        ev(3, "09:05:00", 2, "error"),  # newer than user 2's click
    ]
    # purchases 20 min after the clicks (inside the 30-min CEP window)
    b2 = [ev(10, "09:20:00", 1, "purchase"), ev(11, "09:20:00", 2, "purchase")]

    def build(spark_, path):
        stream = (
            spark_.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(path)
        )
        return cep_stream(stream)

    flat, resumed = _run_both(
        spark,
        tmp_path,
        build,
        [b1, b2],
        split=1,
        key=lambda r: (r.user_id, r.purchase_event_id),
    )
    assert [r.asDict() for r in flat] == [r.asDict() for r in resumed]
    matches = {(r.user_id, r.purchase_event_id) for r in resumed}
    assert (1, 10) in matches  # pre-kill click credits post-restart buy
    assert (2, 11) not in matches  # pre-kill error still vetoes
    assert len(matches) == 1
