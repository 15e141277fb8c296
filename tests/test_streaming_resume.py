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
