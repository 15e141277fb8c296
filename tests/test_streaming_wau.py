"""Streaming rolling-WAU must converge to the batch operator for every
report day the batch emits, across multi-batch arrival with replayed
duplicate activity."""

import json

from pyspark.sql import functions as F

from streamprocessing_with_kafka_spark.operators.windows import rolling_wau
from streamprocessing_with_kafka_spark.sources.tables import load_table
from streamprocessing_with_kafka_spark.streaming.wau import wau_updates

EVENT_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def _write_batches(inp, batches):
    inp.mkdir()
    for i, rows in enumerate(batches):
        with open(inp / f"b{i}.json", "w") as f:
            for r in rows:
                d = r.asDict() if hasattr(r, "asDict") else r
                d = dict(d)
                d["ts"] = d["ts"].isoformat()
                f.write(json.dumps(d) + "\n")


def test_streaming_wau_converges_to_batch(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    rows = ev.collect()
    # split into two arrival batches; duplicate a slice of batch 0 into
    # batch 1 to prove the pair-dedup state absorbs replays
    half = len(rows) // 2
    _write_batches(tmp_path / "ev", [rows[:half], rows[half:] + rows[: half // 4]])
    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(tmp_path / "ev"))
    q = (
        wau_updates(stream)
        .writeStream.format("memory")
        .queryName("wau_stream_conv")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain"
    got = {
        r.report_day: r.wau
        for r in spark.table("wau_stream_conv").collect()
    }
    expected = {r.report_day: r.wau for r in rolling_wau(spark, sf_dir).collect()}
    # batch clips report days at the corpus max day; the stream emits
    # the full horizon -- agreement is exact on the batch's domain
    assert expected == {d: got[d] for d in expected}
    assert max(got) > max(expected)  # the unclipped horizon exists
