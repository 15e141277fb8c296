"""Streaming CEP twin: matched purchases must equal the batch
operator's rows exactly -- state (last click / last error) carried
across micro-batches, late replays dropped, negation semantics
identical."""

import json
import time

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from streamprocessing_with_kafka_spark.operators.timeseries import (
    cep_click_purchase,
)
from streamprocessing_with_kafka_spark.sources.tables import load_table
from streamprocessing_with_kafka_spark.streaming.cep import cep_stream

EV_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def _drain(spark, tmp_path, batches, name):
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
        cep_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain"
    return spark.table(name).collect()


def test_cep_state_crosses_batches_and_drops_replays(spark, tmp_path):
    b1 = [
        # user 1: click in batch 1 -- the purchase arrives in batch 2
        {"event_id": 1, "ts": "2024-05-01T10:00:00", "user_id": 1,
         "event_type": "click", "value": 0.0, "props": "{}"},
        # user 2: click then ERROR in batch 1; purchase in batch 2 -> killed
        {"event_id": 2, "ts": "2024-05-01T10:00:00", "user_id": 2,
         "event_type": "click", "value": 0.0, "props": "{}"},
        {"event_id": 3, "ts": "2024-05-01T10:05:00", "user_id": 2,
         "event_type": "error", "value": 0.0, "props": "{}"},
    ]
    b2 = [
        {"event_id": 4, "ts": "2024-05-01T10:10:00", "user_id": 1,
         "event_type": "purchase", "value": 5.0, "props": "{}"},
        {"event_id": 5, "ts": "2024-05-01T10:10:00", "user_id": 2,
         "event_type": "purchase", "value": 5.0, "props": "{}"},
        # replay of user 1's click, below the frontier -> ignored
        {"event_id": 1, "ts": "2024-05-01T10:00:00", "user_id": 1,
         "event_type": "click", "value": 0.0, "props": "{}"},
    ]
    got = _drain(spark, tmp_path, [b1, b2], "cep_planted")
    assert [r.purchase_event_id for r in got] == [4]
    assert got[0].user_id == 1
    assert got[0].gap_us == 10 * 60 * 1_000_000


def test_streaming_cep_converges_to_batch(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    rows = []
    for r in ev.collect():
        d = r.asDict()
        d["ts"] = d["ts"].isoformat()
        rows.append(d)
    half = len(rows) // 2
    got = _drain(spark, tmp_path, [rows[:half], rows[half:]], "cep_conv")
    batch = cep_click_purchase(spark, sf_dir).collect()
    canon = lambda rs: sorted(  # noqa: E731
        (r.user_id, r.purchase_event_id, r.purchase_ts, r.click_ts, r.gap_us)
        for r in rs
    )
    assert canon(got) == canon(batch)
    assert len(batch) > 0  # non-vacuous at this sf
