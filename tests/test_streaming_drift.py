"""Streaming drift audit: a micro-batch equal to the batch monitor's
second window, scored against a baseline frozen from the first window,
must reproduce profile_drift's audit rows bit-for-bit; types that appear
or vanish flag on the volume ratio."""

import json

from pyspark.sql import functions as F

from streamprocessing_with_kafka_spark.operators.profile import (
    profile_drift_frame,
)
from streamprocessing_with_kafka_spark.sources.tables import load_table
from streamprocessing_with_kafka_spark.streaming.drift import (
    batch_drift_audit,
    drift_audit_sink,
    drift_baseline,
)

EVENT_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def _halves(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    bounds = e.agg(F.min(us).alias("_lo"), F.max(us).alias("_hi")).select(
        F.expr("(_lo + _hi) DIV 2").alias("_cut")
    )
    tagged = e.crossJoin(F.broadcast(bounds)).withColumn("_a", us < F.col("_cut"))
    return tagged.filter("_a").drop("_a", "_cut"), tagged.filter("NOT _a").drop(
        "_a", "_cut"
    )


def _canon(rows):
    return sorted(tuple(r) for r in rows)


def test_batch_audit_matches_profile_drift(spark, sf_dir):
    a, b = _halves(spark, sf_dir)
    audit = batch_drift_audit(b, drift_baseline(a))
    expected = profile_drift_frame(load_table(spark, sf_dir, "events"))
    assert _canon(audit.collect()) == _canon(expected.collect())


def test_appearing_and_vanishing_types_flag_on_ratio(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    base = spark.createDataFrame(
        [(i, t0, 1, "old", 10.0, "{}") for i in range(5)], EVENT_SCHEMA
    )
    batch = spark.createDataFrame(
        [(i, t0, 1, "new", 10.0, "{}") for i in range(5)], EVENT_SCHEMA
    )
    out = {r.event_type: r for r in batch_drift_audit(batch, drift_baseline(base)).collect()}
    assert out["old"].drift_flag and out["old"].n_b == 0
    assert out["new"].drift_flag and out["new"].n_a == 0


def test_streaming_audit_end_to_end(spark, sf_dir, tmp_path):
    a, b = _halves(spark, sf_dir)
    inp, ckpt, audit = tmp_path / "ev", tmp_path / "ckpt", tmp_path / "audit"
    inp.mkdir()
    rows = b.collect()
    with open(inp / "b0.json", "w") as f:
        for r in rows:
            d = r.asDict()
            d["ts"] = d["ts"].isoformat()
            f.write(json.dumps(d) + "\n")
    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(inp))
    q = (
        stream.writeStream.foreachBatch(
            drift_audit_sink(drift_baseline(a), str(audit))
        )
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain"
    got = spark.read.parquet(str(audit)).drop("batch_id")
    expected = profile_drift_frame(load_table(spark, sf_dir, "events"))
    assert _canon(got.collect()) == _canon(expected.collect())
