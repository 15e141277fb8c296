"""Streaming seasonal gate: hourly buckets scored online against the
frozen profile must equal the batch seasonal_anomaly rows exactly,
across multi-batch arrival."""

import json

from pyspark.sql import functions as F

from streamprocessing_with_kafka_spark.operators.timeseries import (
    seasonal_anomaly,
)
from streamprocessing_with_kafka_spark.sources.tables import load_table
from streamprocessing_with_kafka_spark.streaming.seasonal_gate import (
    score_stream,
    seasonal_profile_model,
)

BUCKET_SCHEMA = "event_type STRING, bucket TIMESTAMP, x DOUBLE"


def test_streaming_gate_converges_to_batch(spark, sf_dir, tmp_path):
    profile = seasonal_profile_model(spark, sf_dir).localCheckpoint()
    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.sum(F.col("value").cast("decimal(28,10)"))
            .cast("double")
            .alias("x")
        )
        .collect()
    )
    inp, ckpt = tmp_path / "buckets", tmp_path / "ck"
    inp.mkdir()
    per = max(1, len(hourly) // 3)
    for b in range(3):
        chunk = hourly[b * per :] if b == 2 else hourly[b * per : (b + 1) * per]
        with open(inp / f"b{b}.json", "w") as f:
            for r in chunk:
                f.write(
                    json.dumps(
                        {
                            "event_type": r.event_type,
                            "bucket": str(r.bucket),
                            "x": r.x,
                        }
                    )
                    + "\n"
                )
    stream = spark.readStream.schema(BUCKET_SCHEMA).json(str(inp))
    q = (
        score_stream(stream, profile)
        .writeStream.format("memory")
        .queryName("seasonal_stream")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain"
    streamed = {
        (r.event_type, r.bucket): (r.x, r.z, r.is_anomaly)
        for r in spark.sql("SELECT * FROM seasonal_stream").collect()
    }
    batch = {
        (r.event_type, r.bucket): (r.x, r.z, r.is_anomaly)
        for r in seasonal_anomaly(spark, sf_dir).collect()
    }
    assert streamed == batch and streamed
