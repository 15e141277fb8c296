"""Continuous aggregate: incremental merges must equal a from-scratch
batch aggregation at every point, including across restarts."""

import json

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from streamprocessing_with_kafka_spark.streaming.continuous_agg import (
    continuous_rollup_sink,
    read_rollup,
)

SCHEMA = StructType([
    StructField("ts", TimestampType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
])


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run(spark, inp, ckpt, state):
    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(inp))
        .writeStream.foreachBatch(continuous_rollup_sink(spark, str(state)))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _rollup_dict(spark, state):
    return {
        (str(r["bucket"]), r["event_type"]): (r["n"], r["total_value"], round(r["avg_value"], 9))
        for r in read_rollup(spark, str(state)).collect()
    }


def test_incremental_equals_batch_recompute(spark, tmp_path):
    inp, ckpt, state = tmp_path / "in", tmp_path / "ckpt", tmp_path / "state"
    inp.mkdir()
    batch1 = [
        {"ts": "2024-01-01 10:05:00", "event_type": "click", "value": 1.0},
        {"ts": "2024-01-01 10:55:00", "event_type": "click", "value": 2.0},
        {"ts": "2024-01-01 10:30:00", "event_type": "view", "value": 5.0},
    ]
    _write(inp / "a.json", batch1)
    _run(spark, inp, ckpt, state)
    assert _rollup_dict(spark, state) == {
        ("2024-01-01 10:00:00", "click"): (2, 3.0, 1.5),
        ("2024-01-01 10:00:00", "view"): (1, 5.0, 5.0),
    }

    # restart with new data touching an existing bucket AND a new one
    batch2 = [
        {"ts": "2024-01-01 10:59:00", "event_type": "click", "value": 4.0},
        {"ts": "2024-01-01 11:01:00", "event_type": "click", "value": 7.0},
    ]
    _write(inp / "b.json", batch2)
    _run(spark, inp, ckpt, state)

    # must equal a from-scratch aggregation of ALL rows
    allrows = spark.createDataFrame(
        [(r["ts"], r["event_type"], r["value"]) for r in batch1 + batch2],
        "ts string, event_type string, value double",
    ).select(F.to_timestamp("ts").alias("ts"), "event_type", "value")
    expect = {
        (str(r["bucket"]), r["event_type"]): (
            r["n"],
            r["total_value"],
            round(r["avg_value"], 9),
        )
        for r in allrows.groupBy(
            F.window("ts", "1 hour").getField("start").alias("bucket"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(28,10)")).cast("double").alias("total_value"),
            (
                F.sum(F.col("value").cast("decimal(28,10)")) / F.count(F.lit(1))
            ).cast("double").alias("avg_value"),
        )
        .collect()
    }
    assert _rollup_dict(spark, state) == expect
