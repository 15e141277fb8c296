"""Event-time windowed aggregation in STREAMING mode: watermark-gated
append output -- the late-data semantics the reference entirely lacks
(SURVEY.md §2.6: no windows, no watermarks, no late-data policy)."""

import json

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("ts", TimestampType()),
        StructField("user_id", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_windowed_agg_respects_watermark(spark, tmp_path):
    inp, ckpt = tmp_path / "in", tmp_path / "ckpt"
    inp.mkdir()
    _write(inp / "a.json", [
        {"ts": "2024-01-01 00:01:00", "user_id": "u1", "value": 10.0},
        {"ts": "2024-01-01 00:04:00", "user_id": "u2", "value": 20.0},
        {"ts": "2024-01-01 00:07:00", "user_id": "u1", "value": 5.0},
    ])

    def run_once():
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(inp))
        )
        agg = (
            stream.withWatermark("ts", "1 minute")
            .groupBy(F.window("ts", "5 minutes").alias("w"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(28,10)")).cast("double").alias("total"),
            )
            .select(F.col("w.start").alias("start"), "n", "total")
        )
        emitted = []
        q = (
            agg.writeStream.foreachBatch(
                lambda b, _id: emitted.extend(b.collect())
            )
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {str(r["start"]): (r["n"], r["total"]) for r in emitted}

    first = run_once()
    # watermark reached 00:07 - 1m = 00:06 > window [00:00,00:05) end -> that
    # window is finalized and emitted; [00:05,00:10) is still open
    assert first == {"2024-01-01 00:00:00": (2, 30.0)}

    # late row inside the open window, plus an advancer that closes it
    _write(inp / "b.json", [
        {"ts": "2024-01-01 00:08:00", "user_id": "u3", "value": 1.0},
        {"ts": "2024-01-01 00:20:00", "user_id": "u3", "value": 2.0},
    ])
    second = run_once()
    assert second["2024-01-01 00:05:00"] == (2, 6.0)  # 00:07 + late 00:08
