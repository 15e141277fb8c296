"""Streaming rolling-WAU: the continuous twin of
operators/windows.rolling_wau, built from two native Structured
Streaming state stores -- no custom state code.

Stage 1 fans each event onto the WAU_WINDOW_DAYS report days it
supports (the bounded explode).  Stage 2: `dropDuplicates([user_id,
report_day])` state emits each (user, report day) support exactly ONCE
across micro-batches -- this is the load-bearing dedup: deduping
(user, ACTIVE day) pairs and counting fan-out rows would overcount a
user active on several days inside one window (a real bug caught by
the convergence test).  Stage 3 is a plain streaming `count()` per
report day, correct exactly because stage 2 guarantees single
delivery.  Replays and repeat activity are absorbed by the same state.

Divergence from batch, by design: the batch operator clips report days
to the corpus max day (a global the stream cannot know); the stream
emits the full horizon and consumers slice.  For report days <= the
observed max day the counts are IDENTICAL
(tests/test_streaming_wau.py).  Production bounds both states with
`withWatermark` on day + dropDuplicatesWithinWatermark -- exactness
over an unbounded past is a batch job's business."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from streamprocessing_with_kafka_spark.operators.windows import (
    WAU_WINDOW_DAYS,
)


def wau_updates(events: DataFrame) -> DataFrame:
    """(report_day, wau) running counts over a streaming events frame."""
    fanned = events.select(
        "user_id",
        F.explode(
            F.sequence(
                F.date_trunc("DAY", F.col("ts")),
                F.date_trunc("DAY", F.col("ts"))
                + F.expr(f"INTERVAL {WAU_WINDOW_DAYS - 1} DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("report_day"),
    )
    supports = fanned.dropDuplicates(["user_id", "report_day"])
    return supports.groupBy("report_day").agg(F.count(F.lit(1)).alias("wau"))
