"""Streaming seasonal-anomaly gate: score arriving hourly buckets
against the FROZEN same-hour-of-week profile -- the monitoring twin of
`operators/timeseries.seasonal_anomaly`, in the frozen-model ingest
family (`drift`, `cusum`, `dsir_gate`, `phash_ingest`): fit offline,
freeze, apply to arriving data with pure expressions.

Input contract is the HOURLY BUCKET stream (event_type, bucket, x) --
the shape `continuous_agg` maintains -- so the gate itself is a
stream-static broadcast join plus fixed-order double arithmetic: no
state, no shuffle of the stream, no Python.  Scoring reuses the exact
z formula and NULL guards of the batch operator (shared helper), so a
bucket scores IDENTICALLY online and in the nightly batch audit --
convergence is definitional, and pinned in
tests/test_streaming_seasonal.py across multi-batch arrival.

The profile deliberately does NOT update online: a profile that learns
from the anomaly it is scoring stops flagging it (the same
frozen-between-refits argument as the CUSUM and drift twins)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from streamprocessing_with_kafka_spark.functions.numeric import DEC
from streamprocessing_with_kafka_spark.operators.timeseries import (
    seasonal_score,
)
from streamprocessing_with_kafka_spark.sources.tables import load_table


def seasonal_profile_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frozen (event_type, dow, hr) profile moments, built with the
    SAME hourly rollup + decimal moment sums as the batch operator."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(F.sum(F.col("value").cast(DEC)).cast("double").alias("x"))
    keyed = _with_cell_key(hourly)
    return keyed.groupBy("event_type", "dow", "hr").agg(
        F.count(F.lit(1)).alias("n_weeks"),
        F.sum(F.col("x").cast(DEC)).cast("double").alias("sx"),
        F.sum(
            (F.col("x").cast(DEC) * F.col("x").cast(DEC)).cast("decimal(38,10)")
        )
        .cast("double")
        .alias("sxx"),
    )


def _with_cell_key(buckets: DataFrame) -> DataFrame:
    dow = (
        F.expr("unix_micros(CAST(bucket AS TIMESTAMP)) div 86400000000")
        + F.lit(3)
    ) % F.lit(7)
    return buckets.select(
        "*", dow.alias("dow"), F.hour("bucket").alias("hr")
    )


def score_stream(buckets: DataFrame, profile: DataFrame) -> DataFrame:
    """(event_type, bucket, x, z, is_anomaly) for a streaming hourly-
    bucket frame against the frozen profile -- the batch operator's
    scorer applied verbatim (one code path, two execution modes)."""
    return seasonal_score(_with_cell_key(buckets), profile)
