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

from streamprocessing_with_kafka_spark.operators.timeseries import (
    seasonal_cell_key,
    seasonal_keyed_hourly,
    seasonal_profile_moments,
    seasonal_score,
)
from streamprocessing_with_kafka_spark.sources.tables import load_table


def seasonal_profile_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frozen (event_type, dow, hr) profile moments -- built by the
    batch operator's OWN rollup/key/moment helpers (shared functions,
    not mirrored code), so online and nightly-audit profiles can never
    drift."""
    return seasonal_profile_moments(
        seasonal_keyed_hourly(load_table(spark, sf_dir, "events"))
    )


def score_stream(buckets: DataFrame, profile: DataFrame) -> DataFrame:
    """(event_type, bucket, x, z, is_anomaly) for a streaming hourly-
    bucket frame against the frozen profile -- the batch operator's
    scorer applied verbatim (one code path, two execution modes)."""
    return seasonal_score(seasonal_cell_key(buckets), profile)
