"""Streaming Holt linear-trend forecast: the incremental twin of the
batch `operators/timeseries.holt_forecast`, built on
`applyInPandasWithState`.

Per-type state = (ring of the last K-1 CLOSED hourly x values, the open
bucket id, the open bucket's exact decimal partial sum).  A bucket
closes when an event for a LATER bucket arrives; on close the bucket's
x materializes through the identical dec-sum -> double -> HALF_UP 6dp
pipeline as the batch rollup, the Holt row (level/trend/forecast from
the precomputed M^j c weights, j-ascending accumulation) emits
append-mode, and the ring advances.  Because the open bucket's partial
sum persists EXACTLY in state (shortest-repr decimal quantization, the
`gapfill._dec` contract), buckets that span micro-batches still close
bit-identical to the batch operator -- unlike an emit-immediately
frontier, nothing is guessed before the bucket is provably complete.

Late-data policy: events for buckets at or below the last CLOSED bucket
are dropped (append-mode emission makes closed buckets immutable);
in-bucket arrival order is irrelevant (the sum is order-independent by
decimal exactness).  The newest bucket never emits until a later bucket
arrives -- the same flush contract as session windows (feed a sentinel
tick to drain, or accept one-open-bucket latency).

Scale: O(K) state per event type (a vocabulary-sized key space); each
row is O(1) amortized plus O(K) per bucket close.
"""

from __future__ import annotations

from decimal import Decimal
from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from streamprocessing_with_kafka_spark.operators.timeseries import (
    HOLT_HORIZON,
    HOLT_LAGS,
    _HOLT_WEIGHTS,
)
from streamprocessing_with_kafka_spark.streaming.ewma import _round6
from streamprocessing_with_kafka_spark.streaming.gapfill import _dec

_HOUR_NS = 3_600 * 10**9

HOLT_STATE_SCHEMA = StructType(
    [
        StructField("recent", ArrayType(DoubleType())),  # closed x, oldest..newest
        StructField("open_bucket", LongType()),  # hours since epoch
        StructField("open_sum", StringType()),  # exact Decimal repr
    ]
)

HOLT_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("bucket", TimestampType()),
        StructField("x", DoubleType()),
        StructField("level", DoubleType()),
        StructField("trend", DoubleType()),
        StructField("forecast", DoubleType()),
    ]
)


def _holt_row(window: list) -> tuple:
    """The batch lag expression's arithmetic, verbatim: window is
    oldest..newest with len <= K; returns (level, trend, forecast),
    Nones when history is short OR any lag is a None entry (an all-NULL
    hour's x is NULL, and a NULL lag nulls the batch sums -- there is
    deliberately no coalesce in the batch expression either)."""
    if len(window) < HOLT_LAGS or any(v is None for v in window):
        return (None, None, None)
    level = 0.0
    trend = 0.0
    for j, (wl, wb) in enumerate(_HOLT_WEIGHTS):  # j ascending, like batch
        level = level + window[len(window) - 1 - j] * wl
        trend = trend + window[len(window) - 1 - j] * wb
    return (
        _round6(level),
        _round6(trend),
        _round6(level + float(HOLT_HORIZON) * trend),
    )


def _holt_type(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    # open_sum is None until the open bucket sees its first NON-NULL
    # value: Spark's sum() over an all-NULL hour is NULL, so the closed
    # x must be None then (and a None x ripples through the next K-1
    # forecasts via _holt_row, exactly like the batch NULL lag).
    # Accumulating float(NaN) into the Decimal would instead raise on
    # quantization (r9 mixed-nulls twin audit).
    if state.exists:
        recent, open_bucket, open_sum = state.get
        recent = list(recent)
        open_sum = Decimal(open_sum) if open_sum is not None else None
    else:
        recent, open_bucket, open_sum = [], None, None

    rows = pd.concat(list(pdfs)).sort_values("ts")
    out: list[tuple] = []
    for ts, value in zip(rows["ts"].astype("int64"), rows["value"]):
        b = int(ts // _HOUR_NS)
        if open_bucket is None:
            open_bucket, open_sum = b, None
        if b < open_bucket:
            continue  # late: its bucket already closed (or pre-frontier)
        if b > open_bucket:
            # close the open bucket: materialize x exactly as dec_sum does
            x = _round6(float(open_sum)) if open_sum is not None else None
            window = (recent + [x])[-HOLT_LAGS:]
            out.append(
                (key[0], pd.Timestamp(open_bucket * _HOUR_NS), x, *_holt_row(window))
            )
            recent = window[-(HOLT_LAGS - 1) :] if HOLT_LAGS > 1 else []
            open_bucket, open_sum = b, None
        if pd.notna(value):
            if open_sum is None:
                open_sum = Decimal(0)
            open_sum += _dec(float(value))

    state.update(
        (recent, open_bucket, str(open_sum) if open_sum is not None else None)
    )
    if out:
        yield pd.DataFrame(
            out,
            columns=["event_type", "bucket", "x", "level", "trend", "forecast"],
        )


def holt_stream(events: DataFrame) -> DataFrame:
    """Per-type streaming Holt over a streaming (event_type, ts, value)
    frame; append output, one final row per closed hourly bucket."""
    # NULL event times cannot sit on the spine/frontier: pandas
    # converts NaT to int64 MIN, which would fabricate a ~3M-hour
    # gap run / bogus frontier instead of erroring (r9 review).
    # The batch twin shares this gate since r10 (ts IS NOT NULL in
    # its rollup AND its oracle), so stream/batch bit-parity holds
    # on NULL-bearing event times too (mixed_keys sweep).
    return events.filter(F.col("ts").isNotNull()).groupBy("event_type").applyInPandasWithState(
        _holt_type,
        outputStructType=HOLT_OUTPUT_SCHEMA,
        stateStructType=HOLT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
