"""Streaming EWMA: the incremental twin of the batch
`operators/timeseries.ewma_frame` (per-user truncated EWMA), built on
`applyInPandasWithState`.

Per-user state = the last K-1 observed values in event order (a bounded
ring -- the WHOLE point of the truncated formulation: the streaming
state is O(K) per key, where the recursive EWMA's would be O(1) but
unable to renormalize over partial history, and a full-history window
would be unbounded). Each arriving row computes the identical
fixed-order float arithmetic as the batch window expression -- the same
weight ladder, the same k-ascending accumulation, the same HALF_UP
6dp rounding on the shortest-repr decimal -- so the emitted `ewma` is
bit-identical to the batch operator whenever events arrive in
(ts, event_id) order per user (pinned in test_streaming_ewma.py).

Late-data policy: rows at or before the per-user frontier (ts, event_id)
are DROPPED -- append-mode emission makes every row final, the same
frontier contract as streaming/gapfill.py.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal
from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from streamprocessing_with_kafka_spark.operators.timeseries import (
    EWMA_LAGS,
    _EWMA_WEIGHTS,
)

EWMA_STATE_SCHEMA = StructType(
    [
        StructField("recent", ArrayType(DoubleType())),  # oldest..newest, <= K-1
        StructField("last_ts", LongType()),  # ns since epoch
        StructField("last_event", LongType()),
    ]
)

EWMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("n_hist", IntegerType()),
        StructField("ewma", DoubleType()),
    ]
)

_SIX_DP = Decimal("1.000000")


def _round6(v: float) -> float:
    """Spark's round(double, 6), replicated exactly: HALF_UP on the
    SHORTEST decimal repr (BigDecimal.valueOf == Python repr), not on the
    exact binary expansion."""
    return float(Decimal(repr(v)).quantize(_SIX_DP, rounding=ROUND_HALF_UP))


def _ewma_row(window: list):
    """The batch window expression's arithmetic, verbatim: lags[k] is the
    k-th previous value (lags[0] = current row), num/den accumulate in
    k-ascending order over the lags that exist. A None entry is a
    NULL-valued predecessor ROW -- it HOLDS its lag position but
    contributes zero weight (the batch coalesce/CASE arms), it is not
    skipped over; all-None -> None, the batch den == 0 NULL-out."""
    num = 0.0
    den = 0.0
    for k in range(EWMA_LAGS):
        if k < len(window) and window[len(window) - 1 - k] is not None:
            num = num + window[len(window) - 1 - k] * _EWMA_WEIGHTS[k]
            den = den + _EWMA_WEIGHTS[k]
        # absent lags contribute +0.0 to num and +0.0 to den, identical
        # to the batch coalesce/CASE arms -- adding 0.0 is an IEEE no-op
    return _round6(num / den) if den != 0.0 else None


def _ewma_user(
    key: Tuple[int],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        recent, last_ts, last_event = state.get
        recent = list(recent)
    else:
        recent, last_ts, last_event = [], -(2**62), -(2**62)

    rows = pd.concat(list(pdfs))
    rows = rows.sort_values(["ts", "event_id"])

    out: list[tuple] = []
    for ts, event_id, value in zip(
        rows["ts"].astype("int64"), rows["event_id"], rows["value"]
    ):
        if (ts, event_id) <= (last_ts, last_event):
            continue  # late arrival below the emitted frontier: dropped
        # NULL values keep their ROW (and its lag position) but carry
        # None -- float(NaN) here would poison num AND the ring state
        # for the next K-1 rows (r9 mixed-nulls twin audit); batch
        # n_hist counts only non-NULL lags, so mirror that too
        val = float(value) if pd.notna(value) else None
        window = recent[-(EWMA_LAGS - 1) :] + [val]
        out.append(
            (
                key[0],
                int(event_id),
                pd.Timestamp(int(ts)),
                val,
                sum(1 for v in window if v is not None),
                _ewma_row(window),
            )
        )
        recent = window[-(EWMA_LAGS - 1) :]
        last_ts, last_event = int(ts), int(event_id)

    state.update((recent, last_ts, last_event))
    if out:
        yield pd.DataFrame(
            out, columns=["user_id", "event_id", "ts", "value", "n_hist", "ewma"]
        )


def ewma_stream(events: DataFrame) -> DataFrame:
    """Per-user streaming EWMA over a streaming (user_id, event_id, ts,
    value) frame; append output, one final row per event."""
    # NULL event times cannot sit on the spine/frontier: pandas
    # converts NaT to int64 MIN, which would fabricate a ~3M-hour
    # gap run / bogus frontier instead of erroring (r9 review).
    # The BATCH twin, by contrast, KEEPS NULL-instant rows (they
    # sort NULLS-FIRST as order-degenerate leading rows, identically
    # in engine and oracle) -- so stream-vs-batch bit-parity is
    # scoped to rows with non-NULL event times; the mixed_keys
    # sweep verifies both contracts (r10, was overstated before).
    return events.filter(F.col("ts").isNotNull()).groupBy("user_id").applyInPandasWithState(
        _ewma_user,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
