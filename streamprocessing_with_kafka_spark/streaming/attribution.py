"""Streaming last-touch attribution: the online twin of the batch
`operators/timeseries.attribution_last_touch`.

Per-user state is ONE long -- the microsecond timestamp of the latest
click -- plus the (ts, event_id) frontier for late-row dropping. Each
arriving purchase is attributed or not THE MOMENT IT ARRIVES (the batch
operator needs the whole day before its daily rollup; the stream emits
per-purchase verdicts that aggregate to the identical daily numbers,
pinned in test_streaming_attribution.py). Clicks update the state and
emit nothing; other event types only advance the frontier.

The attribution decision replays the batch window's exact arithmetic:
integer-microsecond recency against the same ATTR_WINDOW_HOURS horizon,
strictly-preceding semantics (a click at the same (ts, event_id) order
position never credits a purchase that precedes it in sort order).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from streamprocessing_with_kafka_spark.operators.timeseries import ATTR_WINDOW_HOURS

_HORIZON_US = ATTR_WINDOW_HOURS * 3_600 * 1_000_000

ATTR_STATE_SCHEMA = StructType(
    [
        StructField("last_click_us", LongType()),  # -1 == no click yet
        StructField("frontier_ts", LongType()),  # ns since epoch
        StructField("frontier_event", LongType()),
    ]
)

ATTR_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("attributed", BooleanType()),
        StructField("since_click_us", LongType()),
    ]
)


def _attr_user(
    key: Tuple[int],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        last_click_us, f_ts, f_ev = state.get
    else:
        last_click_us, f_ts, f_ev = -1, -(2**62), -(2**62)

    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    out: list[tuple] = []
    for ts_ns, event_id, etype, value in zip(
        rows["ts"].astype("int64"), rows["event_id"], rows["event_type"], rows["value"]
    ):
        if (ts_ns, event_id) <= (f_ts, f_ev):
            continue  # late arrival below the emitted frontier
        ts_us = int(ts_ns) // 1_000
        if etype == "purchase":
            since = ts_us - last_click_us if last_click_us >= 0 else None
            attributed = since is not None and since <= _HORIZON_US
            out.append(
                (
                    int(event_id),
                    key[0],
                    pd.Timestamp(int(ts_ns)),
                    etype,
                    # a NULL purchase value stays NULL -- float(NaN)
                    # would emit NaN where the batch operator carries
                    # the NULL through (r9 mixed-nulls twin audit)
                    float(value) if pd.notna(value) else None,
                    attributed,
                    since,
                )
            )
        if etype == "click":
            last_click_us = ts_us  # strictly AFTER this row's own verdict
        f_ts, f_ev = int(ts_ns), int(event_id)

    state.update((last_click_us, f_ts, f_ev))
    if out:
        yield pd.DataFrame(
            out,
            columns=[
                "event_id", "user_id", "ts", "event_type", "value",
                "attributed", "since_click_us",
            ],
        )


def attribution_stream(events: DataFrame) -> DataFrame:
    """Per-purchase online attribution over a streaming (user_id,
    event_id, ts, event_type, value) frame; append output, one final row
    per purchase."""
    # NULL event times cannot sit on the spine/frontier: pandas
    # converts NaT to int64 MIN, which would fabricate a ~3M-hour
    # gap run / bogus frontier instead of erroring (r9 review).
    # The BATCH twin, by contrast, KEEPS NULL-instant rows (they
    # sort NULLS-FIRST as order-degenerate leading rows, identically
    # in engine and oracle) -- so stream-vs-batch bit-parity is
    # scoped to rows with non-NULL event times; the mixed_keys
    # sweep verifies both contracts (r10, was overstated before).
    return events.filter(F.col("ts").isNotNull()).groupBy("user_id").applyInPandasWithState(
        _attr_user,
        outputStructType=ATTR_OUTPUT_SCHEMA,
        stateStructType=ATTR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
