"""Streaming CEP pattern match: the online twin of the batch
`operators/timeseries.cep_click_purchase` ("click then purchase within
30 minutes with no intervening error").

Per-user state is exactly the TWO longs the batch operator's design
promised -- the microsecond stamps of the latest click and the latest
error -- plus the (ts, event_id) frontier for late-row dropping (the
attribution twin's shape, one more long).  Each purchase gets its
verdict THE MOMENT IT ARRIVES by replaying the batch windows' exact
integer arithmetic: match iff the last click is within
CEP_WINDOW_MINUTES and the last error is strictly OLDER than that
click; state updates strictly AFTER the row's own verdict, mirroring
the batch window's `rowsBetween(unboundedPreceding, -1)` exclusion.

Output: matched purchases only, column-for-column the batch operator's
frame (tests/test_streaming_cep.py pins set equality across multi-batch
arrival with replays)."""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from streamprocessing_with_kafka_spark.operators.timeseries import (
    CEP_WINDOW_MINUTES,
)

_HORIZON_US = CEP_WINDOW_MINUTES * 60 * 1_000_000

CEP_STATE_SCHEMA = StructType(
    [
        StructField("last_click_us", LongType()),  # -1 == none yet
        StructField("last_error_us", LongType()),  # -1 == none yet
        StructField("frontier_ts", LongType()),  # ns since epoch
        StructField("frontier_event", LongType()),
    ]
)

CEP_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("purchase_event_id", LongType()),
        StructField("purchase_ts", TimestampType()),
        StructField("click_ts", TimestampType()),
        StructField("gap_us", LongType()),
    ]
)


def _cep_user(
    key: Tuple[int],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        click_us, error_us, f_ts, f_ev = state.get
    else:
        click_us, error_us, f_ts, f_ev = -1, -1, -(2**62), -(2**62)

    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    out: list[tuple] = []
    for ts_ns, event_id, etype in zip(
        rows["ts"].astype("int64"), rows["event_id"], rows["event_type"]
    ):
        if (ts_ns, event_id) <= (f_ts, f_ev):
            continue  # late arrival below the emitted frontier
        ts_us = int(ts_ns) // 1_000
        if etype == "purchase" and click_us >= 0:
            gap = ts_us - click_us
            if gap <= _HORIZON_US and (error_us < 0 or error_us < click_us):
                out.append(
                    (
                        key[0],
                        int(event_id),
                        pd.Timestamp(int(ts_ns)),
                        pd.Timestamp(click_us * 1_000),
                        gap,
                    )
                )
        if etype == "click":
            click_us = ts_us  # strictly AFTER this row's own verdict
        elif etype == "error":
            error_us = ts_us
        f_ts, f_ev = int(ts_ns), int(event_id)

    state.update((click_us, error_us, f_ts, f_ev))
    if out:
        yield pd.DataFrame(
            out,
            columns=[
                "user_id", "purchase_event_id", "purchase_ts",
                "click_ts", "gap_us",
            ],
        )


def cep_stream(events: DataFrame) -> DataFrame:
    """Online A->B-without-C matches over a streaming (user_id,
    event_id, ts, event_type) frame; append output, one row per
    matched purchase."""
    # NULL event times cannot sit on the spine/frontier: pandas
    # converts NaT to int64 MIN, which would fabricate a ~3M-hour
    # gap run / bogus frontier instead of erroring (r9 review).
    # The BATCH twin, by contrast, KEEPS NULL-instant rows (they
    # sort NULLS-FIRST as order-degenerate leading rows, identically
    # in engine and oracle) -- so stream-vs-batch bit-parity is
    # scoped to rows with non-NULL event times; the mixed_keys
    # sweep verifies both contracts (r10, was overstated before).
    return events.filter(F.col("ts").isNotNull()).groupBy("user_id").applyInPandasWithState(
        _cep_user,
        outputStructType=CEP_OUTPUT_SCHEMA,
        stateStructType=CEP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
