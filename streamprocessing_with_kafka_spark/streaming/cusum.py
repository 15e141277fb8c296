"""Streaming CUSUM: the online twin of the batch
`operators/timeseries.cusum_changepoints`, with a FROZEN model.

The closed form the batch operator uses (c_t = S_t - min(0, min_j S_j))
is trivially incremental: per-type state is just (running sum, running
min, running max) -- O(1) per key, the smallest state of any detector in
the repo. The in-control model (mu, k, h) is trained OFFLINE by the
batch operator's moment pass and shipped frozen (the drift-monitor
pattern: a live detector must not let the anomaly it is hunting drag
its own baseline).

Arithmetic: terms are the same 6dp-rounded deviations as the batch
operator, accumulated in exact Decimal (the gapfill _dec contract), so
the emitted cusum values are bit-identical to the batch windows when
hourly rows arrive in bucket order per type (pinned in
test_streaming_cusum.py). Late rows at or before the per-type frontier
are dropped (append-mode finality).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal
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

CUSUM_STATE_SCHEMA = StructType(
    [
        StructField("s_up", StringType()),  # exact decimals as strings
        StructField("min_up", StringType()),
        StructField("s_dn", StringType()),
        StructField("max_dn", StringType()),
        StructField("frontier", LongType()),  # ns since epoch
    ]
)

CUSUM_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("bucket", TimestampType()),
        StructField("x", DoubleType()),
        StructField("cusum_up", DoubleType()),
        StructField("cusum_dn", DoubleType()),
        StructField("is_alarm", BooleanType()),
    ]
)

_SIX = Decimal("1.000000")


def _round6(v: float) -> Decimal:
    """Spark's round(double, 6): HALF_UP on the shortest decimal repr."""
    return Decimal(repr(v)).quantize(_SIX, rounding=ROUND_HALF_UP)


def cusum_stream(hourly: DataFrame, model: dict) -> DataFrame:
    """Online CUSUM over a streaming (event_type, bucket, x) hourly
    frame; `model` maps event_type -> (mu, k, h) frozen from the batch
    moment pass. Append output, one final row per (type, bucket)."""

    def _one_type(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        etype = key[0]
        if etype not in model:
            return
        mu, k, h = model[etype]
        h_r = float(_round6(h))
        # s_up == None encodes "no non-NULL hour seen yet" (nullable
        # state string, the holt open_sum pattern): the batch window
        # sums are NULL until the first non-NULL term, so leading
        # all-NULL hours must emit NULL cusums, and later all-NULL
        # hours are zero-increment steps (sum() skips the NULL term).
        # float(NaN) through _round6 would instead raise (r9 audit).
        if state.exists:
            s_up, min_up, s_dn, max_dn, frontier = state.get
            if s_up is not None:
                s_up, min_up = Decimal(s_up), Decimal(min_up)
                s_dn, max_dn = Decimal(s_dn), Decimal(max_dn)
        else:
            s_up = min_up = s_dn = max_dn = None
            frontier = -(2**62)

        rows = pd.concat(list(pdfs)).sort_values("bucket")
        out: list[tuple] = []
        for bucket, x in zip(rows["bucket"].astype("int64"), rows["x"]):
            if bucket <= frontier:
                continue  # late: the emitted row for this bucket is final
            if pd.notna(x):
                x = float(x)
                if s_up is None:
                    s_up = min_up = s_dn = max_dn = Decimal(0)
                s_up = s_up + _round6(x - mu - k)
                s_dn = s_dn + _round6(x - mu + k)
                min_up = min(min_up, s_up)
                max_dn = max(max_dn, s_dn)
            else:
                x = None
            if s_up is None:
                cu_r = cd_r = alarm = None
            else:
                cu = float(s_up - min(min_up, Decimal(0)))
                cd = float(max(max_dn, Decimal(0)) - s_dn)
                cu_r, cd_r = float(_round6(cu)), float(_round6(cd))
                alarm = cu_r > h_r or cd_r > h_r
            out.append(
                (etype, pd.Timestamp(int(bucket)), x, cu_r, cd_r, alarm)
            )
            frontier = int(bucket)
        state.update(
            (
                str(s_up) if s_up is not None else None,
                str(min_up) if s_up is not None else None,
                str(s_dn) if s_up is not None else None,
                str(max_dn) if s_up is not None else None,
                frontier,
            )
        )
        if out:
            yield pd.DataFrame(
                out,
                columns=["event_type", "bucket", "x", "cusum_up", "cusum_dn", "is_alarm"],
            )

    # NULL event times cannot sit on the spine/frontier: pandas
    # converts NaT to int64 MIN, which would fabricate a ~3M-hour
    # gap run / bogus frontier instead of erroring (r9 review).
    # The batch twin shares this gate since r10 (ts IS NOT NULL in
    # its rollup AND its oracle), so stream/batch bit-parity holds
    # on NULL-bearing event times too (mixed_keys sweep).
    return hourly.filter(F.col("bucket").isNotNull()).groupBy("event_type").applyInPandasWithState(
        _one_type,
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
