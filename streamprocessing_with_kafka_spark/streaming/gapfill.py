"""Streaming gap-fill + LOCF: the incremental twin of the batch
`operators/windows.gapfill_hourly` (hypertable-style continuous
interpolation), built on `applyInPandasWithState`.

Per-user state = (frontier bucket, last observed value). Each
micro-batch advances the frontier: new events roll up to hourly buckets
(exact decimal sums, same quantization as dec_sum, so the emitted
values are bit-identical to the batch operator's); every hour between
the old frontier and the newest observed bucket is emitted exactly once
-- observed hours with their sums, missing hours as gaps carrying the
last observation forward. Emission is append-mode: each (user, bucket)
row is final the moment it leaves.

Late-data policy: events at or below the emitted frontier are DROPPED
(the append contract makes their buckets immutable) -- the streaming
analog of a watermark, keyed on the per-user frontier rather than a
global clock. Convergence with the batch operator is exact whenever no
event arrives out of hour-order per user.

Production note: with NoTimeout, a user's trailing gaps materialize
only when that user's next event arrives. To flush gaps on wall/event
time instead, register an EventTimeTimeout and emit up to
`state.getCurrentWatermarkMs()` when it fires -- same state, one more
branch; omitted here to keep the operator deterministic under
availableNow test execution (timeout firing depends on batch timing).
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
    StructField,
    StructType,
    TimestampType,
)

_HOUR_NS = 3_600 * 10**9

GAPFILL_STATE_SCHEMA = StructType(
    [
        StructField("frontier_hour", LongType()),  # hours since epoch
        StructField("last_value", DoubleType()),
    ]
)

GAPFILL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("bucket", TimestampType()),
        StructField("observed_value", DoubleType()),
        StructField("filled_value", DoubleType()),
        StructField("is_gap", BooleanType()),
    ]
)


def _dec(v: float) -> Decimal:
    """Spark's double -> DECIMAL(28,10) cast, replicated exactly: Spark
    quantizes the SHORTEST decimal repr of the double (BigDecimal.valueOf
    == Python repr), not the exact binary expansion -- Decimal(v) would
    round 1.5e-10 (binary ...49999e-10) down to 1E-10 where Spark says
    2E-10. Keeps streamed sums bit-identical to the batch dec_sum."""
    return Decimal(repr(v)).quantize(Decimal("1.0000000000"), rounding=ROUND_HALF_UP)


def _fill_user(
    key: Tuple[int],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    # `seen` (hours with ANY event) is tracked apart from `sums` (hours
    # with a non-NULL aggregate) to mirror the batch operator's NULL
    # semantics exactly (the r8 gapfill pin): an observed hour whose
    # values are all NULL behaves as a GAP -- the ignore-nulls carry
    # skips it -- but it still extends the emitted spine (a trailing
    # all-NULL hour must emit and advance the frontier), and gap rows
    # with NOTHING yet to carry emit with filled NULL rather than being
    # dropped. Accumulating NaN would also poison the Decimal sum.
    sums: dict[int, Decimal] = {}
    seen: set[int] = set()
    for pdf in pdfs:
        hours = pdf["ts"].astype("int64") // _HOUR_NS
        for h, v in zip(hours, pdf["value"]):
            h = int(h)
            seen.add(h)
            if pd.notna(v):
                sums[h] = sums.get(h, Decimal(0)) + _dec(float(v))

    if state.exists:
        frontier, last_value = state.get
        seen = {h for h in seen if h > frontier}
        sums = {h: s for h, s in sums.items() if h > frontier}
    else:
        if not seen:
            return
        frontier, last_value = min(seen) - 1, None

    if not seen:
        return

    out: list[tuple] = []
    hi = max(seen)
    for h in range(frontier + 1, hi + 1):
        ts = pd.Timestamp(h * _HOUR_NS)
        if h in sums:
            last_value = float(sums[h])
            out.append((key[0], ts, last_value, last_value, False))
        else:
            out.append((key[0], ts, None, last_value, True))
    state.update((hi, last_value))
    yield pd.DataFrame(
        out, columns=["user_id", "bucket", "observed_value", "filled_value", "is_gap"]
    )


def gapfilled_stream(events: DataFrame) -> DataFrame:
    """Incrementally gap-filled hourly series per user over a streaming
    (user_id, ts, value) frame; append output, one final row per
    (user, hour)."""
    # NULL event times cannot sit on the spine/frontier: pandas
    # converts NaT to int64 MIN, which would fabricate a ~3M-hour
    # gap run / bogus frontier instead of erroring (r9 review).
    # The batch twin shares this gate since r10 (ts IS NOT NULL in
    # its rollup AND its oracle), so stream/batch bit-parity holds
    # on NULL-bearing event times too (mixed_keys sweep).
    return events.filter(F.col("ts").isNotNull()).groupBy("user_id").applyInPandasWithState(
        _fill_user,
        outputStructType=GAPFILL_OUTPUT_SCHEMA,
        stateStructType=GAPFILL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
