"""Custom stateful streaming operators the reference cannot express.

The reference's only state is Kafka offsets plus in-memory counters
(order_validator.py:332-335,363-372 -- reset on every restart). These
operators give the same *intent* durable, scalable semantics:

  - `dedup_within_watermark`: drop re-deliveries of the same order_id
    within the event-time watermark. State is bounded by the watermark
    (old keys age out), which is what makes it viable on an unbounded
    stream -- a plain dropDuplicates would accrete state forever.

  - `running_counters_stateful`: per-key running valid/invalid tallies via
    applyInPandasWithState -- the durable, per-key generalization of the
    reference's global counters. State lives in the state store
    (checkpointed, survives restart), updates arrive as Arrow batches, and
    each key's group is processed independently -- so the operator scales
    horizontally by key hash exactly like a shuffle.

Both run on the same order-stream schema as the main pipeline and are
exercised by tests/test_stateful.py with file sources + memory/parquet
sinks (no Kafka broker needed); Kafka wiring is config-only via
streaming/pipeline.py.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


def with_event_time(routed: DataFrame) -> DataFrame:
    """Attach an event-time column to the routed order stream: the
    normalized order_date as a timestamp (midnight UTC).

    try_to_timestamp, not to_timestamp: under Spark 4's default ANSI
    mode a malformed date would THROW and kill the whole streaming query
    -- the poison-pill failure mode this pipeline exists to prevent (the
    validator checks date presence/epoch-days shape, not full format).
    An unparseable date yields a NULL event_ts instead; the watermark
    dedup passes such rows through unsuppressed (null event time cannot
    age), which is the safe direction for a dedup."""
    return routed.withColumn(
        "event_ts", F.try_to_timestamp(F.col("order_date"), F.lit("yyyy-MM-dd"))
    )


def dedup_within_watermark(
    routed: DataFrame, watermark: str = "7 days"
) -> DataFrame:
    """Streaming exact dedup by order_id, state bounded by the watermark.

    The reference "dedupes" by polling its HTTP source once a day
    (docs/kafka-connector-configurations.md:41-44) -- i.e. by not
    re-reading. This is the real operator: re-delivered keys inside the
    watermark are dropped; keys older than the watermark age out of the
    state store, so state size tracks the window, not the stream.
    """
    return with_event_time(routed).withWatermark(
        "event_ts", watermark
    ).dropDuplicatesWithinWatermark(["order_id"])


COUNTER_STATE_SCHEMA = StructType(
    [
        StructField("processed", LongType()),
        StructField("valid", LongType()),
        StructField("invalid", LongType()),
    ]
)

COUNTER_OUTPUT_SCHEMA = StructType(
    [
        StructField("target", StringType()),
        StructField("processed", LongType()),
        StructField("valid", LongType()),
        StructField("invalid", LongType()),
    ]
)


def _update_counters(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Arrow-batched per-key state update: totals accumulate across
    micro-batches in the checkpointed state store."""
    processed = valid = invalid = 0
    for pdf in pdfs:
        processed += len(pdf)
        v = int(pdf["is_valid"].sum())
        valid += v
        invalid += len(pdf) - v
    if state.exists:
        p0, v0, i0 = state.get
        processed, valid, invalid = processed + p0, valid + v0, invalid + i0
    state.update((processed, valid, invalid))
    yield pd.DataFrame(
        {
            "target": [key[0]],
            "processed": [processed],
            "valid": [valid],
            "invalid": [invalid],
        }
    )


def running_counters_stateful(routed: DataFrame) -> DataFrame:
    """ST3 as a durable per-key stateful operator: running totals per
    route target, emitted each micro-batch (update semantics)."""
    return (
        routed.groupBy("target")
        .applyInPandasWithState(
            _update_counters,
            outputStructType=COUNTER_OUTPUT_SCHEMA,
            stateStructType=COUNTER_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Spark 4 arbitrary state v2 (transformWithStateInPandas)
# ---------------------------------------------------------------------------

try:  # Spark >= 4.0, and the TWS runner's protobuf transport must import;
    # environments without either degrade to applyInPandasWithState above
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    HAS_TWS = True
except ImportError:  # pragma: no cover
    StatefulProcessor = object  # type: ignore[assignment,misc]
    HAS_TWS = False


class CounterProcessor(StatefulProcessor):
    """Per-key running counters on the transformWithState API -- the
    successor to applyInPandasWithState with typed state variables and
    store-native TTL: idle keys are evicted by the state store itself
    (no manual timeout bookkeeping), which is what bounds state on an
    unbounded key space (e.g. per-customer counters at 100 TB).
    """

    def __init__(self, ttl_ms: int | None = None):
        self._ttl_ms = ttl_ms

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._totals = handle.getValueState(
            "totals",
            "processed BIGINT, valid BIGINT, invalid BIGINT",
            ttlDurationMs=self._ttl_ms,
        )

    def handleInputRows(self, key, rows, timer_values) -> Iterator[pd.DataFrame]:
        processed = valid = 0
        for pdf in rows:
            processed += len(pdf)
            valid += int(pdf["is_valid"].sum())
        invalid = processed - valid
        prev = self._totals.get()
        if prev is not None:
            processed += prev[0]
            valid += prev[1]
            invalid += prev[2]
        self._totals.update((processed, valid, invalid))
        yield pd.DataFrame(
            {
                "target": [key[0]],
                "processed": [processed],
                "valid": [valid],
                "invalid": [invalid],
            }
        )

    def close(self) -> None:
        pass


def running_counters_tws(
    routed: DataFrame, ttl_ms: int | None = None
) -> DataFrame:
    """ST3 counters on transformWithStateInPandas (state v2). Same
    semantics as `running_counters_stateful`; state schema is declared,
    TTL is store-enforced, and the operator composes with timers /
    list / map state for richer monitors.

    timeMode must be ProcessingTime when a TTL is set: Spark rejects
    state TTL under TimeMode.None at query start
    (STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_ASSIGN_TTL), so the mode
    follows the ttl_ms argument instead of hardcoding None."""
    return routed.groupBy("target").transformWithStateInPandas(
        CounterProcessor(ttl_ms),
        outputStructType=COUNTER_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="ProcessingTime" if ttl_ms is not None else "None",
    )
