"""Streaming sessionization: the incremental twin of the batch
`operators/windows.session_events`, on Spark's NATIVE streaming
`session_window` state store -- no custom state code at all.

`session_window` in a streaming aggregation keeps one open window per
(user, session) in the state store, merges windows as events arrive
(two sessions closer than the gap collapse into one -- including ACROSS
micro-batches, which a naive per-batch groupBy would get wrong), and
emits a session in append mode only once the watermark passes its end,
i.e. once no event can legally extend or merge it.  That
emit-when-provably-final contract is exactly the batch semantics: the
convergence test pins bit-identical rows (decimal-exact value sums
included) against `session_events` over the same input.

Late-data policy comes from the watermark, not custom frontier
bookkeeping: once a session's state is evicted (the trigger AFTER the
watermark passes its end -- eviction applies the previous batch's
watermark), late events can no longer reopen it and are dropped.  An
event below the watermark whose session is STILL open (eviction lag)
legally merges -- verified empirically in test_streaming_sessions.py;
Spark finalizes state lazily, never un-emits.

Scale: state is one (start, end, partial-aggregate) row per OPEN
session, keyed by user -- eviction on watermark keeps it bounded by
active users, independent of stream length; the aggregation itself is
the same single shuffle on user_id as the batch plan.

Reference parity: the reference has no windows/sessions at all
(SURVEY.md §2.6); this is the events-stream surface a monitoring plane
needs over it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from streamprocessing_with_kafka_spark.functions.numeric import dec_sum

SESSION_GAP = "30 minutes"
SESSION_WATERMARK = "1 hour"


def sessionized_stream(
    stream: DataFrame,
    gap: str = SESSION_GAP,
    delay: str = SESSION_WATERMARK,
) -> DataFrame:
    """(user_id, session_start, session_end, n_events, total_value) --
    the exact column contract of the batch `session_events`, emitted
    append-mode as sessions become watermark-final."""
    return (
        stream.withWatermark("ts", delay)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
