"""Event-time windowed analytics over the `events` stream table -- the
streaming operator family the reference lacks entirely (SURVEY.md §2.6).

These are the batch twins of the Structured Streaming versions in
`streaming/`: in SS the same expressions run with
`withWatermark("ts", ...)` in front (late-data bound + state eviction);
batch execution lets the DuckDB oracle check the exact window semantics.

Scale notes: tumbling/sliding windows are plain hash aggregates on
(window, keys) -- one shuffle, map-side combinable, skew handled by AQE.
Session windows are Spark-native `session_window` (state-store backed in
SS); the SQL twin reproduces them with lag + running-sum session ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from streamprocessing_with_kafka_spark.functions.numeric import DEC, dec_sum, dec_sum_sql, round_sql
from streamprocessing_with_kafka_spark.sources.tables import load_table


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def pivot_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event counts pivoted to one column per event type.

    The pivot values are DECLARED (not discovered): passing the value
    list skips the extra distinct-scan Spark otherwise runs to infer
    columns, and pins the output schema -- both required at scale and for
    oracle comparison."""
    ev = load_table(spark, sf_dir, "events")
    p = (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in EVENT_TYPES],
    )


PIVOT_USER_ACTIVITY_SQL = "SELECT user_id, " + ", ".join(
    f"COUNT(*) FILTER (WHERE event_type = '{t}') AS n_{t}" for t in EVENT_TYPES
) + " FROM events GROUP BY user_id"


def running_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window functions: running total + previous-event delta per
    user in event-time order.

    The running sum accumulates DECIMALS inside the frame (engines
    disagree on float accumulation order within window frames -- DuckDB
    uses segment trees -- but decimal addition is exact so any order
    agrees); ties broken on event_id for a total order."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.sum(F.col("value").cast("decimal(28,10)")).over(run).cast("double").alias(
            "running_value"
        ),
        F.round(
            F.col("value") - F.lag("value").over(w), 6
        ).alias("delta_prev"),
        F.row_number().over(w).alias("event_seq"),
    )


RUNNING_USER_VALUE_SQL = """
SELECT user_id, event_id, ts, value,
  CAST(CAST(SUM(CAST(value AS DECIMAL(28,10)))
       OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
    AS running_value,
  round(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 6)
    AS delta_prev,
  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS event_seq
FROM events
"""


def tumbling_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling windows per event_type."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dec_sum("value").alias("total_value"))
        .select(F.col("w.start").alias("ws"), "event_type", "n_events", "total_value")
    )


TUMBLING_EVENTS_SQL = f"""
-- ts IS NOT NULL: Spark's window()/session_window() drop NULL event
-- times (documented; a row with no instant maps to no window); the
-- oracle states the same contract explicitly (r10 mixed_keys sweep).
SELECT CAST(time_bucket(INTERVAL '10 minutes', ts) AS TIMESTAMP) AS ws,
       event_type, COUNT(*) AS n_events, {dec_sum_sql('value')} AS total_value
FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
"""


def sliding_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 minutes (each event in 2 windows)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dec_sum("value").alias("total_value"))
        .select(F.col("w.start").alias("ws"), "n_events", "total_value")
    )


SLIDING_EVENTS_SQL = f"""
-- ts IS NOT NULL: Spark's window()/session_window() drop NULL event
-- times (documented; a row with no instant maps to no window); the
-- oracle states the same contract explicitly (r10 mixed_keys sweep).
SELECT ws, COUNT(*) AS n_events, {dec_sum_sql('value')} AS total_value
FROM (
  SELECT CAST(time_bucket(INTERVAL '5 minutes', ts) AS TIMESTAMP) AS ws, value
  FROM events WHERE ts IS NOT NULL
  UNION ALL
  SELECT CAST(time_bucket(INTERVAL '5 minutes', ts) AS TIMESTAMP)
         - INTERVAL '5 minutes' AS ws, value
  FROM events WHERE ts IS NOT NULL
)
GROUP BY ws
"""


def session_events(spark: SparkSession, sf_dir: str, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user: gap-based, Spark-native session_window."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dec_sum("value").alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


# lag + running-sum session ids; a new session starts when the gap since the
# previous event EXCEEDS 30 min. Boundary semantics verified empirically
# against Spark (test_streaming_sessions.py): an event at EXACTLY
# prev + gap still merges (session_window extends through its closing
# boundary), so the split condition is strict `>` -- an earlier `>=` here
# was a latent boundary bug the continuous sf timestamps never exposed.
SESSION_EVENTS_SQL = f"""
-- ts IS NOT NULL: Spark's window()/session_window() drop NULL event
-- times (documented; a row with no instant maps to no window); the
-- oracle states the same contract explicitly (r10 mixed_keys sweep).
WITH flagged AS (
  SELECT user_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
         THEN 1 ELSE 0 END AS new_sess
  FROM events WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM flagged
)
SELECT user_id, MIN(ts) AS session_start,
       MAX(ts) + INTERVAL '30 minutes' AS session_end,
       COUNT(*) AS n_events, {dec_sum_sql('value')} AS total_value
FROM sessions GROUP BY user_id, sess_id
"""


def dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact streaming-style dedup with a deterministic keeper: per
    (user_id, event_type, 1-hour bucket) keep the lowest event_id.

    SS twin: dropDuplicatesWithinWatermark([...]) -- same key shape, state
    bounded by the watermark instead of the bucket.

    Shape: ONE window min over the dedup key (single shuffle). The
    previous groupBy + re-join shape was both a second shuffle AND an
    inner equi-join on a nullable key, which silently dropped every
    NULL-event_type row (NULL = NULL is NULL) where SQL PARTITION BY
    keeps them as a group -- caught by the r9 mixed-nulls sweep.
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy(
        "user_id", "event_type", F.date_trunc("hour", F.col("ts"))
    )
    return (
        ev.withColumn("keeper", F.min("event_id").over(w))
        .filter(F.col("event_id") == F.col("keeper"))
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


DEDUP_EVENTS_SQL = """
-- The hour bucket is MATERIALIZED before the window: DuckDB 1.0.0's
-- parallel window partitioner returns NONDETERMINISTIC (racy) results
-- when PARTITION BY contains a computed expression whose input has
-- NULLs (single-threaded it even splits the NULL group, violating the
-- SQL NULLs-group-together rule; its own GROUP BY is correct) -- found
-- by the r10 mixed_keys sweep, reproduced standalone: 30 runs of the
-- inlined form gave 4 distinct row counts; the materialized form is
-- stable and agrees with GROUP BY semantics and the engine.
-- A NULL hour (NULL ts) IS a legitimate dedup bucket here: dedup is
-- bucketed grouping, not a time-axis series, so NULL-ts events dedup
-- among themselves per (user, type) instead of being dropped.
WITH b AS MATERIALIZED (
  SELECT *, date_trunc('hour', ts) AS hour_bucket FROM events
)
SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
FROM (
  SELECT *, MIN(event_id) OVER (PARTITION BY user_id, event_type,
                                hour_bucket) AS keeper
  FROM b
)
WHERE event_id = keeper
"""


def props_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured path: extract props.k (JSON) and aggregate."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("int")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


PROPS_METRICS_SQL = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       MIN(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
       MAX(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
FROM events GROUP BY event_type
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week, counted
    in each later activity week, with the week offset from their cohort.

    Three keyed stages, all on user_id until the final small rollup:
    distinct (user, week) and min-week-per-user shuffle on the same key,
    so the join between them is co-partitioned (AQE reuses the exchange);
    the final groupBy is (cohorts x weeks) -- tiny at any scale."""
    e = load_table(spark, sf_dir, "events")
    wk = F.to_date(F.date_trunc("week", F.col("ts")))
    firsts = e.groupBy("user_id").agg(F.min(wk).alias("cohort_week"))
    active = e.select("user_id", wk.alias("week")).distinct()
    return (
        active.join(firsts, "user_id")
        .groupBy("cohort_week", "week")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            "cohort_week",
            "week",
            F.expr("datediff(week, cohort_week) div 7").alias("week_offset"),
            "n_users",
        )
    )


COHORT_RETENTION_SQL = """
WITH wk AS (
  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS week FROM events
),
firsts AS (SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY user_id),
active AS (SELECT DISTINCT user_id, week FROM wk)
SELECT cohort_week, week,
  datediff('day', cohort_week, week) // 7 AS week_offset,
  COUNT(*) AS n_users
FROM active JOIN firsts USING (user_id)
GROUP BY cohort_week, week
"""


def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: a step counts
    only if its FIRST occurrence is at or after the first occurrence of
    the previous step.

    min-per-type via conditional aggregation: one groupBy(user_id) with
    map-side combine carries the whole funnel; no self-joins, no
    per-user sort. This is the scalable funnel shape -- an N-step funnel
    is N conditional mins in the same single-shuffle aggregate."""
    e = load_table(spark, sf_dir, "events")

    def first_ts(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    per_user = e.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    reached_view = F.col("t_view").isNotNull()
    reached_click = reached_view & (F.col("t_click") >= F.col("t_view"))
    reached_purchase = reached_click & (F.col("t_purchase") >= F.col("t_click"))
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count_if(reached_view).alias("n_view"),
        F.count_if(reached_click).alias("n_click_after_view"),
        F.count_if(reached_purchase).alias("n_purchase_after_click"),
    )


FUNNEL_STEPS_SQL = """
WITH per_user AS (
  SELECT user_id,
    min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
    min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
  -- COUNT(CASE ...), not count_if: DuckDB's count_if is sum-shaped and
  -- returns NULL over zero rows, where Spark's count_if returns 0
  COUNT(CASE WHEN t_view IS NOT NULL THEN 1 END) AS n_view,
  COUNT(CASE WHEN t_view IS NOT NULL AND t_click >= t_view THEN 1 END)
    AS n_click_after_view,
  COUNT(CASE WHEN t_view IS NOT NULL AND t_click >= t_view
              AND t_purchase >= t_click THEN 1 END)
    AS n_purchase_after_click
FROM per_user
"""


def gapfill_hourly(ev: DataFrame) -> DataFrame:
    """Hypertable-style time-series gap-fill + LOCF over any frame with
    (user_id, ts, value): densify each user's hourly value series over
    their observed [min, max] hour range, carry the last observation
    forward across the generated gaps.

    Shape (r8 rewrite): one hash aggregate to hourly buckets (map-side
    combinable), then ONE user-partitioned window pass computing
    `lead(bucket)` and the ignore-nulls LOCF `last(hour_value)` over
    the OBSERVED hours (hourly-sized, not spine-sized), and a
    `sequence()` explode: each observed row emits itself plus its
    following gap run [bucket, next_bucket), carrying the LOCF value at
    its own position -- correct for the whole run since no observation
    lies inside it. The former dense-spine left-join and the
    spine-sized LOCF window are gone (4 exchanges -> 2, no join).
    An observed hour whose values are ALL NULL (hour_value = NULL)
    keeps the original semantics: it reads as a gap (is_gap = true)
    and the carry skips it (`ignorenulls`), exactly like the old
    spine join + last(ignorenulls) over the dense series. Generated
    rows materialize executor-side, never on the driver; output size
    is users x hours, independent of the event count, and both
    shuffles are user-keyed (the hourly agg exchanges on
    (user_id, bucket), the window pass on user_id -- 2 exchanges,
    not 1 reused one)."""
    from pyspark.sql import Window as W

    # ts IS NOT NULL: an event with no event time cannot sit on a time
    # spine. Without the gate its NULL bucket sorts NULLS FIRST into the
    # LOCF window and can leak a carried value into a leading all-NULL
    # real hour, while the oracle's spine join never sees the NULL
    # bucket (r9 ADVICE, verified by the r10 mixed_keys sweep).
    hourly = ev.filter(F.col("ts").isNotNull()).groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(dec_sum("value").alias("hour_value"))
    w = W.partitionBy("user_id").orderBy("bucket")
    runs = hourly.select(
        "user_id",
        "bucket",
        "hour_value",
        F.lead("bucket").over(w).alias("nxt"),
        # ignore-nulls LOCF at each OBSERVED hour; same window
        # partitioning as the lead -- one Window pass, no extra exchange
        F.last("hour_value", ignorenulls=True)
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("carried"),
    )
    dense = runs.select(
        "user_id",
        F.col("bucket").alias("obs_bucket"),
        "hour_value",
        "carried",
        F.explode(
            F.sequence(
                "bucket",
                F.coalesce(
                    F.col("nxt") - F.expr("INTERVAL 1 HOUR"), F.col("bucket")
                ),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("bucket"),
    )
    observed = F.when(
        F.col("bucket") == F.col("obs_bucket"), F.col("hour_value")
    )
    return dense.select(
        "user_id",
        "bucket",
        observed.alias("observed_value"),
        F.col("carried").alias("filled_value"),
        observed.isNull().alias("is_gap"),
    )


def gapfill_user_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry point: gapfill_hourly over the events table."""
    return gapfill_hourly(load_table(spark, sf_dir, "events"))


GAPFILL_USER_HOURLY_SQL = f"""
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket,
         {dec_sum_sql('value')} AS hour_value
  FROM events WHERE ts IS NOT NULL
  GROUP BY user_id, date_trunc('hour', ts)
),
spine AS (
  SELECT user_id,
         unnest(generate_series(min(bucket), max(bucket), INTERVAL 1 HOUR))
           AS bucket
  FROM hourly GROUP BY user_id
)
SELECT s.user_id, s.bucket,
  h.hour_value AS observed_value,
  last_value(h.hour_value IGNORE NULLS) OVER (
    PARTITION BY s.user_id ORDER BY s.bucket
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
  h.hour_value IS NULL AS is_gap
FROM spine s
-- user join is null-safe: NULL user_id is a legitimate series (grouping
-- semantics, same as the engine's partitionBy), not a join miss
LEFT JOIN hourly h
  ON s.user_id IS NOT DISTINCT FROM h.user_id AND s.bucket = h.bucket
"""


def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles per event type -- the exact
    twin of the Greenwald-Khanna sketch in sketch_value_quantiles.

    `percentile()` is a full-sort-per-group aggregate: fine per
    moderate-cardinality group (each group sorts in one reducer), and
    the right recall baseline for the sketch. At 100 TB with heavy
    groups, use approx_percentile (sketched, mergeable, map-side
    combinable) -- same call shape, bounded error."""
    ev = load_table(spark, sf_dir, "events")
    pct = lambda q: F.round(F.expr(f"percentile(value, {q})"), 6)  # noqa: E731
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        pct(0.25).alias("p25"),
        pct(0.50).alias("p50"),
        pct(0.75).alias("p75"),
        pct(0.99).alias("p99"),
    )


VALUE_PERCENTILES_SQL = """
SELECT event_type, COUNT(*) AS n_events,
  round(quantile_cont(value, 0.25), 6) AS p25,
  round(quantile_cont(value, 0.50), 6) AS p50,
  round(quantile_cont(value, 0.75), 6) AS p75,
  round(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type
"""


ZSCORE_LOOKBACK = 12  # trailing events per user feeding the moments
ZSCORE_MIN_PREV = 6  # below this the estimate is noise -> null score
_VAR_FLOOR = 1e-12  # constant-series guard: sqrt(0) -> division blow-up


def rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series anomaly score: each event's z-score against the
    trailing ZSCORE_LOOKBACK events of the SAME user (frame excludes the
    current row, so the score is a true out-of-sample residual).

    The rolling moments come from two decimal window sums (sum, sum of
    squares) -- stddev_samp/var_samp would hand the accumulation order
    to the engine (Welford vs naive differ across engines and partition
    layouts); exact decimal sums make the variance deterministic, then
    var = E[x^2] - E[x]^2 in double. One user-keyed sort window carries
    all three aggregates (count, s1, s2) in a single pass."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ZSCORE_LOOKBACK, -1)
    )
    dec = F.col("value").cast("decimal(28,10)")
    n = F.count(F.lit(1)).over(w)
    s1 = F.sum(dec).over(w).cast("double")
    s2 = F.sum((dec * dec).cast("decimal(38,10)")).over(w).cast("double")
    mean = s1 / n
    var = s2 / n - mean * mean
    z = F.when(
        n >= ZSCORE_MIN_PREV,
        F.round(
            (F.col("value") - mean) / F.sqrt(F.greatest(var, F.lit(_VAR_FLOOR))), 6
        ),
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        n.alias("n_prev"),
        F.round(mean, 6).alias("roll_mean"),
        z.alias("z_score"),
    )


ROLLING_ZSCORE_SQL = f"""
SELECT user_id, event_id, ts, value, n_prev,
  round(mean, 6) AS roll_mean,
  CASE WHEN n_prev >= {ZSCORE_MIN_PREV} THEN
    round((value - mean) / sqrt(greatest(s2 / n_prev - mean * mean, {_VAR_FLOOR})), 6)
  END AS z_score
FROM (
  SELECT user_id, event_id, ts, value,
    COUNT(*) OVER w AS n_prev,
    CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) OVER w AS VARCHAR) AS DOUBLE)
      / COUNT(*) OVER w AS mean,
    CAST(CAST(SUM(CAST(CAST(value AS DECIMAL(28,10)) * CAST(value AS DECIMAL(28,10))
                       AS DECIMAL(38,10))) OVER w AS VARCHAR) AS DOUBLE) AS s2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {ZSCORE_LOOKBACK} PRECEDING AND 1 PRECEDING)
)
"""


def user_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival-time profile: gap statistics between
    consecutive events of the same user.

    Gaps are computed in integer microseconds (`unix_micros`) so the sums
    are exact (the per-user sum telescopes to last-first, so no overflow),
    and only converted to double seconds at the end with a fixed
    division order both engines reproduce bit-for-bit.

    Scale: the lag window hash-partitions on user_id; the groupBy that
    follows keys on the same column, so the aggregate reuses the window's
    partitioning -- one shuffle total, sized |users| out."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ; unix_micros needs TIMESTAMP. The session zone is
    # pinned to UTC (session.py), and gaps are differences, so the cast's
    # constant offset cancels in any case.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = (
        ev.select("user_id", (us - F.lag(us).over(w)).alias("gap_us"))
        .filter(F.col("gap_us").isNotNull())
    )
    n = F.count(F.lit(1))
    return gaps.groupBy("user_id").agg(
        n.alias("n_gaps"),
        (F.sum("gap_us").cast("double") / n.cast("double") / F.lit(1000000.0)).alias(
            "avg_gap_s"
        ),
        (F.min("gap_us").cast("double") / F.lit(1000000.0)).alias("min_gap_s"),
        (F.max("gap_us").cast("double") / F.lit(1000000.0)).alias("max_gap_s"),
    )


USER_INTERARRIVAL_SQL = """
WITH gaps AS (
  SELECT user_id,
    epoch_us(ts) - lag(epoch_us(ts))
      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT user_id, COUNT(*) AS n_gaps,
  CAST(SUM(gap_us) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1000000.0 AS avg_gap_s,
  CAST(MIN(gap_us) AS DOUBLE) / 1000000.0 AS min_gap_s,
  CAST(MAX(gap_us) AS DOUBLE) / 1000000.0 AS max_gap_s
FROM gaps WHERE gap_us IS NOT NULL
GROUP BY user_id
"""


def hourly_value_partials(ev: DataFrame) -> DataFrame:
    """Hour-grain mergeable partials: (count, exact decimal sum) per
    (hour, event_type). The decimal sum keeps the partial re-aggregable
    without float-order drift -- the same contract the continuous
    aggregate and the sketch rollups rely on."""
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(DEC)).alias("value_dec"),
    )


def rollup_cascade_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity rollup cascade: the DAILY rollup is computed
    from the HOURLY partials, never rescanning raw events (the
    hypertable / materialized-rollup cascade pattern).

    Correctness hinges on mergeability: count-of-counts and
    decimal-sum-of-decimal-sums are associative, so folding hour partials
    into days gives bit-identical answers to a direct daily scan -- which
    is exactly what the oracle computes. At 100 TB the hourly partials
    are ~|hours|x|types| rows, so the day fold is dim-sized work."""
    ev = load_table(spark, sf_dir, "events")
    h = hourly_value_partials(ev)
    return (
        h.groupBy(F.date_trunc("day", F.col("hour")).alias("day"), "event_type")
        .agg(
            # count("hour") not count(1): a NULL-timestamp slice folds
            # into a NULL-hour partial, which is not a distinct hour
            # (matches the oracle's COUNT(DISTINCT date_trunc('hour', ts)))
            F.count("hour").alias("n_hours"),
            F.sum("n_events").alias("n_events"),
            F.sum("value_dec").cast("double").alias("total_value"),
        )
    )


ROLLUP_CASCADE_DAILY_SQL = f"""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
  COUNT(DISTINCT date_trunc('hour', ts)) AS n_hours,
  COUNT(*) AS n_events,
  {dec_sum_sql('value')} AS total_value
FROM events GROUP BY 1, 2
"""


def props_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured shredding through Spark's VARIANT type: parse the
    raw JSON props once (`try_parse_json` -- malformed input yields null,
    never an exception), extract a typed path with `variant_get`, and
    aggregate over the shredded column.

    Versus get_json_object (props_metrics), VARIANT parses once into a
    binary-encoded tree, so N path extractions cost one parse -- the right
    ingestion shape when props grows real nesting. The decile bucketing
    shows a typed derived column composing with a plain hash aggregate."""
    ev = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.try_parse_json("props"), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type", F.floor(F.col("k") / 10).alias("k_decile"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
        )
    )


PROPS_VARIANT_SHRED_SQL = """
SELECT event_type,
  CAST(floor(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) / 10)
       AS BIGINT) AS k_decile,
  COUNT(*) AS n_events,
  CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
FROM events GROUP BY 1, 2
"""


# ------------------------------------------------- watermark late audit

#: micro-batch model for the batch twin of watermark accounting: events
#: arrive in event_id order, B per micro-batch, except the LATE class
#: (event_id % LATE_MOD == 0) which arrives LATE_SHIFT batches after its
#: slot -- the out-of-order tail a real ingest has. The testdata stream is
#: perfectly ordered, so the late class is derived deterministically.
WM_BATCH_SIZE = 500
WM_LATE_MOD = 41
WM_LATE_SHIFT = 10
WM_DELAY = "300"  # seconds, the withWatermark("ts", "5 minutes") analog


def watermark_late_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per micro-batch late-data accounting under a watermark policy --
    the audit that answers "how much data would withWatermark(D) drop?"
    BEFORE committing a streaming job to that D.

    Semantics mirror Structured Streaming exactly: the watermark advances
    at micro-batch boundaries to max(event time seen in ALL prior
    batches) - D; a row is late (dropped from stateful aggregation) if
    its event time is below its batch's watermark.

    Scale design: two narrow (ts, batch_id) scans of the stream -- one
    feeding the per-batch max aggregate, one the late-count -- and every
    exchange carries per-batch PARTIALS (map-side combined to |batches|
    rows per task), never events. The running-max frontier computes on
    the tiny aggregate frame (single-partition window over |batches|
    rows -- deliberately, that IS the driver-side watermark bookkeeping
    SS does) and broadcast-joins back to the second scan."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    k = F.col("event_id")
    batched = ev.select(
        "ts",
        (
            (k / WM_BATCH_SIZE).cast("long")
            + F.when(k % WM_LATE_MOD == 0, F.lit(WM_LATE_SHIFT)).otherwise(F.lit(0))
        ).alias("batch_id"),
    )
    frontier = (
        batched.groupBy("batch_id")
        .agg(F.max("ts").alias("batch_max"))
        .withColumn(
            "watermark",
            F.max("batch_max").over(
                W.orderBy("batch_id").rowsBetween(W.unboundedPreceding, -1)
            )
            - F.expr(f"INTERVAL {WM_DELAY} SECONDS"),
        )
        .select("batch_id", "watermark")
    )
    return (
        batched.join(F.broadcast(frontier), "batch_id")
        .groupBy("batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("ts") < F.col("watermark"), 1)).alias("n_late"),
            F.max("watermark").alias("watermark"),
        )
    )


WATERMARK_LATE_AUDIT_SQL = f"""
WITH batched AS (
  SELECT ts,
         CAST(floor(event_id / {WM_BATCH_SIZE}) AS BIGINT)
           + CASE WHEN event_id % {WM_LATE_MOD} = 0 THEN {WM_LATE_SHIFT}
                  ELSE 0 END AS batch_id
  FROM events
),
frontier AS (
  SELECT batch_id,
         max(batch_max) OVER (ORDER BY batch_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           - INTERVAL {WM_DELAY} SECOND AS watermark
  FROM (SELECT batch_id, max(ts) AS batch_max FROM batched GROUP BY 1)
)
SELECT b.batch_id,
       COUNT(*) AS n_events,
       COUNT(*) FILTER (WHERE b.ts < f.watermark) AS n_late,
       max(f.watermark) AS watermark
FROM batched b JOIN frontier f ON b.batch_id = f.batch_id
GROUP BY 1
"""


# ----------------------------------------------------- path mining

PATH_LEN = 3
TOP_PATHS = 10


def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event-type paths: the TOP_PATHS most frequent runs of
    PATH_LEN consecutive event types within a user's stream -- the
    "what do users actually do" complement to the fixed-steps funnel
    (which counts a GIVEN sequence; this discovers the frequent ones).

    One shuffle builds per-user ordered windows (lead x2 on the same
    user partitioning), one vocabulary-sized aggregate counts paths,
    and the final top-K is an orderBy+limit -- Spark compiles that to
    TakeOrdered (per-partition heads merged on the driver), so no
    single-reducer global sort exists. Ties break on the path string,
    making the cut deterministic.

    F.concat (NULL-PROPAGATING, like SQL ||) rather than concat_ws
    (which silently SKIPS NULLs, collapsing a>NULL>b into the 2-step
    a>b and inflating shorter paths' counts -- r9 mixed-nulls sweep):
    a run through an unknown event type is not a path. The single
    path IS NOT NULL filter covers BOTH exclusions -- an incomplete
    trailing window (lead past the stream end is NULL) and a NULL
    step inside the run null the whole concat identically."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    parts: list = [F.col("event_type")]
    for i in range(1, PATH_LEN):
        parts += [F.lit(">"), F.lead("event_type", i).over(w)]
    steps = e.select("user_id", F.concat(*parts).alias("path")).filter(
        F.col("path").isNotNull()
    )
    return (
        steps.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("path").asc())
        .limit(TOP_PATHS)
    )


_PATH_CONCAT = " || '>' || ".join(
    ["event_type"]
    + [f"lead(event_type, {i}) OVER w" for i in range(1, PATH_LEN)]
)

EVENTS_TOP_PATHS_SQL = f"""
WITH steps AS (
  SELECT {_PATH_CONCAT} AS path
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT path, COUNT(*) AS n
FROM steps WHERE path IS NOT NULL
GROUP BY path
ORDER BY n DESC, path ASC
LIMIT {TOP_PATHS}
"""


HIST_BINS = 8  # equi-width bins per event type


def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width value histogram per event type, empty bins included.

    Two aggregation passes: (1) per-type min/max -- a vocabulary-sized
    frame, map-side combinable -- broadcast back onto the events scan so
    the bin assignment `least(floor((value - lo) / width), B-1)` is a
    narrow projection; (2) per-(type, bin) counts, one shuffle on a
    bounded key space. The complete bin spine (so empty bins surface as
    zero rows) comes from exploding `sequence(0, B-1)` on the per-type
    bounds frame and left-joining the counts -- both sides are
    vocabulary-sized, never the corpus.

    At 100 TB the min/max pre-pass doubles the scan; production would
    fuse it away with fixed domain bounds or a quantile-sketch bound from
    the rollup cascade -- the bin pass itself is already one scan + one
    bounded-key shuffle. Bin arithmetic is plain IEEE double in literal
    order, bit-identical in the oracle; `width = 0` (constant series)
    collapses to bin 0 by guard rather than dividing by zero."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    ).withColumn(
        "width", (F.col("hi") - F.col("lo")) / F.lit(float(HIST_BINS))
    )
    bin_of = F.when(F.col("width") == 0.0, F.lit(0)).otherwise(
        F.least(
            F.floor((F.col("value") - F.col("lo")) / F.col("width")),
            F.lit(HIST_BINS - 1),
        )
    )
    counts = (
        ev.join(F.broadcast(bounds), "event_type")
        .select("event_type", bin_of.cast("int").alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    spine = (
        bounds
        .select(
            "event_type",
            "lo",
            "width",
            F.explode(F.sequence(F.lit(0), F.lit(HIST_BINS - 1))).alias("bin"),
        )
        .select(
            "event_type",
            "bin",
            F.round(F.col("lo") + F.col("bin") * F.col("width"), 6).alias("bin_lo"),
            F.round(F.col("lo") + (F.col("bin") + 1) * F.col("width"), 6).alias(
                "bin_hi"
            ),
        )
    )
    return spine.join(counts, ["event_type", "bin"], "left").select(
        "event_type",
        "bin",
        "bin_lo",
        "bin_hi",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
    )


VALUE_HISTOGRAM_SQL = f"""
WITH bounds AS (
  SELECT event_type, MIN(value) AS lo, MAX(value) AS hi,
         (MAX(value) - MIN(value)) / {float(HIST_BINS)!r} AS width
  FROM events GROUP BY event_type
),
counts AS (
  SELECT e.event_type,
         CAST(CASE WHEN b.width = 0.0 THEN 0
              ELSE least(floor((e.value - b.lo) / b.width), {HIST_BINS - 1})
              END AS INTEGER) AS bin,
         COUNT(*) AS n_events
  FROM events e JOIN bounds b USING (event_type)
  GROUP BY 1, 2
),
spine AS (
  SELECT event_type, CAST(r.range AS INTEGER) AS bin,
         {round_sql('lo + r.range * width', 6)} AS bin_lo,
         {round_sql('lo + (r.range + 1) * width', 6)} AS bin_hi
  FROM bounds CROSS JOIN range(0, {HIST_BINS}) r
)
SELECT s.event_type, s.bin, s.bin_lo, s.bin_hi,
       COALESCE(c.n_events, 0) AS n_events
FROM spine s LEFT JOIN counts c ON s.event_type = c.event_type AND s.bin = c.bin
"""


def value_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram per event type: bin edges at exact value
    quantiles, so every bin holds ~the same row count -- the histogram
    shape query optimizers keep as column statistics (equi-width shows
    the distribution, equi-depth shows the quantile structure; the pair
    is the standard stats page).

    Edge computation is one percentile aggregate per type (full sort
    per group -- fine on vocabulary-keyed groups; at 100 TB swap in
    approx_percentile, same call shape, bounded error, exactly the
    `events_value_percentiles` guidance). Edges broadcast back onto the
    scan; bin = how many interior edges sit at or below the value (a
    fixed-order fold over the HIST_BINS-1 edge array -- no per-row
    search structure), then counts shuffle on the bounded (type, bin)
    key. Duplicate quantile edges (heavy ties) yield empty bins by
    construction rather than miscounts."""
    ev = load_table(spark, sf_dir, "events")
    qs = [i / HIST_BINS for i in range(1, HIST_BINS)]
    edges = ev.groupBy("event_type").agg(
        F.expr(
            "percentile(value, array(" + ", ".join(repr(q) for q in qs) + "))"
        ).alias("edges")
    )
    bin_of = F.aggregate(
        F.col("edges"),
        F.lit(0),
        lambda acc, e: acc + F.when(F.col("value") >= e, 1).otherwise(0),
    )
    return (
        ev.join(F.broadcast(edges), "event_type")
        .select("event_type", bin_of.alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


_ED_QS = ", ".join(repr(i / HIST_BINS) for i in range(1, HIST_BINS))

VALUE_HISTOGRAM_EQUIDEPTH_SQL = f"""
WITH edges AS (
  SELECT event_type, quantile_cont(value, [{_ED_QS}]) AS edges
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       len(list_filter(edges, x -> e.value >= x)) AS bin,
       COUNT(*) AS n_events
FROM events e JOIN edges USING (event_type)
GROUP BY 1, 2
"""


# ---------------------------- interval concurrency (sweep-line, no sort)

_DAY_US = 86_400 * 1_000_000


def session_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-day PEAK concurrent sessions -- the "how many users
    were online at once" interval metric -- without a global sort.

    The naive sweep-line is one totally-ordered running sum over every
    session endpoint: a single-partition window that dies at scale.
    Here each session [start, end) is split into PER-DAY segments (one
    explode, bounded by days spanned), so the +1/-1 sweep partitions by
    DAY: running sums order only within a day's endpoints, and the
    day's peak is the max prefix.  Half-open semantics: a session
    ending at instant t is NOT concurrent with one starting at t
    (delta -1 sorts before +1 on ties); segment ends landing exactly on
    midnight emit no -1 (the segment just fills the day).  Equal
    (us, delta) rows are interchangeable, so the prefix-max is
    deterministic under any tie permutation.

    Output per day: peak_concurrency, n_active_sessions (sessions
    touching the day), n_sessions_started (sessions beginning in it).
    Session intervals come from the shared gap-based sessionizer
    (session_end = last event + gap, the presence window)."""
    sess = session_events(spark, sf_dir).select(
        F.unix_micros(F.col("session_start").cast("timestamp")).alias("s_us"),
        F.unix_micros(F.col("session_end").cast("timestamp")).alias("e_us"),
        F.col("session_start"),
        F.col("session_end"),
    )
    return daily_interval_peaks(sess)


def daily_interval_peaks(intervals: DataFrame) -> DataFrame:
    """The day-partitioned sweep-line over any half-open [s_us, e_us)
    interval frame (integer microseconds, e_us > s_us): per day, the
    exact peak number of simultaneously-open intervals plus active/
    started counts.  Shared by `session_concurrency` (sessions) and
    `orders_backlog` (order lifecycles) -- see session_concurrency's
    docstring for the semantics and scale argument."""
    segs = intervals.select(
        "s_us",
        "e_us",
        F.explode(
            F.sequence(
                F.date_trunc("DAY", F.timestamp_micros(F.col("s_us"))),
                F.date_trunc(
                    "DAY", F.timestamp_micros(F.col("e_us") - F.lit(1))
                ),
                F.expr("interval 1 day"),
            )
        ).alias("day"),
    ).withColumn("d_start_us", F.unix_micros(F.col("day")))
    pts = segs.select(
        "day",
        "s_us",
        F.explode(
            F.array(
                F.struct(
                    F.greatest(F.col("s_us"), F.col("d_start_us")).alias("us"),
                    F.lit(1).alias("delta"),
                ),
                F.struct(F.col("e_us").alias("us"), F.lit(-1).alias("delta")),
            )
        ).alias("p"),
        "d_start_us",
    ).select("day", "s_us", "p.us", "p.delta", "d_start_us")
    # collapse coincident boundaries BEFORE the day exchange (the
    # interval_stab_counts trick): every interval carried INTO a day
    # injects +1 at the same instant (the day start), so grouping on
    # (day, us, sign) with summed weights shrinks the sweep's frame
    # from O(intervals x days-open) to O(intervals + days), and the
    # groupBy's map-side partial combine does the big collapse before
    # any bytes move. The per-day counts survive as weighted sums:
    # actives = sum of positive collapsed deltas, starts = summed
    # started flags; the running max is unchanged because coincident
    # +1s raised the peak only at their shared instant anyway.
    pts = (
        pts.filter(
            (F.col("delta") == 1) | (F.col("us") < F.col("d_start_us") + _DAY_US)
        )
        .groupBy("day", "us", F.col("delta").alias("sign"))
        .agg(
            F.sum("delta").alias("delta"),
            F.sum(
                ((F.col("delta") == 1) & (F.col("us") == F.col("s_us"))).cast(
                    "long"
                )
            ).alias("n_started"),
        )
    )
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("day")
        .orderBy("us", "delta")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    run = pts.withColumn("c", F.sum("delta").over(w))
    return run.groupBy("day").agg(
        F.max("c").alias("peak_concurrency"),
        F.sum(F.when(F.col("sign") == 1, F.col("delta")).otherwise(0)).alias(
            "n_active_sessions"
        ),
        F.sum("n_started").alias("n_sessions_started"),
    )


SESSION_CONCURRENCY_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
         THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM flagged
), sessions AS (
  SELECT user_id, MIN(ts) AS session_start,
         MAX(ts) + INTERVAL '30 minutes' AS session_end
  FROM numbered GROUP BY user_id, sess_id
), segs AS (
  SELECT epoch_us(session_start) AS s_us, epoch_us(session_end) AS e_us,
         d.day, epoch_us(d.day) AS d_start_us
  FROM sessions,
       UNNEST(generate_series(
         date_trunc('day', session_start),
         date_trunc('day', session_end - INTERVAL 1 microsecond),
         INTERVAL 1 day)) AS d(day)
), pts AS (
  SELECT day, s_us, GREATEST(s_us, d_start_us) AS us, 1 AS delta,
         d_start_us FROM segs
  UNION ALL
  SELECT day, s_us, e_us, -1, d_start_us FROM segs
  WHERE e_us < d_start_us + {_DAY_US}
), run AS (
  SELECT day, s_us, us, delta,
         SUM(delta) OVER (PARTITION BY day ORDER BY us, delta
                          ROWS UNBOUNDED PRECEDING) AS c
  FROM pts
)
SELECT CAST(day AS TIMESTAMP) AS day,
       CAST(MAX(c) AS BIGINT) AS peak_concurrency,
       COUNT(CASE WHEN delta = 1 THEN 1 END) AS n_active_sessions,
       COUNT(CASE WHEN delta = 1 AND us = s_us THEN 1 END)
         AS n_sessions_started
FROM run GROUP BY day
"""


# ---------------------------- rolling distinct users (WAU over days)

WAU_WINDOW_DAYS = 7


def rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing-7-day distinct users per day (the rolling
    WAU/MAU dashboard metric) -- a SLIDING DISTINCT, which no window
    function computes exactly because distinct does not decompose over
    overlapping frames.

    The scalable exact form: collapse the corpus to distinct
    (user, active-day) pairs ONCE (the only corpus shuffle), then
    explode each pair onto the <= 7 report days it supports (a bounded
    x7 fan-out of the TINY pair frame, not the corpus) and count
    distinct users per report day.  Report days are clipped to the
    corpus's own day range in-plan (observed activity defines the
    calendar).  At 100 TB the swap-in is a per-day HLL sketch union
    (`sketch_distinct_rollup` is that machinery); this operator is the
    exact baseline that grades the sketch."""
    ev = load_table(spark, sf_dir, "events")
    pairs = ev.select(
        "user_id", F.date_trunc("DAY", F.col("ts")).alias("day")
    ).distinct()
    max_day = pairs.agg(F.max("day").alias("max_day"))
    fanned = (
        pairs.crossJoin(F.broadcast(max_day))
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    F.col("day"),
                    F.least(
                        F.col("day")
                        + F.expr(
                            f"INTERVAL {WAU_WINDOW_DAYS - 1} DAYS"
                        ),
                        F.col("max_day"),
                    ),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias("report_day"),
        )
    )
    return fanned.groupBy("report_day").agg(
        F.countDistinct("user_id").alias("wau")
    )


ROLLING_WAU_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
), bounds AS (
  SELECT MAX(day) AS max_day FROM pairs
), fanned AS (
  SELECT p.user_id, d.report_day
  FROM pairs p, bounds b,
       UNNEST(generate_series(
         p.day,
         LEAST(p.day + INTERVAL {WAU_WINDOW_DAYS - 1} DAYS, b.max_day),
         INTERVAL 1 DAY)) AS d(report_day)
)
SELECT CAST(report_day AS TIMESTAMP) AS report_day,
       COUNT(DISTINCT user_id) AS wau
FROM fanned GROUP BY 1
"""


def orders_backlog(
    spark: SparkSession, sf_dir: str, last_ship: DataFrame | None = None
) -> DataFrame:
    """Per-day order-backlog peaks: an order is OPEN from o_orderdate
    until its last line ships (half-open, fulfilled at the last
    l_shipdate instant) -- the operations dashboard twin of
    `session_concurrency`, riding the same `daily_interval_peaks`
    sweep.  Output columns keep the sweep's names: peak_concurrency =
    peak simultaneously-open orders, n_active_sessions = orders open at
    any point that day, n_sessions_started = orders placed that day.

    One shuffle builds per-order intervals (lineitem aggregates onto
    its order key, the order side broadcast-joins in key order at test
    scale / co-shuffles at 100 TB); degenerate intervals (last ship at
    or before the order instant -- absent in TPC-H data) are filtered
    rather than fed to the sweep, whose sequence() would run backwards
    on them.

    `last_ship` lets a composition (pipeline_orders_ops_report) pass a
    pre-materialized (l_orderkey, e_us) frame so the lineitem aggregate
    runs once per pipeline invocation instead of once per consumer;
    default = computed here, bit-identical."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("s_us"),
    )
    if last_ship is None:
        last_ship = _last_ship_per_order(spark, sf_dir)
    intervals = (
        orders.join(
            last_ship, orders.o_orderkey == last_ship.l_orderkey
        )
        .select("s_us", "e_us")
        .filter(F.col("e_us") > F.col("s_us"))
    )
    return daily_interval_peaks(intervals)


def _last_ship_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_orderkey, e_us): each order's last-line ship instant -- the
    shared upstream of both interval sweeps (orders_backlog,
    orders_open_at_start).

    The groupBy owns its exchange so the lineitem shuffle carries
    map-side-combined per-task maxima (partial_max below the fact
    exchange -- ~4:1 fewer shuffled rows at TPC-H shape, the dominant
    term at lake scale); width for the downstream sweep fan-out is then
    PINNED with a round-robin repartition AFTER the aggregate.  Round
    robin (not hash-on-key): a hash repartition with numPartitions ==
    shuffle.partitions collapses into the aggregate's
    ENSURE_REQUIREMENTS exchange at planning time, which AQE then
    coalesces -- the ~7 MB combined frame would land on a handful of
    partitions and the ~90x interval explode would run on those few
    cores (r12 stage profile: 36 CPU-s through 6 tasks, 6-8 s wall per
    sweep).  The pin's exchange moves only the per-order aggregate, and
    nothing downstream needs hash placement (the order join broadcasts
    / co-shuffles on its own).  The loader's round-robin rebalance
    stays off: the aggregate exchange already redistributes."""
    p = spark.sparkContext.defaultParallelism
    return (
        load_table(spark, sf_dir, "lineitem", rebalance=False)
        .groupBy("l_orderkey")
        .agg(
            F.max(
                F.unix_micros(F.col("l_shipdate").cast("timestamp"))
            ).alias("e_us")
        )
        .repartition(p)
    )


ORDERS_BACKLOG_SQL = f"""
WITH intervals AS (
  SELECT epoch_us(o.o_orderdate) AS s_us, last_ship.e_us
  FROM orders o
  JOIN (SELECT l_orderkey, MAX(epoch_us(l_shipdate)) AS e_us
        FROM lineitem GROUP BY 1) last_ship
    ON o.o_orderkey = last_ship.l_orderkey
  WHERE last_ship.e_us > epoch_us(o.o_orderdate)
), segs AS (
  SELECT s_us, e_us, d.day, epoch_us(d.day) AS d_start_us
  FROM intervals,
       UNNEST(generate_series(
         date_trunc('day', make_timestamp(s_us)),
         date_trunc('day', make_timestamp(e_us - 1)),
         INTERVAL 1 day)) AS d(day)
), pts AS (
  SELECT day, s_us, GREATEST(s_us, d_start_us) AS us, 1 AS delta,
         d_start_us FROM segs
  UNION ALL
  SELECT day, s_us, e_us, -1, d_start_us FROM segs
  WHERE e_us < d_start_us + {_DAY_US}
), run AS (
  SELECT day, s_us, us, delta,
         SUM(delta) OVER (PARTITION BY day ORDER BY us, delta
                          ROWS UNBOUNDED PRECEDING) AS c
  FROM pts
)
SELECT CAST(day AS TIMESTAMP) AS day,
       CAST(MAX(c) AS BIGINT) AS peak_concurrency,
       COUNT(CASE WHEN delta = 1 THEN 1 END) AS n_active_sessions,
       COUNT(CASE WHEN delta = 1 AND us = s_us THEN 1 END)
         AS n_sessions_started
FROM run GROUP BY day
"""


def interval_stab_counts(intervals: DataFrame) -> DataFrame:
    """Interval-stabbing JOIN via the day-partitioned sweep: for each
    interval's own start instant, how many intervals in the frame are
    open there (half-open [s_us, e_us) -- an interval IS open at its s,
    NOT at its e).  Input needs (iid, s_us, e_us); output (iid, n_open)
    where n_open INCLUDES the probe interval itself.

    The naive formulation is an inequality self-join (d.s <= p < d.e)
    -- quadratic pairs at 100 TB.  Here every boundary becomes a +/-1
    delta bucketed per overlapped day exactly like
    `daily_interval_peaks` (carried-in intervals inject +1 at the day
    start), probe points ride the SAME day-partitioned window ordered
    by (us, pri) with pri sequencing ends < starts < probes at an
    instant, and each probe reads the running sum -- one shuffle on
    day, windows bounded by per-day boundary counts.  The oracle runs
    the quadratic inequality join, so parity proves the sweep."""
    segs = intervals.select(
        "s_us",
        "e_us",
        F.explode(
            F.sequence(
                F.date_trunc("DAY", F.timestamp_micros(F.col("s_us"))),
                F.date_trunc(
                    "DAY", F.timestamp_micros(F.col("e_us") - F.lit(1))
                ),
                F.expr("interval 1 day"),
            )
        ).alias("day"),
    ).withColumn("d_start_us", F.unix_micros(F.col("day")))
    deltas = segs.select(
        "day",
        F.explode(
            F.array(
                F.struct(
                    F.greatest(F.col("s_us"), F.col("d_start_us")).alias("us"),
                    F.lit(1).alias("pri"),
                    F.lit(1).alias("delta"),
                ),
                F.struct(
                    F.col("e_us").alias("us"),
                    F.lit(-1).alias("pri"),
                    F.lit(-1).alias("delta"),
                ),
            )
        ).alias("p"),
        "d_start_us",
    ).select("day", "p.us", "p.pri", "p.delta", "d_start_us")
    # collapse coincident boundaries before the sweep: every interval
    # carried INTO a day injects +1 at the SAME instant (the day start,
    # same (day, us, pri)), so summing deltas per instant shrinks the
    # frame from O(intervals x days-open) to O(intervals + days) -- and
    # the groupBy's map-side partial combine means the big collapse
    # happens BEFORE any exchange. The running sum the probes read is
    # unchanged: probes (pri=2) order after all same-instant deltas, so
    # only the pre-summed total is ever observed.
    deltas = (
        deltas.filter(
            (F.col("pri") == 1) | (F.col("us") < F.col("d_start_us") + _DAY_US)
        )
        .groupBy("day", "us", "pri")
        .agg(F.sum("delta").alias("delta"))
        .withColumn("iid", F.lit(None).cast("long"))
    )
    probes = intervals.select(
        F.date_trunc("DAY", F.timestamp_micros(F.col("s_us"))).alias("day"),
        F.col("s_us").alias("us"),
        F.lit(2).alias("pri"),
        F.lit(0).cast("long").alias("delta"),
        F.col("iid"),
    )
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("day")
        .orderBy("us", "pri")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    run = deltas.unionByName(probes).withColumn("c", F.sum("delta").over(w))
    return run.filter(F.col("pri") == 2).select(
        "iid", F.col("c").alias("n_open")
    )


def orders_open_at_start(
    spark: SparkSession, sf_dir: str, last_ship: DataFrame | None = None
) -> DataFrame:
    """Per order: how many OTHER orders were already open (placed, not
    yet fully shipped) at its placement instant -- `orders_backlog`'s
    per-entity companion, and the repo's interval-stabbing join.  Same
    lifecycle definition as the backlog (open from o_orderdate until
    the last l_shipdate, half-open).  `last_ship`: see orders_backlog."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("s_us"),
    )
    if last_ship is None:
        last_ship = _last_ship_per_order(spark, sf_dir)
    intervals = (
        orders.join(last_ship, orders.o_orderkey == last_ship.l_orderkey)
        .select(F.col("o_orderkey").alias("iid"), "s_us", "e_us")
        .filter(F.col("e_us") > F.col("s_us"))
    )
    return interval_stab_counts(intervals).select(
        F.col("iid").alias("o_orderkey"),
        # the probe's own interval is open at its own start: exclude it
        (F.col("n_open") - F.lit(1)).alias("n_open_at_start"),
    )


ORDERS_OPEN_AT_START_SQL = """
WITH intervals AS (
  SELECT o.o_orderkey AS iid, epoch_us(o.o_orderdate) AS s_us, last_ship.e_us
  FROM orders o
  JOIN (SELECT l_orderkey, MAX(epoch_us(l_shipdate)) AS e_us
        FROM lineitem GROUP BY 1) last_ship
    ON o.o_orderkey = last_ship.l_orderkey
  WHERE last_ship.e_us > epoch_us(o.o_orderdate)
)
SELECT p.iid AS o_orderkey,
       CAST(COUNT(d.iid) AS BIGINT) AS n_open_at_start
FROM intervals p LEFT JOIN intervals d
  ON d.s_us <= p.s_us AND p.s_us < d.e_us AND d.iid <> p.iid
GROUP BY 1
"""


# ----------------------------------- RANGE-frame trailing time window

ROLLING_RANGE_MINUTES = 30
_RANGE_US = ROLLING_RANGE_MINUTES * 60 * 1_000_000


def rolling_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event, the user's trailing-30-minute activity (count + exact
    value sum, window inclusive at both ends) -- the RANGE-frame window
    mode (frame bounded by an ORDER-BY VALUE offset, not a row count),
    which none of the rows-frame operators exercise: with bursty
    streams, 'last N rows' and 'last 30 minutes' answer different
    questions, and rate-limit / velocity-check logic needs the latter.

    The frame orders by exact integer microseconds (the repo's ts
    discipline), so the range arithmetic is integer-exact in both
    engines; the value sum accumulates DECIMALS inside the frame (same
    argument as `running_user_value`: segment-tree vs running float
    accumulation differs, decimal addition is associative).  Scale: one
    user-partitioned sort window, corpus shuffles once on user_id."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    us = F.unix_micros(F.col("ts").cast("timestamp"))
    with_us = ev.select("event_id", "user_id", "ts", "value", us.alias("us"))
    w = (
        W.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-_RANGE_US, 0)
    )
    return with_us.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_events_30m"),
        F.round(
            F.sum(F.col("value").cast("decimal(28,10)")).over(w).cast("double"),
            6,
        ).alias("sum_value_30m"),
    )


ROLLING_TIME_WINDOW_SQL = f"""
SELECT event_id, user_id, ts,
  COUNT(*) OVER w AS n_events_30m,
  {round_sql("CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) OVER w AS VARCHAR) AS DOUBLE)", 6)}
    AS sum_value_30m
FROM (SELECT event_id, user_id, ts, value, epoch_us(ts) AS us FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY us
             RANGE BETWEEN {_RANGE_US} PRECEDING AND CURRENT ROW)
"""
