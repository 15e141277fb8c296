"""Temporal join operators over `events`: as-of join and range join.

The reference has no joins at all (SURVEY.md §2.6 -- verified; its only
join-like behavior is the JDBC sink PK upsert), but these two are the
canonical "operators Spark lacks built-in syntax for" in a streaming/
time-series engine, so the north-star surface includes them re-expressed
Spark-first:

  - AS-OF JOIN: for each left row, the single most recent right row with
    right.ts <= left.ts on the same key. NOT implemented as an inequality
    join (that's a per-key nested loop, O(n*m) at 100 TB): both sides go
    through ONE shuffle+sort on (key, ts, side) and a running
    last-non-null window carries the right side's latest values forward.
    Cost = sort-merge on the key -- the same plan shape Spark uses for a
    regular equi-join, and it streams at any scale.

  - RANGE JOIN (interval containment): events falling inside per-user
    intervals. NOT a nested loop either: intervals are exploded to the
    fixed-width time buckets they overlap, events map to exactly one
    bucket, and the join is a plain equi-join on (user_id, bucket) plus a
    residual range filter. With interval length <= bucket width each
    interval lands in at most 2 buckets, so the blow-up factor is
    bounded by 2 regardless of data volume (the standard trick behind
    Spark's own range-join optimizations in Delta/Photon).

The DuckDB oracles intentionally use *different* formulations (native
ASOF JOIN, plain inequality join) -- independent implementations agreeing
on every row is the point of the gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from streamprocessing_with_kafka_spark.functions.numeric import dec_sum, dec_sum_sql
from streamprocessing_with_kafka_spark.sources.tables import load_table

# --------------------------------------------------------------- as-of join

LEFT_TYPE = "purchase"
RIGHT_TYPE = "view"


def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase joined to the same user's most recent view at-or-
    before it (left join: unmatched purchases keep null view columns).

    Single shuffle: window over (user_id) ordered by (ts, side,
    event_id) with the right side sorted first at equal ts, so the match
    is inclusive (right.ts <= left.ts), mirroring ASOF JOIN's >= bound;
    event_id makes the order TOTAL -- without it, two same-side events
    with identical timestamps would make F.last's pick depend on shuffle
    order, breaking run-to-run determinism (no such tie exists in the
    fixtures, but real event streams have them).

    The carried right row is ONE struct so that `ignorenulls` is purely
    STRUCTURAL (NULL iff the window row is a left row): carrying ts and
    value as two separate last-ignore-nulls columns would skip past a
    matched view whose value is genuinely NULL to an older view's value
    -- the same conflation as the r8 gapfill near-miss, and exactly what
    the r9 mixed-nulls sweep caught here.

    A view with NULL ts or NULL user_id can never be a match under the
    join's SQL semantics (`p.ts >= v.ts` / `p.user_id = v.user_id` are
    never true against NULL), but unfiltered it WOULD sit in the window
    scan -- Spark sorts NULL ts FIRST, so its struct (non-NULL even with
    view_ts NULL) would be carried as the "match" for every purchase
    before the first real view (the r9 ADVICE latent bug, proved by the
    r10 mixed_keys sweep). Gate side-0 rows on both. NULL-ts/NULL-user
    purchases need no gate: they sort before every surviving view (or
    share a partition with no views), so they come out unmatched --
    exactly the oracle's LEFT-join result.
    """
    ev = load_table(spark, sf_dir, "events")
    both = ev.filter(F.col("event_type").isin(LEFT_TYPE, RIGHT_TYPE)).withColumn(
        "side", F.when(F.col("event_type") == RIGHT_TYPE, 0).otherwise(1)
    ).filter(
        (F.col("side") == 1)
        | (F.col("ts").isNotNull() & F.col("user_id").isNotNull())
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    right_row = F.last(
        F.when(
            F.col("side") == 0,
            F.struct(
                F.col("ts").alias("view_ts"),
                F.col("value").alias("view_value"),
            ),
        ),
        ignorenulls=True,
    ).over(w)
    return (
        both.withColumn("m", right_row)
        .filter(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            "value",
            F.col("m.view_ts").alias("view_ts"),
            F.col("m.view_value").alias("view_value"),
        )
    )


ASOF_JOIN_EVENTS_SQL = f"""
-- NULL-ts purchases are pulled OUT of the ASOF and re-added unmatched:
-- `p.ts >= v.ts` is never true against NULL under standard three-valued
-- logic, but DuckDB 1.0.0's ASOF sort-merge treats NULL instants as
-- comparable and fabricates matches (observed: NULL-ts purchases paired
-- with NULL-ts views, r10 mixed_keys sweep). NULL-ts / NULL-user views
-- are likewise gated: they can never be a match.
SELECT p.event_id, p.user_id, p.ts, p.value,
       v.ts AS view_ts, v.value AS view_value
FROM (SELECT * FROM events
      WHERE event_type = '{LEFT_TYPE}' AND ts IS NOT NULL) p
ASOF LEFT JOIN (SELECT * FROM events
                WHERE event_type = '{RIGHT_TYPE}'
                  AND ts IS NOT NULL AND user_id IS NOT NULL) v
  ON p.user_id = v.user_id AND p.ts >= v.ts
UNION ALL
SELECT event_id, user_id, ts, value, NULL AS view_ts, NULL AS view_value
FROM events WHERE event_type = '{LEFT_TYPE}' AND ts IS NULL
"""

#: as-of match window: a view older than this is stale context, not a match
#: (48 h splits the fixture's match-age distribution near its median, so
#: the bound provably binds without going vacuous either way)
ASOF_TOLERANCE_S = 172_800


def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness bound (pandas merge_asof(tolerance=),
    kdb wj): the most recent view at-or-before the purchase counts ONLY
    if it is at most ASOF_TOLERANCE_S old -- otherwise the purchase keeps
    null view columns. Correct by construction: if the nearest preceding
    view is out of tolerance, every earlier one is too.

    Plan is the same single shuffle as `asof_join_events` (one window
    over user_id, tolerance applied as a post-window null-out) -- the
    bound adds zero exchanges. A microsecond-exact integer timestamp
    difference keeps the predicate engine-deterministic."""
    base = asof_join_events(spark, sf_dir)
    # ts is TIMESTAMP_NTZ; unix_micros needs TIMESTAMP. The session zone
    # is pinned UTC, so the cast is a type change, not a value change.
    age_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.col("view_ts").cast("timestamp")
    )
    fresh = F.col("view_ts").isNotNull() & (
        age_us <= ASOF_TOLERANCE_S * 1_000_000
    )
    return base.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.when(fresh, F.col("view_ts")).alias("view_ts"),
        F.when(fresh, F.col("view_value")).alias("view_value"),
    )


ASOF_JOIN_TOLERANCE_SQL = f"""
-- same NULL gates as ASOF_JOIN_EVENTS_SQL (DuckDB's ASOF treats NULL
-- instants as comparable): NULL-ts purchases re-enter unmatched, and
-- unmatchable views never enter the ASOF at all.
SELECT event_id, user_id, ts, value,
       CASE WHEN fresh THEN view_ts END AS view_ts,
       CASE WHEN fresh THEN view_value END AS view_value
FROM (
  SELECT p.event_id, p.user_id, p.ts, p.value, v.ts AS view_ts,
         v.value AS view_value,
         v.ts IS NOT NULL AND epoch_us(p.ts) - epoch_us(v.ts)
           <= {ASOF_TOLERANCE_S}::BIGINT * 1000000 AS fresh
  FROM (SELECT * FROM events
        WHERE event_type = '{LEFT_TYPE}' AND ts IS NOT NULL) p
  ASOF LEFT JOIN (SELECT * FROM events
                  WHERE event_type = '{RIGHT_TYPE}'
                    AND ts IS NOT NULL AND user_id IS NOT NULL) v
    ON p.user_id = v.user_id AND p.ts >= v.ts
  UNION ALL
  SELECT event_id, user_id, ts, value, NULL, NULL, false
  FROM events WHERE event_type = '{LEFT_TYPE}' AND ts IS NULL
)
"""

# --------------------------------------------------------------- range join

INTERVAL_TYPE = "signup"
RANGE_HOURS = 1  # interval length == bucket width -> <= 2 buckets/interval


def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per signup: count + sum of the user's events in the following hour
    (strictly after the signup, inclusive of the boundary ts + 1h).

    Equi-join on (user_id, hour-bucket) with a residual range filter --
    the interval side explodes to the <= 2 buckets it overlaps, the
    event side maps to exactly 1, so no nested loop at any scale.
    """
    ev = load_table(spark, sf_dir, "events")
    bucket = (F.unix_timestamp("ts") / (3600 * RANGE_HOURS)).cast("long")
    intervals = (
        ev.filter(F.col("event_type") == INTERVAL_TYPE)
        .select(
            F.col("event_id").alias("signup_id"),
            F.col("user_id").alias("s_user"),
            F.col("ts").alias("start_ts"),
            (F.col("ts") + F.expr(f"INTERVAL {RANGE_HOURS} HOUR")).alias("end_ts"),
        )
        .withColumn(
            "s_bucket",
            # explode_OUTER: a NULL-ts signup has a NULL bucket sequence,
            # and plain explode would erase the signup entirely -- but the
            # contract (and the oracle's LEFT JOIN) keeps every signup as
            # a group, with zero matches when its interval is undefined
            # (r10 mixed_keys sweep).
            F.explode_outer(
                F.sequence(
                    (F.unix_timestamp("start_ts") / (3600 * RANGE_HOURS)).cast("long"),
                    (F.unix_timestamp("end_ts") / (3600 * RANGE_HOURS)).cast("long"),
                )
            ),
        )
    )
    hits = intervals.join(
        ev.withColumn("e_bucket", bucket),
        (F.col("s_user") == F.col("user_id"))
        & (F.col("s_bucket") == F.col("e_bucket"))
        & (F.col("ts") > F.col("start_ts"))
        & (F.col("ts") <= F.col("end_ts")),
        "left",
    )
    return hits.groupBy(
        "signup_id", F.col("s_user").alias("user_id")
    ).agg(
        F.count(F.col("event_id")).alias("n_events"),
        dec_sum(F.col("value")).alias("sum_value"),
    )


RANGE_JOIN_EVENTS_SQL = f"""
WITH s AS (
  SELECT event_id AS signup_id, user_id, ts AS start_ts,
         ts + INTERVAL {RANGE_HOURS} HOUR AS end_ts
  FROM events WHERE event_type = '{INTERVAL_TYPE}'
)
SELECT s.signup_id, s.user_id,
       COUNT(e.event_id) AS n_events,
       {dec_sum_sql('e.value')} AS sum_value
FROM s LEFT JOIN events e
  ON e.user_id = s.user_id AND e.ts > s.start_ts AND e.ts <= s.end_ts
GROUP BY s.signup_id, s.user_id
"""


SKEW_SALT = 8


def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join: the skew-proof rewrite for a shuffle join whose key
    distribution is hot (one supplier taking 30% of lineitem would pin
    one reducer at 100 TB; AQE skew-split helps per-stage, salting fixes
    the layout).

    The fact side derives a salt from its own PK (deterministic, retry
    stable); the dim side replicates each row SKEW_SALT times via
    explode(sequence(...)), so every (key, salt) bucket finds its match
    and the hot key spreads over SKEW_SALT reducers. Pure physical
    rewrite: the oracle is the plain unsalted join."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    # coalesce BEFORE pmod: a NULL salt source would NULL the salt and
    # the (key, salt) equi-join would silently drop rows the unsalted
    # join keeps -- salting is a physical rewrite and must never change
    # the result set (r10 mixed_keys sweep).
    fact = li.withColumn(
        "_salt",
        F.pmod(F.coalesce(F.col("l_orderkey"), F.lit(0)), F.lit(SKEW_SALT)),
    )
    dim = s.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(SKEW_SALT - 1)))
    )
    return (
        fact.join(
            dim,
            (fact.l_suppkey == dim.s_suppkey) & (fact._salt == dim._salt),
        )
        .groupBy("s_suppkey", "s_name")
        .agg(
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


SALTED_SKEW_JOIN_SQL = f"""
SELECT s_suppkey, s_name,
  {dec_sum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
  COUNT(*) AS n_lines
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_suppkey, s_name
"""


def full_outer_user_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two per-(user, day) aggregates -- purchase
    activity vs error activity. Either side can be missing for a given
    user-day, so both null-extension directions are exercised; coalesced
    zero counts make the gaps explicit.

    Both inputs aggregate on the SAME (user_id, day) key, so they come out
    of their groupBys hash-partitioned identically and the full-outer
    sort-merge join adds no third exchange. A broadcast strategy is
    impossible for full-outer (both sides must see unmatched rows), which
    is why key co-partitioning is the lever that matters here."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", day)
        .agg(F.count(F.lit(1)).alias("n_purchases"), dec_sum("value").alias("purchase_value"))
    )
    errors = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", day)
        .agg(F.count(F.lit(1)).alias("n_errors"))
    )
    return purchases.join(errors, ["user_id", "day"], "full_outer").select(
        "user_id",
        "day",
        F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        F.coalesce("n_errors", F.lit(0)).alias("n_errors"),
        "purchase_value",
    )


FULL_OUTER_USER_DAYS_SQL = f"""
WITH purchases AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         COUNT(*) AS n_purchases, {dec_sum_sql('value')} AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
),
errors AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         COUNT(*) AS n_errors
  FROM events WHERE event_type = 'error' GROUP BY 1, 2
)
SELECT COALESCE(p.user_id, e.user_id) AS user_id,
       COALESCE(p.day, e.day) AS day,
       COALESCE(n_purchases, 0) AS n_purchases,
       COALESCE(n_errors, 0) AS n_errors,
       purchase_value
FROM purchases p FULL OUTER JOIN errors e
  ON p.user_id = e.user_id AND p.day = e.day
"""


# ------------------------------------------------------ nearest-event join

def nearest_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-event join: each purchase paired with the same user's
    closest view in EITHER time direction (kdb's `aj` is backward-only;
    window analytics often want the nearest reading, e.g. sensor
    calibration).  Ties (equidistant before/after) take the earlier
    view; a view at the exact purchase instant is a 0-gap 'before'
    match.

    Same single-shuffle shape as `asof_join_events`: one (user_id)
    window ordered by (ts, side, event_id) -- views sort before
    purchases at an instant -- carries the latest preceding view
    forward AND the first following view backward; the verdict is a
    row-local integer-microsecond comparison.  No inequality join.
    The DuckDB oracle is a LEFT JOIN LATERAL ordered by absolute gap
    (a per-row nested loop -- fine single-node, the thing this plan
    avoids at scale).

    NULL gates (r10 mixed_keys class): views with NULL ts or NULL
    user_id can never match under the lateral's equality/distance
    semantics, and a purchase with NULL ts has no defined distance to
    anything -- both sides drop them (the oracle mirrors this with
    explicit IS NOT NULL). NULL-user purchases survive the scan but
    their partition holds no views, so the inner-join filter drops
    them, matching the lateral's empty result."""
    ev = load_table(spark, sf_dir, "events")
    both = ev.filter(
        F.col("event_type").isin(LEFT_TYPE, RIGHT_TYPE)
    ).filter(
        F.col("ts").isNotNull()
        & ((F.col("event_type") == LEFT_TYPE) | F.col("user_id").isNotNull())
    ).withColumn(
        "side", F.when(F.col("event_type") == RIGHT_TYPE, 0).otherwise(1)
    ).withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
    order = [F.col("ts"), F.col("side"), F.col("event_id")]
    wprev = (
        W.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wnext = (
        W.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(1, W.unboundedFollowing)
    )
    view_ts = F.when(F.col("side") == 0, F.col("ts_us"))
    prev_us = F.last(view_ts, ignorenulls=True).over(wprev)
    next_us = F.first(view_ts, ignorenulls=True).over(wnext)
    prev_gap = F.col("ts_us") - F.col("prev_us")
    next_gap = F.col("next_us") - F.col("ts_us")
    take_prev = F.col("prev_us").isNotNull() & (
        F.col("next_us").isNull() | (prev_gap <= next_gap)
    )
    nearest_us = F.when(take_prev, F.col("prev_us")).otherwise(F.col("next_us"))
    return (
        both.withColumn("prev_us", prev_us)
        .withColumn("next_us", next_us)
        .filter(F.col("side") == 1)
        .filter(nearest_us.isNotNull())
        .select(
            "event_id",
            "user_id",
            "ts",
            F.timestamp_micros(nearest_us).alias("nearest_view_ts"),
            F.when(take_prev, prev_gap).otherwise(next_gap).alias("gap_us"),
            F.when(take_prev, F.lit("before")).otherwise(F.lit("after")).alias(
                "direction"
            ),
        )
    )


NEAREST_JOIN_EVENTS_SQL = f"""
SELECT p.event_id, p.user_id, p.ts,
       l.view_ts AS nearest_view_ts,
       l.gap_us,
       CASE WHEN l.view_ts <= p.ts THEN 'before' ELSE 'after' END AS direction
FROM (SELECT * FROM events
      WHERE event_type = '{LEFT_TYPE}' AND ts IS NOT NULL) p
JOIN LATERAL (
  SELECT v.ts AS view_ts,
         abs(epoch_us(v.ts) - epoch_us(p.ts)) AS gap_us
  FROM events v
  WHERE v.event_type = '{RIGHT_TYPE}' AND v.user_id = p.user_id
    AND v.ts IS NOT NULL
  ORDER BY abs(epoch_us(v.ts) - epoch_us(p.ts)), v.ts
  LIMIT 1
) l ON true
"""
