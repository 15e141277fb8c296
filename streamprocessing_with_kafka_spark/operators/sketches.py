"""Approximate sketch operators over `events`: HyperLogLog distinct
counts and approximate quantiles.

These are the constant-memory summaries a 100 TB pipeline uses where an
exact answer would need a full shuffle of the key space:

  - `approx_distinct_users`: HLL++ (`approx_count_distinct`) -- a few KB
    of state per group regardless of cardinality, map-side combinable,
    one narrow aggregate instead of an expand-dedupe-count shuffle.
  - `approx_value_quantiles`: Greenwald-Khanna (`percentile_approx`) --
    mergeable per-partition summaries, no global sort.

Value-level oracle parity is impossible by construction: both engines
implement DIFFERENT sketch algorithms (DuckDB's approx_count_distinct is
its own HLL variant), so the raw estimates can never hash-equal.  The
REGISTERED queries are therefore *verdict frames* (r6 verdict item 3):
the engine computes BOTH the sketch estimate and the exact answer, and
emits the bounded-error verdict AS DATA -- exact-derived columns plus a
boolean per estimate -- which the DuckDB oracle states literally (exact
aggregates + literal TRUE).  A sketch whose error leaves its published
bound flips the boolean and the driver's hash check goes red: the
correct correctness statement for an approximate operator, now as a
hard driver signal instead of a local-only pytest bound.  The raw
estimate frames remain the composition surface (approx_distinct_users,
approx_value_quantiles, value_quantile_rollup, distinct_users_rollup)
and keep their error-bound tests in tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from streamprocessing_with_kafka_spark.sources.tables import load_table

RSD = 0.02  # requested relative standard deviation for HLL

#: Serialized size of an EMPTY KLL double sketch (the preamble alone,
#: zero retained items) under Spark's kll_sketch_agg_double.  Used to
#: drop empty per-day sketches (the merge identity) before the rollup
#: fold; tests/test_sketches.py pins that an all-NULL column serializes
#: to exactly this many bytes, so an Apache DataSketches serialization
#: change turns this assumption red instead of silently re-admitting
#: un-queryable empty sketches (ADVICE r8).
KLL_EMPTY_SERIALIZED_BYTES = 8


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: approximate distinct users + exact event count."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=RSD).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


def approx_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: approximate p50/p95/p99 of `value`."""
    ev = load_table(spark, sf_dir, "events")
    q = F.percentile_approx("value", [0.5, 0.95, 0.99], 10_000)
    return ev.groupBy("event_type").agg(
        q.getItem(0).alias("p50"),
        q.getItem(1).alias("p95"),
        q.getItem(2).alias("p99"),
    )


def kll_daily_value_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, sk, n): per-day KLL sketches of `value` -- the materialized
    summary table of the sketch-rollup pattern. Each sketch is ~KB
    regardless of row count, built in one map-side-combinable aggregate."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.kll_sketch_agg_double("value").alias("sk"),
        F.count(F.lit(1)).alias("n"),
    )


def value_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global p50/p95/p99 of `value` answered from MERGED per-day KLL
    sketches -- the mergeable-summary pattern that makes quantiles over
    arbitrary time ranges O(|days|) instead of a rescan of raw data.

    At 100 TB the daily sketch table IS the stored artifact (a few KB per
    day); any range query folds the covered days' sketches with the
    binary kll_sketch_merge (KLL merge is lossless w.r.t. its error
    bound: the merged sketch carries the SAME rank-error guarantee as one
    built over the concatenated data -- unlike merged GK/percentile_approx
    summaries, whose error degrades under merge). The fold runs over a
    collect_list of sketch blobs: summary-sized by construction, never
    row data."""
    daily = kll_daily_value_sketches(spark, sf_dir)
    # a day whose values are ALL NULL still aggregates to a non-null
    # EMPTY sketch (the preamble alone, zero retained items -- size
    # pinned by KLL_EMPTY_SERIALIZED_BYTES and its test), which
    # kll_sketch_get_quantile_double rejects as un-queryable. An
    # empty sketch is the merge identity, so dropping it changes nothing
    # mathematically; if EVERY day is empty the fold seeds NULL and the
    # quantiles come back NULL (the all-null-input contract).
    daily = daily.filter(F.length("sk") > KLL_EMPTY_SERIALIZED_BYTES)
    merged = daily.agg(F.collect_list("sk").alias("sks")).select(
        F.aggregate(
            F.slice("sks", 2, 1 << 30),
            # try_element_at: an EMPTY sketch list (no events) must seed
            # the fold with NULL and yield null quantiles -- plain
            # element_at throws INVALID_ARRAY_INDEX under ANSI mode
            F.try_element_at("sks", F.lit(1)),
            lambda acc, x: F.kll_sketch_merge_double(acc, x),
        ).alias("sk"),
    )
    return merged.select(
        F.kll_sketch_get_quantile_double("sk", F.lit(0.5)).alias("p50"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.95)).alias("p95"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.99)).alias("p99"),
    )


def hll_daily_user_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, sk, n): per-day DataSketches HLL blobs of user_id -- the
    distinct-count side of the mergeable-summary pattern."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("n"),
    )


def distinct_users_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global distinct users answered by UNIONING per-day HLL sketches
    (hll_union_agg is a true aggregate -- no fold needed). The union
    deduplicates users active on many days, which a sum of daily distinct
    counts cannot do: summaries stay a few KB per day, and any time range
    answers in O(|days|) without touching raw events."""
    daily = hll_daily_user_sketches(spark, sf_dir)
    return daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("distinct_users"),
        F.sum("n").alias("n_events"),
    )


# --------------------------------------------- verdict frames (driver)
#
# The driver-registered surface for the four approximate queries above:
# estimate + exact computed in ONE engine pass, verdict emitted as data.
# Bounds are deliberately LOOSER than the sketches' published guarantees
# (2.5-3x sigma) so the verdict holds for a correct implementation at any
# SF, while any real defect (wrong hash family, broken merge, dropped
# partition) blows far past them. Caveat: HLL/GK are deterministic given
# the data, but KLL compaction is RANDOMIZED -- at ~3x the 99%-confidence
# bound a spurious flip of sketch_quantile_rollup's booleans is
# vanishingly rare, not impossible; a red there warrants a
# rerun-to-confirm before being treated as a defect.

#: HLL verdict bound: rsd=0.02 -> 2.5 sigma = 5%, plus a small absolute
#: slack so near-empty groups can never flap on integer rounding.
HLL_REL_BOUND = 0.05
HLL_ABS_SLACK = 4

#: rank-error verdict bound for percentile_approx(accuracy=10_000)
#: (guarantee: 1e-4) -- 50x slack absorbs duplicate-heavy columns.
GK_RANK_EPS = 0.005

#: rank-error verdict bound for merged KLL (k=200 -> ~1.65% at 99%
#: confidence; merge preserves the bound) -- ~3x slack.
KLL_RANK_EPS = 0.05


def _hll_within(approx_col, exact_col):
    """|approx - exact| <= max(rel * exact, abs slack), as a Column.
    NULL estimate (sketch union over ZERO days) is within-bound iff the
    exact count is also 0 -- keeps the empty-table degenerate sweep
    green without masking a real NULL-on-data defect."""
    within = F.abs(
        approx_col.cast("double") - exact_col.cast("double")
    ) <= F.greatest(
        exact_col.cast("double") * HLL_REL_BOUND, F.lit(float(HLL_ABS_SLACK))
    )
    return F.coalesce(within, exact_col.cast("double") == 0.0)


def distinct_users_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver verdict frame for `sketch_distinct_users`: per event type,
    the exact event count plus `within_bound` = the HLL++ estimate lies
    within HLL_REL_BOUND of the exact distinct count.  One grouped
    aggregate computes estimate and exact side by side (the exact
    distinct is the verification cost, not the production query --
    production reads approx_distinct_users)."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=RSD).alias("approx_users"),
        F.count_distinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return agg.select(
        "event_type",
        "n_events",
        _hll_within(F.col("approx_users"), F.col("exact_users")).alias(
            "within_bound"
        ),
    )


DISTINCT_USERS_VERDICT_SQL = """
SELECT event_type, COUNT(*) AS n_events, TRUE AS within_bound
FROM events GROUP BY event_type
"""


def _rank_ok(value_col, approx_col, q: float, eps: float, n_col):
    """Exact rank check: the approx quantile's rank window
    [count(<), count(<=)] must intersect [(q-eps)n, (q+eps)n].
    NULL-safe: an all-NULL (or empty) slice yields 0 counts and a
    vacuously-true verdict on both engines."""
    cnt_lt = F.count(F.when(value_col < approx_col, 1)).cast("double")
    cnt_le = F.count(F.when(value_col <= approx_col, 1)).cast("double")
    n = n_col.cast("double")
    return (cnt_lt <= (q + eps) * n) & (cnt_le >= (q - eps) * n)


def value_quantiles_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver verdict frame for `sketch_value_quantiles`: per event
    type, exact row count plus one rank-check boolean per approximate
    quantile (p50/p95/p99).  Two passes over events: the sketch
    aggregate, then a broadcast-join rank verification -- the exact
    counts are the verification harness, never the production path."""
    ev = load_table(spark, sf_dir, "events")
    q = F.percentile_approx("value", [0.5, 0.95, 0.99], 10_000)
    approx = ev.groupBy(F.col("event_type").alias("et")).agg(
        q.getItem(0).alias("a50"),
        q.getItem(1).alias("a95"),
        q.getItem(2).alias("a99"),
    )
    # null-safe equi-join keeps the NULL event_type group (a plain
    # equi-join would silently drop it from the verdict)
    joined = ev.join(
        F.broadcast(approx), F.col("event_type").eqNullSafe(F.col("et"))
    ).select("event_type", "value", "a50", "a95", "a99")
    nn = F.count("value")
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        _rank_ok(F.col("value"), F.col("a50"), 0.5, GK_RANK_EPS, nn).alias("p50_ok"),
        _rank_ok(F.col("value"), F.col("a95"), 0.95, GK_RANK_EPS, nn).alias("p95_ok"),
        _rank_ok(F.col("value"), F.col("a99"), 0.99, GK_RANK_EPS, nn).alias("p99_ok"),
    )


VALUE_QUANTILES_VERDICT_SQL = """
SELECT event_type, COUNT(*) AS n_events,
       TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
FROM events GROUP BY event_type
"""


def quantile_rollup_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver verdict frame for `sketch_quantile_rollup`: ONE row --
    exact global row count plus a rank-check boolean per KLL-merged
    quantile.  The merged sketch's p50/p95/p99 ride a 1-row broadcast
    into the exact rank aggregate (the in-plan scalar pattern), so the
    verdict proves the whole per-day-sketch -> merge -> query chain."""
    ev = load_table(spark, sf_dir, "events")
    rolled = value_quantile_rollup(spark, sf_dir)
    joined = ev.crossJoin(F.broadcast(rolled))
    nn = F.count("value")
    return joined.agg(
        F.count(F.lit(1)).alias("n_events"),
        _rank_ok(F.col("value"), F.col("p50"), 0.5, KLL_RANK_EPS, nn).alias("p50_ok"),
        _rank_ok(F.col("value"), F.col("p95"), 0.95, KLL_RANK_EPS, nn).alias("p95_ok"),
        _rank_ok(F.col("value"), F.col("p99"), 0.99, KLL_RANK_EPS, nn).alias("p99_ok"),
    )


QUANTILE_ROLLUP_VERDICT_SQL = """
SELECT COUNT(*) AS n_events, TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
FROM events
"""


def distinct_rollup_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver verdict frame for `sketch_distinct_rollup`: ONE row --
    exact global event count plus `within_bound` = the union of per-day
    HLL sketches estimates global distinct users within HLL_REL_BOUND
    of the exact answer.  Proves the union actually DEDUPLICATES users
    across days (the failure mode of summing daily distincts would land
    ~|days|x over the exact count, far outside any bound)."""
    ev = load_table(spark, sf_dir, "events")
    rolled = distinct_users_rollup(spark, sf_dir).select("distinct_users")
    exact = ev.agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return exact.crossJoin(F.broadcast(rolled)).select(
        "n_events",
        _hll_within(F.col("distinct_users"), F.col("exact_users")).alias(
            "within_bound"
        ),
    )


DISTINCT_ROLLUP_VERDICT_SQL = """
SELECT COUNT(*) AS n_events, TRUE AS within_bound FROM events
"""


# ------------------------------------------------ count-min sketch

CM_DEPTH = 4
CM_WIDTH = 1024
#: fixed probe set: the engine's stopword list (frequent) + planted
#: rare-ish tokens; a production deployment probes whatever it likes --
#: the registered query needs a DETERMINISTIC probe set for the oracle
CM_PROBES_FROM_STOPWORDS = True


def cm_cell_structs(term_col):
    """The CM_DEPTH (d, idx) cell structs for a term column -- THE
    single definition of the sketch's cell addressing, shared by the
    batch builder, the batch prober, and the streaming twin
    (`streaming/count_min.py`): cell-for-cell parity between them is
    the family's core invariant, so the hash/band expression exists
    exactly once."""
    from streamprocessing_with_kafka_spark.functions.hashing import (
        family_hashes_from_h,
        md5_long,
    )

    hashes = family_hashes_from_h(md5_long(term_col), CM_DEPTH)
    return F.array(
        *[
            F.struct(F.lit(p).alias("d"), (h % CM_WIDTH).alias("idx"))
            for p, h in enumerate(hashes)
        ]
    )


def count_min_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) over the token
    stream, evaluated on a fixed probe set: per probe term, the true
    count and the CM estimate = min over CM_DEPTH rows of the probed
    counter.  The POINT-FREQUENCY member of the mergeable-sketch family
    (KLL = quantiles, HLL = distincts): CM_DEPTH x CM_WIDTH integers
    summarize an unbounded vocabulary, counters are additive so per-day
    sketches merge by cell-wise sum, and estimates only ever OVERCOUNT
    (collision noise adds, never subtracts) -- the one-sided guarantee
    `test_sketches.py` pins.

    Build shape: the corpus collapses to vocab-sized term counts FIRST
    (one map-side-combinable shuffle); the CM_DEPTH-way expansion and
    the (d, idx) cell sum run on the vocabulary, never the token
    stream.  Hashes are the repo's Carter-Wegman md5 family
    (`functions/hashing.py`) so the DuckDB oracle reproduces the sketch
    CELL-FOR-CELL -- the parity check proves the whole construction,
    not just the estimates."""
    from streamprocessing_with_kafka_spark.operators.text import (
        EN_STOPWORDS,
        _tokens,
    )

    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(_tokens()).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cells = (
        counts.select(
            "c", F.explode(cm_cell_structs(F.col("term"))).alias("cell")
        )
        .groupBy(F.col("cell.d").alias("d"), F.col("cell.idx").alias("idx"))
        .agg(F.sum("c").alias("counter"))
    )
    probes = counts.filter(F.col("term").isin(*EN_STOPWORDS))
    probe_cells = probes.select(
        "term",
        "c",
        F.explode(cm_cell_structs(F.col("term"))).alias("cell"),
    ).select("term", "c", F.col("cell.d").alias("d"), F.col("cell.idx").alias("idx"))
    return (
        probe_cells.join(F.broadcast(cells), ["d", "idx"])
        .groupBy("term")
        .agg(
            F.first("c").alias("true_count"),
            F.min("counter").alias("cm_estimate"),
        )
        .select(
            "term",
            "true_count",
            "cm_estimate",
            (F.col("cm_estimate") >= F.col("true_count")).alias("never_undercounts"),
        )
    )


def _count_min_sql() -> str:
    from streamprocessing_with_kafka_spark.functions.hashing import (
        family_hashes_sql,
        md5_long_sql,
    )
    from streamprocessing_with_kafka_spark.operators.text import _STOP_SQL

    h = md5_long_sql("term")
    hash_exprs = family_hashes_sql(h, CM_DEPTH)
    cell_rows = " UNION ALL ".join(
        f"SELECT term, c, {p} AS d, ({e}) % {CM_WIDTH} AS idx FROM counts"
        for p, e in enumerate(hash_exprs)
    )
    return f"""
WITH counts AS (
  SELECT term, COUNT(*) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
  GROUP BY term
),
cell_rows AS ({cell_rows}),
cells AS (
  SELECT d, idx, SUM(c) AS counter FROM cell_rows GROUP BY 1, 2
),
probe_cells AS (
  SELECT term, c, d, idx FROM cell_rows
  WHERE list_contains({_STOP_SQL}, term)
)
SELECT term, CAST(ANY_VALUE(c) AS BIGINT) AS true_count,
       CAST(MIN(counter) AS BIGINT) AS cm_estimate,
       MIN(counter) >= ANY_VALUE(c) AS never_undercounts
FROM probe_cells JOIN cells USING (d, idx)
GROUP BY term
"""


COUNT_MIN_SQL = _count_min_sql()


# ------------------------------------------------ Bloom membership

BLOOM_BITS = 8192
BLOOM_K = 5


def bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter (Bloom 1970) over the set of customer names, probed
    with a mixed present/absent key set: per probe, the bit-test
    verdict and the ground truth -- NO FALSE NEGATIVES is the
    structural guarantee (a present key always claims present; an
    absent key may rarely false-positive), the membership complement of
    count-min's overcount-only bound.

    Build: distinct keys -> BLOOM_K set-bit positions via the
    Carter-Wegman md5 family -> the filter IS the distinct (bit) set
    (<= BLOOM_BITS rows, mergeable by union -- the same additive-
    summary argument as the other sketches).  Probes equi-join their
    bit positions against the filter and claim membership iff ALL
    BLOOM_K bits hit.  The DuckDB oracle reproduces the filter
    BIT-FOR-BIT, so driver parity proves the construction."""
    from streamprocessing_with_kafka_spark.functions.hashing import (
        family_hashes_from_h,
        md5_long,
    )

    cust = load_table(spark, sf_dir, "customer")
    # NULL is not a set element: leave it out of the key universe, or
    # the deterministic probe pick (ORDER BY key LIMIT 10) slots it at
    # opposite ends under Spark-vs-standard NULL ordering (r9 sweep).
    keys = (
        cust.select(F.col("c_name").alias("key"))
        .filter(F.col("key").isNotNull())
        .distinct()
    )
    hashes = family_hashes_from_h(md5_long(F.col("key")), BLOOM_K)
    bits = (
        keys.select(
            F.explode(F.array(*[(h % BLOOM_BITS) for h in hashes])).alias("bit")
        )
        .distinct()
    )
    # probe set: 10 real names + 10 synthetic absent keys, deterministic
    present = keys.orderBy("key").limit(10)
    absent = spark.range(10).select(
        F.concat(F.lit("NotACustomer#"), F.col("id")).alias("key")
    )
    probes = present.unionByName(absent)
    probe_bits = probes.select(
        "key",
        F.explode(F.array(*[(h % BLOOM_BITS) for h in hashes])).alias("bit"),
    )
    verdict = (
        probe_bits.join(F.broadcast(bits.withColumn("hit", F.lit(1))), "bit", "left")
        .groupBy("key")
        .agg((F.count("hit") == BLOOM_K).alias("claims_member"))
    )
    truth = keys.withColumn("is_member", F.lit(True))
    return (
        verdict.join(truth, verdict.key == truth.key, "left")
        .select(
            verdict.key.alias("key"),
            "claims_member",
            F.coalesce("is_member", F.lit(False)).alias("is_member"),
            # the structural guarantee: member -> claims_member
            (F.coalesce("is_member", F.lit(False)) <= F.col("claims_member")).alias(
                "no_false_negative"
            ),
        )
    )


def _bloom_sql() -> str:
    from streamprocessing_with_kafka_spark.functions.hashing import (
        family_hashes_sql,
        md5_long_sql,
    )

    h = md5_long_sql("key")
    exprs = family_hashes_sql(h, BLOOM_K)
    key_bits = " UNION ALL ".join(
        f"SELECT key, ({e}) % {BLOOM_BITS} AS bit FROM keys" for e in exprs
    )
    probe_bits = " UNION ALL ".join(
        f"SELECT key, ({e}) % {BLOOM_BITS} AS bit FROM probes" for e in exprs
    )
    return f"""
WITH keys AS (SELECT DISTINCT c_name AS key FROM customer
              WHERE c_name IS NOT NULL),
bits AS (SELECT DISTINCT bit FROM ({key_bits})),
present AS (SELECT key FROM keys ORDER BY key LIMIT 10),
absent AS (SELECT 'NotACustomer#' || CAST(range AS VARCHAR) AS key FROM range(10)),
probes AS (SELECT key FROM present UNION ALL SELECT key FROM absent),
pb AS ({probe_bits}),
verdict AS (
  SELECT pb.key, COUNT(bits.bit) = {BLOOM_K} AS claims_member
  FROM pb LEFT JOIN bits ON pb.bit = bits.bit
  GROUP BY pb.key
)
SELECT v.key, v.claims_member,
       COALESCE(k.key IS NOT NULL, FALSE) AS is_member,
       COALESCE(k.key IS NOT NULL, FALSE) <= v.claims_member
         AS no_false_negative
FROM verdict v LEFT JOIN keys k ON v.key = k.key
"""


BLOOM_MEMBERSHIP_SQL = _bloom_sql()
