"""Deterministic sampling operators over the `documents` table -- the
dataset-curation surface of a training-data pipeline (north star in
BASELINE.json): stratified down-sampling and per-source weighted mixing.

Randomness is replaced by the cross-engine md5 hash (functions/hashing.py)
so every sample is reproducible, oracle-checkable, and -- critically at
100 TB -- re-runnable to the byte: a retried task or a re-executed stage
selects exactly the same rows, which Spark's recompute-on-failure model
requires (`rand()` inside a filter breaks exactly-once sinks on retry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from streamprocessing_with_kafka_spark.functions.hashing import md5_long, md5_long_sql
from streamprocessing_with_kafka_spark.functions.numeric import round_sql
from streamprocessing_with_kafka_spark.sources.tables import load_table

STRATUM_K = 5

# Per-source keep rates for the weighted mix -- the "data mixture" dial of
# a pretraining pipeline (e.g. up-weight curated sources, down-weight web
# crawl). A real deployment feeds this from config; it stays a broadcast
# dimension either way.
MIX_RATES = [(f"src{i}", round(1.0 - 0.08 * i, 2)) for i in range(10)]

_TWO60 = float(1 << 60)


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: the K smallest md5-ranked docs per
    (lang, source) stratum.

    One shuffle keyed on the stratum; rank is a window row_number, so each
    stratum is processed independently. Skew note: at 100 TB a hot stratum
    (e.g. lang='en', source='web') would bottleneck a single partition --
    the fix is a two-phase top-K (per-partition K via repartition on a
    salted key, then global K), which `topk_parts_by_revenue` demonstrates;
    here strata are balanced so the direct window is the right plan."""
    d = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("strat|"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang", "source").orderBy(key)
    return (
        d.select(
            "doc_id", "lang", "source", F.row_number().over(w).alias("sample_rank")
        )
        .filter(F.col("sample_rank") <= STRATUM_K)
    )


STRATIFIED_SAMPLE_SQL = f"""
SELECT doc_id, lang, source, CAST(rk AS INTEGER) AS sample_rank
FROM (
  SELECT doc_id, lang, source,
    row_number() OVER (PARTITION BY lang, source
                       ORDER BY md5('strat|' || CAST(doc_id AS VARCHAR))) AS rk
  FROM documents
)
WHERE rk <= {STRATUM_K}
"""


def weighted_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source weighted subsampling: keep a document iff its uniform
    hash-fraction falls under the source's keep rate.

    The rates table is a broadcast dim (no shuffle of the corpus); the
    filter is a narrow map over the scan. This is the scalable shape of
    'mix sources at ratios r_i' -- no global ordering, no count-based
    quotas, embarrassingly parallel, stable under retries."""
    d = load_table(spark, sf_dir, "documents")
    rates = spark.createDataFrame(MIX_RATES, "source string, keep_rate double")
    u = md5_long(F.concat(F.lit("mix|"), F.col("doc_id").cast("string"))) / F.lit(
        _TWO60
    )
    return (
        d.join(F.broadcast(rates), "source")
        .select("doc_id", "source", "keep_rate", u.alias("u_exact"))
        .filter(F.col("u_exact") < F.col("keep_rate"))
        .select("doc_id", "source", "keep_rate", F.round("u_exact", 6).alias("u"))
    )


_RATES_VALUES = ", ".join(f"('{s}', {r})" for s, r in MIX_RATES)
_U_HASH = md5_long_sql("'mix|' || CAST(doc_id AS VARCHAR)")
_U_SQL = f"{_U_HASH} / CAST({1 << 60} AS DOUBLE)"

WEIGHTED_MIX_SQL = f"""
WITH rates(source, keep_rate) AS (VALUES {_RATES_VALUES}),
u AS (
  SELECT doc_id, d.source, CAST(keep_rate AS DOUBLE) AS keep_rate,
         {_U_SQL} AS u_exact
  FROM documents d JOIN rates USING (source)
)
SELECT doc_id, source, keep_rate, round(u_exact, 6) AS u
FROM u WHERE u_exact < keep_rate
"""

# --------------------------------------------- corpus shuffle-sharding

#: training output shards; a real job sets this to target shard file size
N_SHARDS = 8


def shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global training shuffle without a global sort: each document gets a
    deterministic shard (md5 bucket) and a dense position within that
    shard (md5-ordered row_number). Reading shards round-robin yields a
    reproducible uniform permutation of the corpus -- what an LLM data
    loader needs -- while the only wide operation is ONE shuffle keyed on
    shard with per-shard local sorts; no single-reducer total order
    exists at any scale. Re-running on the same corpus reproduces the
    permutation byte-for-byte (retry- and backfill-safe)."""
    d = load_table(spark, sf_dir, "documents")
    h = md5_long(F.concat(F.lit("shuf|"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        d.select("doc_id", h.alias("h"), (h % N_SHARDS).alias("shard"))
        .select(
            "doc_id",
            F.col("shard").cast("int").alias("shard"),
            F.row_number().over(w).alias("pos"),
        )
    )


_SHUF_HASH = md5_long_sql("'shuf|' || CAST(doc_id AS VARCHAR)")

SHUFFLE_SHARD_SQL = f"""
SELECT doc_id, CAST(shard AS INTEGER) AS shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS INTEGER) AS pos
FROM (SELECT doc_id, {_SHUF_HASH} AS h, {_SHUF_HASH} % {N_SHARDS} AS shard
      FROM documents)
"""

# ------------------------------------------------- domain/source mixing


def domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-mixture dashboard: per source, its document count, token
    count, token share of the corpus, and the up/down-sampling weight
    that would rebalance it to a uniform target mix (the input
    `weighted_mix`-style keep rates are derived from in a DoReMi-shaped
    loop).

    Scale: one map-side-combinable groupBy over ONE corpus scan; the
    totals are an unpartitioned window over the already-aggregated
    |sources|-row frame (a crossJoin-scalar here would re-derive the
    aggregate subtree and scan the corpus twice), so the only wide ops
    are the source shuffle plus a |sources|-row single-partition hop."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
    )
    w = Window.partitionBy()
    totaled = per.select(
        "source",
        "n_docs",
        "n_tokens",
        F.sum("n_tokens").over(w).alias("tot_tokens"),
        F.count(F.lit(1)).over(w).alias("n_sources"),
    )
    share = F.col("n_tokens") / F.col("tot_tokens").cast("double")
    target = F.lit(1.0) / F.col("n_sources").cast("double")
    return totaled.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(share, 6).alias("token_share"),
        F.round(target / share, 6).alias("rebalance_weight"),
    )


DOMAIN_MIX_SQL = """
WITH per AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
),
totaled AS (
  SELECT source, n_docs, n_tokens,
         CAST(SUM(n_tokens) OVER () AS BIGINT) AS tot_tokens,
         COUNT(*) OVER () AS n_sources
  FROM per
)
SELECT source, n_docs, n_tokens,
       round(n_tokens / CAST(tot_tokens AS DOUBLE), 6) AS token_share,
       round((1.0 / CAST(n_sources AS DOUBLE))
             / (n_tokens / CAST(tot_tokens AS DOUBLE)), 6) AS rebalance_weight
FROM totaled
"""

# -------------------------------------------- temperature mixture sampling

#: mixture temperature: T=1 keeps the natural distribution, T->inf tends
#: to uniform. 2.0 is the classic multilingual-pretraining setting.
MIX_TEMPERATURE = 2.0


def temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened source mixture (the p_i^(1/T) re-weighting of
    multilingual/multi-domain pretraining): per-source keep rates are
    derived IN-PLAN from the corpus's own token shares -- rate_i ∝
    share_i^(1/T) / share_i, scaled so the most up-weighted source keeps
    everything -- then applied as the same deterministic hash-fraction
    filter as `weighted_mix`. Head sources are thinned, tail sources kept,
    expected post-sample shares ∝ share^(1/T).

    Scale: one map-side-combinable aggregate derives the rates
    (|sources| rows), broadcast back onto the corpus scan -- no second
    corpus pass, no driver round-trip, retry-stable (no rand()). Rates
    are rounded to 6dp BEFORE the keep comparison so the float pow() is
    pinned to a cross-engine-stable boundary."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).alias("n_tokens")
    )
    w_all = Window.partitionBy()
    share = F.col("n_tokens") / F.sum("n_tokens").over(w_all).cast("double")
    rel = F.pow(share, 1.0 / MIX_TEMPERATURE) / share
    rates = per.select(
        "source",
        F.round(rel / F.max(rel).over(w_all), 6).alias("keep_rate"),
    )
    u = md5_long(F.concat(F.lit("temp|"), F.col("doc_id").cast("string"))) / F.lit(
        _TWO60
    )
    return (
        d.join(F.broadcast(rates), "source")
        .select("doc_id", "source", "keep_rate", u.alias("u_exact"))
        .filter(F.col("u_exact") < F.col("keep_rate"))
        .select("doc_id", "source", "keep_rate", F.round("u_exact", 6).alias("u"))
    )


_TEMP_U = f"{md5_long_sql(chr(39) + 'temp|' + chr(39) + ' || CAST(doc_id AS VARCHAR)')} / CAST({1 << 60} AS DOUBLE)"

TEMPERATURE_SAMPLE_SQL = f"""
WITH per AS (
  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
),
rel AS (
  SELECT source,
         pow(n_tokens / CAST(SUM(n_tokens) OVER () AS DOUBLE), 1.0 / {MIX_TEMPERATURE})
           / (n_tokens / CAST(SUM(n_tokens) OVER () AS DOUBLE)) AS r
  FROM per
),
rates AS (SELECT source, round(r / MAX(r) OVER (), 6) AS keep_rate FROM rel),
u AS (
  SELECT d.doc_id, d.source, rates.keep_rate, {_TEMP_U} AS u_exact
  FROM documents d JOIN rates USING (source)
)
SELECT doc_id, source, keep_rate, round(u_exact, 6) AS u
FROM u WHERE u_exact < keep_rate
"""


# ----------------------------------------------------- DSIR resampling

#: hashed-feature buckets (DSIR hashes n-grams into a fixed bucket count
#: so the LM tables are O(buckets), independent of vocabulary size)
DSIR_BUCKETS = 4096
#: the "target distribution" slice standing in for a curated corpus
#: (Wikipedia/books in the paper); here: one source of the synthetic mix
DSIR_TARGET_SOURCE = "src0"
#: expected fraction of the raw corpus to keep
DSIR_SAMPLE_FRAC = 0.25


def dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023): score
    every raw document by the log-likelihood ratio of its hashed unigram
    features under a target-distribution LM vs a raw-distribution LM,
    then keep docs with probability proportional to exp(score) -- the
    published recipe for tilting a web-scale corpus toward a curated
    target domain without training a classifier.

    Scale design: the two "language models" are ONE conditional
    aggregate over the token stream producing DSIR_BUCKETS rows
    (bucket-count-sized, vocabulary-independent -- that is the point of
    the hashing trick), broadcast back onto the same token stream; the
    corpus shuffles once more for the per-doc score aggregate, on the
    doc_id it is already partitioned by downstream. The normalizer and
    doc count ride a 1-row broadcast (no driver scalar). The only
    corpus-sized exchanges are the two token aggregates (bucket LM and
    per-doc score), both map-side combinable; every other exchange in
    the compiled plan moves bucket-count or single rows, and nothing
    ever joins the corpus against itself.

    Determinism: per-bucket log-ratios and per-doc exp(score) are
    quantized to exact decimals before any sum (the unigram_logprob
    pattern), the keep probability is rounded to 9dp before the
    comparison (the temperature_sample pattern), and the uniform is the
    md5 hash fraction -- retry-stable, oracle-reproducible."""
    return dsir_sample_frame(load_table(spark, sf_dir, "documents"))


def dsir_tokens(d: DataFrame) -> DataFrame:
    """(doc_id, is_t, b): the hashed-bucket token stream -- the shared
    first stage under the batch sampler and the streaming gate's model
    builder."""
    return d.select(
        "doc_id",
        (F.col("source") == DSIR_TARGET_SOURCE).alias("is_t"),
        F.explode(F.split("text", " ")).alias("term"),
    ).select(
        "doc_id", "is_t", F.pmod(md5_long(F.col("term")), F.lit(DSIR_BUCKETS)).alias("b")
    )


def dsir_bucket_lm(toks: DataFrame) -> DataFrame:
    """(b, lr): per-bucket target-vs-raw log-likelihood ratio, decimal-
    quantized -- THE model. Shared verbatim by dsir_sample_frame and
    streaming/dsir_gate.dsir_model so the two can never drift."""
    lm = toks.groupBy("b").agg(
        F.count_if("is_t").alias("ct"),
        F.count_if(~F.col("is_t")).alias("cr"),
    )
    tot = lm.agg(F.sum("ct").alias("nt"), F.sum("cr").alias("nr"))
    lr = (
        F.log((F.col("ct") + 1) / (F.col("nt") + DSIR_BUCKETS).cast("double"))
        - F.log((F.col("cr") + 1) / (F.col("nr") + DSIR_BUCKETS).cast("double"))
    ).cast("decimal(28,10)")
    return lm.crossJoin(F.broadcast(tot)).select(
        "b",
        lr.alias("lr"),
        F.col("nt").alias("nt"),
        F.col("nr").alias("nr"),
    )


def dsir_sample_frame(d: DataFrame) -> DataFrame:
    """Frame-level core of dsir_sample over any (doc_id, source, text)
    frame."""
    toks = dsir_tokens(d)
    scored = (
        toks.filter(~F.col("is_t"))
        .join(F.broadcast(dsir_bucket_lm(toks).select("b", "lr")), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.sum("lr").cast("double") / F.count(F.lit(1)).cast("double")).alias("_w"),
        )
        .withColumn("_imp", F.exp(F.col("_w")).cast("decimal(28,6)"))
    )
    norm = scored.agg(
        F.sum("_imp").cast("double").alias("s"),
        F.count(F.lit(1)).alias("n_raw"),
    )
    keep_p = F.round(
        F.least(
            F.lit(1.0),
            F.floor(F.lit(DSIR_SAMPLE_FRAC) * F.col("n_raw")).cast("double")
            * F.col("_imp").cast("double")
            / F.col("s"),
        ),
        9,
    )
    u = md5_long(F.concat(F.lit("dsir|"), F.col("doc_id").cast("string"))) / F.lit(
        _TWO60
    )
    return (
        scored.crossJoin(F.broadcast(norm))
        .select(
            "doc_id",
            "n_tokens",
            F.round("_w", 6).alias("avg_logratio"),
            keep_p.alias("keep_prob"),
            (u < keep_p).alias("is_kept"),
        )
    )


_DSIR_U = f"{md5_long_sql(chr(39) + 'dsir|' + chr(39) + ' || CAST(doc_id AS VARCHAR)')} / CAST({1 << 60} AS DOUBLE)"

DSIR_SAMPLE_SQL = f"""
WITH toks AS (
  SELECT doc_id, source = '{DSIR_TARGET_SOURCE}' AS is_t,
         {md5_long_sql('t.term')} % {DSIR_BUCKETS} AS b
  FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS term
        FROM documents) t
),
lm AS (
  SELECT b,
         COUNT(CASE WHEN is_t THEN 1 END) AS ct,
         COUNT(CASE WHEN NOT is_t THEN 1 END) AS cr
  FROM toks GROUP BY b
),
tot AS (SELECT SUM(ct) AS nt, SUM(cr) AS nr FROM lm),
lr AS (
  SELECT b,
         CAST(ln((ct + 1) / CAST(nt + {DSIR_BUCKETS} AS DOUBLE))
              - ln((cr + 1) / CAST(nr + {DSIR_BUCKETS} AS DOUBLE))
           AS DECIMAL(28,10)) AS lr
  FROM lm, tot
),
scored AS (
  SELECT doc_id, COUNT(*) AS n_tokens,
         CAST(CAST(SUM(lr) AS VARCHAR) AS DOUBLE) / COUNT(*) AS _w
  FROM toks JOIN lr USING (b)
  WHERE NOT is_t
  GROUP BY doc_id
),
imp AS (SELECT *, CAST(exp(_w) AS DECIMAL(28,6)) AS _imp FROM scored),
norm AS (
  SELECT CAST(CAST(SUM(_imp) AS VARCHAR) AS DOUBLE) AS s, COUNT(*) AS n_raw
  FROM imp
),
kp AS (
  SELECT doc_id, n_tokens, _w,
         {round_sql(f'LEAST(1.0, floor({DSIR_SAMPLE_FRAC} * n_raw) * CAST(CAST(_imp AS VARCHAR) AS DOUBLE) / s)', 9)} AS keep_prob
  FROM imp, norm
)
SELECT doc_id, n_tokens, {round_sql('_w', 6)} AS avg_logratio, keep_prob,
       {_DSIR_U} < keep_prob AS is_kept
FROM kp
"""


# ------------------------------------------- token-budget water-filling

#: token budget for the allocation plan, as a fraction of the corpus --
#: high enough that the uniform per-source target over-asks the thin
#: sources (so the cap + redistribution branch actually exercises at the
#: test scales: 2/20 sources cap at sf0.01), which is the interesting
#: regime at 100 TB too.
WATERFILL_BUDGET_FRAC = 0.9


def budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capacity-constrained mixture planning: given a token budget B and
    per-source target weights (uniform here; a config dimension in
    production), allocate alloc_i = min(avail_i, lambda * w_i) with the
    water level lambda chosen so the allocations exactly exhaust B --
    the classic water-filling solution, computed in CLOSED FORM rather
    than the iterative redistribute loop:

      sort sources by avail_i/w_i ascending; a source is capped (gets all
      its tokens) iff its ratio is below the water level implied by
      capping everything before it -- a per-row window test on prefix
      sums; the final lambda then spreads the leftover budget over the
      uncapped weights.

    Scale: ONE corpus scan feeds a map-side-combinable per-source token
    count; everything after operates on the |sources|-row frame (two
    window passes + one unpartitioned window), so the planner costs the
    same at 100 TB as at 100 MB. The iterative cap-and-redistribute
    formulation would be K driver round-trips; this is zero."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).alias("avail")
    )
    w_all = Window.partitionBy()
    n_src = F.count(F.lit(1)).over(w_all)
    per = per.select(
        "source",
        "avail",
        (F.lit(1.0) / n_src.cast("double")).alias("w"),
        (F.sum("avail").over(w_all).cast("double") * WATERFILL_BUDGET_FRAC).alias("budget"),
    )
    # prefix sums EXCLUDING the current row, in water-level order
    w_sort = Window.partitionBy().orderBy(F.col("avail") / F.col("w"), F.col("source")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    staged = per.select(
        "*",
        F.coalesce(F.sum("avail").over(w_sort), F.lit(0)).cast("double").alias("cum_avail"),
        F.coalesce(F.sum("w").over(w_sort), F.lit(0.0)).alias("cum_w"),
        F.sum("w").over(w_all).alias("tot_w"),
    )
    # capped iff avail/w <= implied water level with all earlier rows capped
    capped = (F.col("avail") / F.col("w")) <= (
        (F.col("budget") - F.col("cum_avail")) / (F.col("tot_w") - F.col("cum_w"))
    )
    flagged = staged.select("*", capped.alias("capped"))
    lam = (
        F.col("budget")
        - F.coalesce(
            F.sum(F.when(F.col("capped"), F.col("avail"))).over(w_all), F.lit(0)
        ).cast("double")
    ) / F.sum(F.when(~F.col("capped"), F.col("w"))).over(w_all)
    alloc = F.when(F.col("capped"), F.col("avail").cast("double")).otherwise(
        lam * F.col("w")
    )
    return flagged.select(
        "source",
        "avail",
        F.round("w", 6).alias("weight"),
        "capped",
        F.round(alloc, 2).alias("alloc_tokens"),
        F.round(alloc / F.col("avail"), 6).alias("fill_ratio"),
    )


BUDGET_WATERFILL_SQL = f"""
WITH per AS (
  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS avail
  FROM documents GROUP BY 1
),
dims AS (
  SELECT source, avail,
         1.0 / COUNT(*) OVER () AS w,
         CAST(SUM(avail) OVER () AS DOUBLE) * {WATERFILL_BUDGET_FRAC} AS budget
  FROM per
),
staged AS (
  SELECT *,
         CAST(coalesce(SUM(avail) OVER wl, 0) AS DOUBLE) AS cum_avail,
         coalesce(SUM(w) OVER wl, 0.0) AS cum_w,
         SUM(w) OVER () AS tot_w
  FROM dims
  WINDOW wl AS (ORDER BY avail / w, source
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
flagged AS (
  SELECT *,
         (avail / w) <= ((budget - cum_avail) / (tot_w - cum_w)) AS capped
  FROM staged
),
lam AS (
  SELECT *,
         (budget - CAST(coalesce(SUM(CASE WHEN capped THEN avail END) OVER (), 0)
                        AS DOUBLE))
           / SUM(CASE WHEN NOT capped THEN w END) OVER () AS lambda
  FROM flagged
)
SELECT source, avail,
       {round_sql('w', 6)} AS weight, capped,
       {round_sql('CASE WHEN capped THEN CAST(avail AS DOUBLE) ELSE lambda * w END', 2)} AS alloc_tokens,
       {round_sql('(CASE WHEN capped THEN CAST(avail AS DOUBLE) ELSE lambda * w END) / avail', 6)} AS fill_ratio
FROM lam
"""
