"""Benchmark decontamination: flag training documents whose token
n-grams overlap an evaluation set -- the train/test-contamination check
every LLM data pipeline runs before training (the GPT-3/PaLM appendix
recipe: exact n-gram collision against the benchmark corpus).

The eval set here is a deterministic slice of `documents` (doc_id % 7),
standing in for a real benchmark corpus; the contract is the interesting
part: eval docs reduce to a DISTINCT set of hashed n-grams that is tiny
relative to the corpus (benchmarks are thousands of docs, the corpus is
billions), so it BROADCASTS -- the training corpus is scored in one
narrow pass + one hash aggregate, and never shuffles against the eval
side. All n-grams are md5-derived 60-bit ints (functions/hashing.py), so
the DuckDB oracle reproduces the exact hit sets, and joins move 8-byte
keys instead of ~30-byte strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from streamprocessing_with_kafka_spark.functions.hashing import md5_long, md5_long_sql
from streamprocessing_with_kafka_spark.functions.numeric import round_sql
from streamprocessing_with_kafka_spark.operators.dedup import (
    word_ngram_rows,
    word_ngrams_sql,
)

NGRAM_N = 5  # 3-grams hit ~every doc incidentally; 5-grams are specific
EVAL_MOD = 7  # doc_id % EVAL_MOD == 0 -> evaluation set
CONTAM_FRAC = 0.5  # flag when >= half of a doc's n-grams appear in eval


def decontaminate_docs(docs: DataFrame) -> DataFrame:
    """Per-training-doc contamination score against the eval slice, over
    any frame with (doc_id, text).

    Plan: eval n-grams -> distinct -> broadcast; training n-grams LEFT
    JOIN the broadcast set (narrow, no shuffle), then ONE hash aggregate
    per doc_id counts total vs hit n-grams. The eval side is at most one
    distinct-aggregate of a sliver; the corpus-sized side shuffles only
    for the per-doc count, on doc_id it is already partitioned by.

    The eval/train split happens BEFORE the gram fan-out (the optimizer
    would push the doc_id filters below it anyway, duplicating the
    subtree per branch -- r12 plan audit), and only the TRAIN branch
    pays the doc_id fan-out exchange: the final per-doc aggregate rides
    that partitioning shuffle-free. The eval branch's next operation is
    a distinct on gh, a different key, so pre-partitioning it by doc_id
    bought nothing; its partial-distinct now runs on the scan partitions
    and its exchange carries partially-deduped 8-byte gram hashes
    instead of token arrays (r12: 5 exchanges -> 2 in the compiled
    plan)."""
    is_eval = F.col("doc_id") % EVAL_MOD == 0

    def grams_of(d: DataFrame, repartition: bool) -> DataFrame:
        return word_ngram_rows(d, NGRAM_N, repartition=repartition).select(
            "doc_id", md5_long(F.col("gram")).alias("gh")
        )

    bench = (
        grams_of(docs.filter(is_eval), repartition=False)
        .select("gh")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train = grams_of(docs.filter(~is_eval), repartition=True)
    frac = F.col("n_hits") / F.col("n_ngrams").cast("double")
    return (
        train.join(F.broadcast(bench), "gh", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.count("hit").alias("n_hits"),
        )
        .select(
            "doc_id",
            "n_ngrams",
            "n_hits",
            F.round(frac, 6).alias("contamination_frac"),
            (frac >= CONTAM_FRAC).alias("is_contaminated"),
        )
    )


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry point: decontaminate_docs over the documents table.

    rebalance=False: the train branch repartitions by doc_id inside the
    gram fan-out and the eval branch aggregates on gh -- the loader's
    round-robin exchange was a third, redundant shuffle of the corpus."""
    from streamprocessing_with_kafka_spark.sources.tables import load_table

    return decontaminate_docs(
        load_table(spark, sf_dir, "documents", rebalance=False)
    )


DECONTAMINATE_SQL = f"""
WITH grams AS (
  SELECT doc_id, {md5_long_sql('gram')} AS gh
  FROM ({word_ngrams_sql(NGRAM_N)})
),
bench AS (SELECT DISTINCT gh FROM grams WHERE doc_id % {EVAL_MOD} = 0),
scored AS (
  SELECT t.doc_id, count(*) AS n_ngrams, count(b.gh) AS n_hits
  FROM grams t LEFT JOIN bench b ON t.gh = b.gh
  WHERE t.doc_id % {EVAL_MOD} <> 0 GROUP BY t.doc_id
)
SELECT doc_id, n_ngrams, n_hits,
  {round_sql('n_hits / CAST(n_ngrams AS DOUBLE)', 6)} AS contamination_frac,
  (n_hits / CAST(n_ngrams AS DOUBLE)) >= {CONTAM_FRAC} AS is_contaminated
FROM scored
"""

CONTAIN_FRAC = 0.3  # attribute when >= 30% of the eval doc's n-grams leak


def decontaminate_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination ATTRIBUTION: which eval document leaked into which
    training document, scored by containment -- shared distinct n-grams
    over the EVAL doc's n-gram count (the denominator that measures how
    much of the benchmark item is reproduced, regardless of how much
    unrelated text surrounds it; the flag decontaminate() computes cannot
    answer 'which benchmark item, and how completely').

    Plan shape: eval-side n-grams stay doc-tagged and BROADCAST (the eval
    corpus is a sliver by definition, same argument as decontaminate);
    the training corpus joins the broadcast on the 60-bit gram hash --
    narrow, no corpus shuffle -- then ONE aggregate per (train, eval)
    pair counts shared grams; per-eval-doc totals ride a second tiny
    broadcast for the containment denominator."""
    from streamprocessing_with_kafka_spark.sources.tables import load_table

    # Same branch discipline as decontaminate_docs (r12): split before the
    # gram fan-out, fan-out exchange on the train branch only, loader
    # rebalance off. The eval branch feeds two broadcasts (doc-tagged
    # grams + per-doc totals); partitioning it by doc_id bought nothing.
    docs = load_table(spark, sf_dir, "documents", rebalance=False)
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    ev = word_ngram_rows(docs.filter(is_eval), NGRAM_N, repartition=False).select(
        F.col("doc_id").alias("eval_doc_id"),
        md5_long(F.col("gram")).alias("gh"),
    )
    evn = ev.groupBy("eval_doc_id").agg(F.count(F.lit(1)).alias("eval_ngrams"))
    train = word_ngram_rows(docs.filter(~is_eval), NGRAM_N).select(
        "doc_id", md5_long(F.col("gram")).alias("gh")
    )
    contain = F.col("shared_ngrams") / F.col("eval_ngrams").cast("double")
    return (
        train.join(F.broadcast(ev), "gh")
        .groupBy("doc_id", "eval_doc_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
        .join(F.broadcast(evn), "eval_doc_id")
        .select(
            "doc_id",
            "eval_doc_id",
            "shared_ngrams",
            "eval_ngrams",
            F.round(contain, 6).alias("containment"),
        )
        .filter(F.col("containment") >= CONTAIN_FRAC)
    )


FUZZY_THRESHOLD = 0.5  # Jaccard vs an eval doc that flags fuzzy leakage


def decontaminate_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY decontamination: training docs that are near-duplicates of
    an eval doc, caught by the MinHash band family -- the
    paraphrase/partial-edit leakage the exact 5-gram gate structurally
    misses (one edited word kills all 5 grams that cross it, but barely
    moves Jaccard over the shingle set).

    Same band family as dedup_minhash_lsh (PERMS/BANDS in dedup.py), so
    one signature pass over the corpus serves dedup AND decontamination.

    Scale design (the dedup_incremental argument, with the eval set in
    the history role): the eval side is a benchmark corpus -- thousands
    of docs vs billions -- so its band keys AND its shingle sets
    broadcast; the training corpus never shuffles against the eval side.
    Candidates = broadcast equi-join on (band, band_key); only candidates
    pay the exact-Jaccard verify, again against broadcast eval shingles.
    The training side's only shuffles are the signature groupBy and the
    per-pair verify aggregate (candidate-sized, not corpus-sized).

    The oracle mirrors the banded candidate generation exactly, so a
    pair missed by every band is missed identically in both engines."""
    from streamprocessing_with_kafka_spark.operators.dedup import (
        _shingles_with_count,
    )

    return decontaminate_fuzzy_from_shingles(_shingles_with_count(spark, sf_dir))


def decontaminate_fuzzy_from_shingles(
    sh: DataFrame, bands: DataFrame | None = None
) -> DataFrame:
    """Frame-level core of decontaminate_fuzzy over any (doc_id, _h, n)
    shingle frame (the _shingles_with_count contract).  `bands` lets a
    composition pass the shared band-key frame (see minhash_lsh_pairs);
    default = computed here, bit-identical."""
    from streamprocessing_with_kafka_spark.operators.dedup import (
        _band_keys,
        _signature_agg,
    )

    if bands is None:
        bands = _band_keys(_signature_agg(sh))
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    tb, eb = bands.filter(~is_eval).alias("t"), bands.filter(is_eval).alias("e")
    cand = (
        tb.join(
            F.broadcast(eb),
            (F.col("t.band") == F.col("e.band"))
            & (F.col("t.band_key") == F.col("e.band_key")),
        )
        .select(
            F.col("t.doc_id").alias("train_doc"),
            F.col("e.doc_id").alias("eval_doc"),
        )
        .distinct()
    )
    from streamprocessing_with_kafka_spark.operators.dedup import (
        verify_jaccard_pairs,
    )

    return verify_jaccard_pairs(
        cand,
        sh.filter(~is_eval),
        sh.filter(is_eval),
        "train_doc",
        "eval_doc",
        FUZZY_THRESHOLD,
        broadcast_right=True,
    ).select(
        F.col("train_doc").alias("doc_id"),
        F.col("eval_doc").alias("eval_doc_id"),
        "jaccard",
    )


def _decontaminate_fuzzy_sql() -> str:
    from streamprocessing_with_kafka_spark.operators.dedup import (
        _BANDS_SQL,
        _MH_COLS_SQL,
        _SHINGLES_SQL,
    )

    return f"""
WITH sh0 AS ({_SHINGLES_SQL}),
sh AS (SELECT doc_id, {md5_long_sql('shingle')} AS _h FROM sh0),
mh AS (
  SELECT doc_id,
         {_MH_COLS_SQL}
  FROM sh
  GROUP BY doc_id
),
bands AS (
{_BANDS_SQL}
),
counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
cand AS (
  SELECT DISTINCT t.doc_id AS doc_id, e.doc_id AS eval_doc_id
  FROM bands t JOIN bands e
    ON t.band = e.band AND t.band_key = e.band_key
  WHERE t.doc_id % {EVAL_MOD} != 0 AND e.doc_id % {EVAL_MOD} = 0
)
SELECT i.doc_id, i.eval_doc_id,
       round(inter / CAST(ca.n + cb.n - inter AS DOUBLE), 6) AS jaccard
FROM (
  SELECT cand.doc_id, cand.eval_doc_id, COUNT(*) AS inter
  FROM cand
  JOIN sh sa ON sa.doc_id = cand.doc_id
  JOIN sh sb ON sb.doc_id = cand.eval_doc_id AND sb._h = sa._h
  GROUP BY 1, 2
) i
JOIN counts ca ON i.doc_id = ca.doc_id
JOIN counts cb ON i.eval_doc_id = cb.doc_id
WHERE round(inter / CAST(ca.n + cb.n - inter AS DOUBLE), 6)
      >= {FUZZY_THRESHOLD}
"""


DECONTAMINATE_FUZZY_SQL = _decontaminate_fuzzy_sql()

DECONTAMINATE_ATTRIBUTION_SQL = f"""
WITH grams AS (
  SELECT doc_id, {md5_long_sql('gram')} AS gh
  FROM ({word_ngrams_sql(NGRAM_N)})
),
ev AS (SELECT doc_id AS eval_doc_id, gh FROM grams WHERE doc_id % {EVAL_MOD} = 0),
evn AS (SELECT eval_doc_id, COUNT(*) AS eval_ngrams FROM ev GROUP BY 1),
pairs AS (
  SELECT t.doc_id, ev.eval_doc_id, COUNT(*) AS shared_ngrams
  FROM grams t JOIN ev USING (gh)
  WHERE t.doc_id % {EVAL_MOD} <> 0
  GROUP BY 1, 2
)
SELECT doc_id, eval_doc_id, shared_ngrams, eval_ngrams,
  {round_sql('shared_ngrams / CAST(eval_ngrams AS DOUBLE)', 6)} AS containment
FROM pairs JOIN evn USING (eval_doc_id)
WHERE shared_ngrams / CAST(eval_ngrams AS DOUBLE) >= {CONTAIN_FRAC}
"""
