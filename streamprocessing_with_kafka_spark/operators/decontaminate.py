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
    for the per-doc count, on doc_id it is already partitioned by."""
    grams = word_ngram_rows(docs, NGRAM_N).select(
        "doc_id", md5_long(F.col("gram")).alias("gh")
    )
    bench = (
        grams.filter(F.col("doc_id") % EVAL_MOD == 0)
        .select("gh")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train = grams.filter(F.col("doc_id") % EVAL_MOD != 0)
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
    """Registry entry point: decontaminate_docs over the documents table."""
    from streamprocessing_with_kafka_spark.sources.tables import load_table

    return decontaminate_docs(load_table(spark, sf_dir, "documents"))


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

    docs = load_table(spark, sf_dir, "documents")
    grams = word_ngram_rows(docs, NGRAM_N).select(
        "doc_id", md5_long(F.col("gram")).alias("gh")
    )
    ev = grams.filter(F.col("doc_id") % EVAL_MOD == 0).select(
        F.col("doc_id").alias("eval_doc_id"), "gh"
    )
    evn = ev.groupBy("eval_doc_id").agg(F.count(F.lit(1)).alias("eval_ngrams"))
    train = grams.filter(F.col("doc_id") % EVAL_MOD != 0)
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
