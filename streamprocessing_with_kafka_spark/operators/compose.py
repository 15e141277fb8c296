"""End-to-end corpus curation composition -- the 'v2 flagship' that chains
the round-3 operators into the shape a real pretraining data job runs as
ONE Spark query: learned quality gate -> cross-document duplicated-span
gate -> benchmark-decontamination gate -> reproducible shuffle-shard of
the survivors.

Relation to `text.curation_pipeline` (the v1 flagship): v1 gates on
surface heuristics and dedups exact fingerprints inside one scan; v2
layers the CROSS-DOCUMENT signals (span df table, eval-set collisions)
and a learned filter on top, then materializes the training-ready
permutation. Both are registered; a user picks by pipeline stage.

Scale shape: the three gates are independent branches over the same
documents scan -- the classifier is a narrow projection (no shuffle), the
span gate and decontamination each shuffle on their own hash keys -- and
the final assembly is doc_id-keyed equi-joins of per-doc frames followed
by the one-exchange shard window. Nothing here is quadratic; the widest
structure is the span df table, same as `dedup_dup_spans`.

Semantics note: the decontamination stage scores only non-eval documents
with >= NGRAM_N tokens, so the inner join doubles as two more gates --
eval-set members and sub-n-gram snippets are excluded from the training
corpus, which is exactly what a curation run wants (and the oracle SQL
reproduces, so the contract is pinned, not accidental).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from streamprocessing_with_kafka_spark.functions.hashing import md5_long, md5_long_sql
from streamprocessing_with_kafka_spark.operators.decontaminate import (
    DECONTAMINATE_SQL,
    decontaminate,
)
from streamprocessing_with_kafka_spark.operators.dedup import (
    DUP_SPAN_STATS_SQL,
    dup_span_stats,
)
from streamprocessing_with_kafka_spark.operators.sampling import N_SHARDS
from streamprocessing_with_kafka_spark.operators.text import (
    QUALITY_CLASSIFIER_SQL,
    quality_classifier,
)


def curate_shard_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, quality_prob, dup_frac, contamination_frac, shard, pos):
    the documents that pass all three gates, with their training-shard
    assignment and reproducible within-shard position."""
    qc = quality_classifier(spark, sf_dir).filter(F.col("keep")).select(
        "doc_id", "quality_prob"
    )
    ds = dup_span_stats(spark, sf_dir).filter(F.col("keep")).select(
        "doc_id", "dup_frac"
    )
    dc = decontaminate(spark, sf_dir).filter(~F.col("is_contaminated")).select(
        "doc_id", "contamination_frac"
    )
    kept = qc.join(ds, "doc_id").join(dc, "doc_id")
    h = md5_long(F.concat(F.lit("shuf|"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        kept.select("*", h.alias("h"), (h % N_SHARDS).cast("int").alias("shard"))
        .select(
            "doc_id",
            "quality_prob",
            "dup_frac",
            "contamination_frac",
            "shard",
            F.row_number().over(w).alias("pos"),
        )
    )


_SHUF = md5_long_sql("'shuf|' || CAST(doc_id AS VARCHAR)")

CURATE_SHARD_SQL = f"""
WITH qc AS ({QUALITY_CLASSIFIER_SQL}),
ds AS ({DUP_SPAN_STATS_SQL}),
dc AS ({DECONTAMINATE_SQL}),
kept AS (
  SELECT qc.doc_id, qc.quality_prob, ds.dup_frac, dc.contamination_frac
  FROM qc JOIN ds ON qc.doc_id = ds.doc_id
          JOIN dc ON qc.doc_id = dc.doc_id
  WHERE qc.keep AND ds.keep AND NOT dc.is_contaminated
),
sharded AS (
  SELECT *, CAST({_SHUF} % {N_SHARDS} AS INTEGER) AS shard, {_SHUF} AS h
  FROM kept
)
SELECT doc_id, quality_prob, dup_frac, contamination_frac, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS INTEGER) AS pos
FROM sharded
"""
