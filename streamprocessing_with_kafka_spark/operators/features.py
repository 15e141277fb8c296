"""Hashed TF-IDF feature vectors over `documents` -- the classic scalable
text -> dense-vector step (feature hashing / the "hashing trick") that
bridges the text-analysis family to the similarity-search operators: the
output is the same typed `array<float>` shape `embeddings.embedding`
carries, so hashed vectors plug straight into the ANN / near-dup paths.

Scale design:
  - No vocabulary table to build, broadcast, or keep consistent across a
    1000-executor cluster: a term's slot is md5(term) % HASH_DIM and its
    sign a second md5 bit, so the featurizer is stateless -- the property
    that makes feature hashing THE production choice at 100 TB (Weinberger
    et al. 2009; Vowpal Wabbit).
  - ONE partitioning carries the whole doc-side pipeline: tokens are
    hash-partitioned by doc_id up front, and every later aggregate
    (term counts, slot sums, vector assembly) groups by a superset of
    doc_id, so Catalyst reuses that single exchange for all three -- no
    (doc_id, term) or (doc_id, slot) reshuffles (pinned in
    tests/test_plan_shapes.py). The document-frequency table is
    vocab-sized, aggregated once and broadcast back; the corpus size is a
    broadcast 1-row aggregate (no driver collect).
  - Weight sums are quantized to DECIMAL(28,10) before aggregation so the
    result is independent of partition/merge order (same pattern as
    dec_sum), which is what makes a float pipeline oracle-checkable.
  - The dense assembly (map_from_entries + a sequence() fill) is a narrow
    projection -- no explode of the slot space, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from streamprocessing_with_kafka_spark.functions.hashing import md5_long, md5_long_sql
from streamprocessing_with_kafka_spark.functions.numeric import round_sql as _round_sql
from streamprocessing_with_kafka_spark.operators.text import _tokens
from streamprocessing_with_kafka_spark.sources.tables import load_table

HASH_DIM = 32  # slots; production sizes 2^18-2^22 -- plan shape unchanged


def hashed_tfidf_frame(d: DataFrame) -> DataFrame:
    """(doc_id, feature array<float>) over any (doc_id, text) frame:
    signed-hash TF-IDF vectors.

    weight(term) = tf * (ln((N+1)/(df+1)) + 1), folded into slot
    md5(term) % HASH_DIM with sign 1 - 2*(md5(term||'|s') & 1); collisions
    partially cancel instead of compounding -- the unbiased-estimate trick
    from the feature-hashing literature."""
    toks = d.select("doc_id", F.explode(_tokens()).alias("term")).repartition(
        d.sparkSession.sparkContext.defaultParallelism, "doc_id"
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfc = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    ndocs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    idf = F.log((F.col("n_docs") + 1) / (F.col("df") + 1).cast("double")) + 1
    sign = 1 - 2 * (md5_long(F.concat(F.col("term"), F.lit("|s"))) % 2)
    slot = md5_long(F.col("term")) % HASH_DIM
    weighted = (
        tf.join(F.broadcast(dfc), "term")
        .crossJoin(F.broadcast(ndocs))
        .select(
            "doc_id",
            slot.alias("slot"),
            (sign * F.col("tf") * idf).cast("decimal(28,10)").alias("wq"),
        )
    )
    slots = weighted.groupBy("doc_id", "slot").agg(F.sum("wq").alias("w"))
    m = F.map_from_entries(F.collect_list(F.struct("slot", "w")))
    return (
        slots.groupBy("doc_id")
        .agg(m.alias("m"))
        .select(
            "doc_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(HASH_DIM - 1)),
                lambda s: F.round(
                    F.coalesce(F.col("m")[s.cast("long")], F.lit(0).cast("decimal(28,10)"))
                    .cast("double"),
                    6,
                ).cast("float"),
            ).alias("feature"),
        )
    )


def hashed_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hashed_tfidf_frame over the documents table."""
    return hashed_tfidf_frame(load_table(spark, sf_dir, "documents"))


_W_SQL = (
    "CAST((1 - 2 * ({sign_h} % 2)) * tf "
    "* (ln((n_docs + 1) / CAST(df + 1 AS DOUBLE)) + 1) AS DECIMAL(28,10))"
).format(sign_h=md5_long_sql("term || '|s'"))

HASHED_TFIDF_SQL = f"""
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dfc AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
nd AS (SELECT COUNT(*) AS n_docs FROM documents),
slots AS (
  SELECT doc_id, {md5_long_sql('term')} % {HASH_DIM} AS slot, SUM({_W_SQL}) AS w
  FROM tf JOIN dfc USING (term), nd
  GROUP BY 1, 2
),
dense AS (
  SELECT d.doc_id, spine.s, slots.w
  FROM (SELECT DISTINCT doc_id FROM slots) d
  CROSS JOIN (SELECT unnest(range(0, {HASH_DIM})) AS s) spine
  LEFT JOIN slots ON slots.doc_id = d.doc_id AND slots.slot = spine.s
)
SELECT doc_id,
       list(CAST({_round_sql("CAST(CAST(COALESCE(w, 0) AS VARCHAR) AS DOUBLE)", 6)} AS FLOAT)
            ORDER BY s) AS feature
FROM dense GROUP BY doc_id
"""


# ---------------------------------------- text similarity search (composed)

TXT_TOP_K = 5
TXT_N_QUERIES = 3  # doc_id < 3 are the probe documents


def text_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search over raw text with NO embedding model: hashed
    TF-IDF vectors -> exact cosine top-k for the probe documents. The
    composition proof that the stateless featurizer's array<float> output
    plugs straight into the similarity operators (same plan shape as
    ann_topk_bruteforce: broadcast probes, WindowGroupLimit partial
    top-k); at corpus scale swap the scoring stage for the LSH/IVF
    candidate paths -- the vector contract is identical."""
    from pyspark.sql import Window as W

    from streamprocessing_with_kafka_spark.operators.similarity import cosine

    vecs = hashed_tfidf(spark, sf_dir)
    q = vecs.filter(F.col("doc_id") < TXT_N_QUERIES).select(
        F.col("doc_id").alias("q_id"), F.col("feature").alias("qv")
    )
    n = vecs.select(F.col("doc_id").alias("n_id"), F.col("feature").alias("nv"))
    scored = (
        F.broadcast(q)
        .join(n, F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", cosine(F.col("qv"), F.col("nv")).alias("cosine"))
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TXT_TOP_K)
        .select("q_id", "n_id", "cosine", "rank")
    )


TEXT_ANN_TOPK_SQL = f"""
WITH vecs AS ({HASHED_TFIDF_SQL}),
e AS (SELECT doc_id, CAST(feature AS DOUBLE[]) AS v FROM vecs),
scored AS (
  SELECT q.doc_id AS q_id, n.doc_id AS n_id,
         round(list_dot_product(q.v, n.v)
               / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(n.v, n.v))), 6) AS cosine
  FROM e q JOIN e n ON q.doc_id < {TXT_N_QUERIES} AND q.doc_id <> n.doc_id
)
SELECT q_id, n_id, cosine, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY cosine DESC, n_id ASC) AS rank
  FROM scored
)
WHERE rank <= {TXT_TOP_K}
"""
