"""Streaming BM25 search: rank a FROZEN corpus index for queries that
arrive as a stream -- the serving twin of operators/text.text_bm25_topk.

Production shape: the inverted index (postings + idf + corpus stats) is
built once per corpus snapshot by operators/text.bm25_index and pinned
(localCheckpoint here; a parquet/bucketed table on a cluster). Each
micro-batch of query documents reduces to its distinct (q_id, term)
rows -- a sliver that BROADCASTS against the static postings inside
foreachBatch, so the index is never rescanned per query and never
shuffles: per batch the work is one broadcast equi-join on term plus a
candidate-sized aggregate, exactly an inverted-index seek. foreachBatch
is the right harness (not a stream-static join) because ranking needs a
per-query aggregate + top-K, which append-mode streaming would reject
without a watermark the query stream doesn't have.

Scoring is operators/text.bm25_topk_for_queries -- the batch ranker's
own tail, shared verbatim -- so streamed rankings are bit-identical to
a batch invocation over the same query set. Unlike the batch probe
operator (whose probes are corpus docs and exclude themselves), the
stream keeps q_id == n_id hits: query ids are an EXTERNAL id space, and
a coincidental collision with a corpus doc_id must still retrieve that
doc (tests/test_streaming_bm25.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from streamprocessing_with_kafka_spark.operators.text import (
    _tokens,
    bm25_topk_for_queries,
)


def query_terms(query_docs: DataFrame) -> DataFrame:
    """(q_id, term): each query doc's DISTINCT terms -- matches the
    batch qterms (one row per (doc, term), from the grouped postings)."""
    return (
        query_docs.select(
            F.col("doc_id").alias("q_id"),
            F.explode(F.array_distinct(_tokens())).alias("term"),
        )
        # distinct ACROSS rows too: a re-delivered query doc in the same
        # micro-batch would otherwise double every score
        .distinct()
    )


def bm25_search_sink(index, audit_dir: str):
    """foreachBatch fn ranking each query micro-batch against the frozen
    index and appending (q_id, n_id, bm25, rank, batch_id) to a parquet
    log."""

    def rank_batch(batch: DataFrame, batch_id: int) -> None:
        bm25_topk_for_queries(query_terms(batch), index).withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("append").parquet(audit_dir)

    return rank_batch


def frozen_index(spark: SparkSession, sf_dir: str):
    """bm25_index over the documents table with every piece pinned
    (localCheckpoint), so per-batch ranking reuses materialized postings
    instead of re-deriving the index each trigger."""
    from streamprocessing_with_kafka_spark.operators.text import bm25_index
    from streamprocessing_with_kafka_spark.sources.tables import load_table

    postings, dfreq, stats = bm25_index(load_table(spark, sf_dir, "documents"))
    return (
        postings.localCheckpoint(),
        dfreq.localCheckpoint(),
        stats.localCheckpoint(),
    )
