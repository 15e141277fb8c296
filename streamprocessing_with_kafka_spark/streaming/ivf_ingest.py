"""Streaming IVF ingest: assign arriving embedding vectors to their
nearest-centroid cell -- the index-maintenance twin of
operators/similarity.ivf_assignments.

Production shape: centroids are (re)trained offline and FROZEN between
refits, so they ship once as a 1-row static frame holding the centroid
array; each arriving vector computes its nearest cell with a per-row
left fold over that array -- no Python, no join of the stream, no
shuffle, no state. This is strictly cheaper than the batch plan (whose
crossJoin + per-vector window rank shuffles the scored pairs): the fold
IS the argmax, so assignment runs at scan speed -- and newly ingested
vectors become searchable the moment their (cell, vector) row lands in
the index table.

Tie behavior matches the batch rank exactly: centroids fold in
ascending cell order and only a STRICTLY greater cosine replaces the
running best, so equal scores keep the smallest cell -- the batch
window's (cos DESC, cell ASC) order. Convergence is pinned in
tests/test_streaming_ivf.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from streamprocessing_with_kafka_spark.operators.similarity import (
    centroid_row,
    is_index_member,
    nearest_cell,
)


def ivf_centroid_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frozen centroid set as ONE static row -- shared with the batch
    operator (operators/similarity.centroid_row), so batch and stream
    assign from definitionally identical models."""
    return centroid_row(spark, sf_dir)


def streaming_ivf_assign(vecs: DataFrame, model: DataFrame) -> DataFrame:
    """(vec_id, cell): nearest-centroid assignment for a vector stream,
    value-identical to the batch ivf_assignments for the same rows (both
    are operators/similarity.nearest_cell -- one code path, two
    execution modes).

    The ingest gate mirrors the batch clean scan (r9 policy): a vector
    that is NULL, carries a NULL component, or has no vec_id identity
    never enters the index (r10: is_index_member) --
    without this filter the stream would admit rows the batch index
    excludes and the two indexes would silently diverge."""
    return (
        vecs.filter(is_index_member(F.col("vec_id"), F.col("embedding")))
        .crossJoin(model)
        .select("vec_id", nearest_cell(F.col("embedding")).alias("cell"))
    )
