"""Streaming corpus curation: the batch flagship (operators/text.py
curation_pipeline) run incrementally over a document stream.

The scoring/gating stage is shared code -- `curation_gated` is narrow and
therefore streaming-legal as-is. Only the exact-dedup keeper differs:
batch picks min(doc_id) per fingerprint with a window; a stream cannot
window, so the keeper is state-backed `dropDuplicates(["fingerprint"])` --
first arrival wins, totals converge to the same kept-set cardinality.
That divergence (arrival-order vs doc_id-order keeper) is inherent to
incremental execution and documented here rather than papered over.

State note for unbounded corpora: plain dropDuplicates keeps every
fingerprint forever; at 100 TB use `dedup_within_watermark`'s pattern
(dropDuplicatesWithinWatermark on an event-time column) to bound state to
the re-delivery horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from streamprocessing_with_kafka_spark.operators.text import curation_gated

DOCUMENT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def file_document_stream(spark: SparkSession, path: str) -> DataFrame:
    """JSONL document stream (the file-based twin of a Kafka documents
    topic; swap format/options for the broker in production)."""
    return (
        spark.readStream.schema(DOCUMENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(path)
    )


def curated_document_stream(docs: DataFrame) -> DataFrame:
    """Incrementally curated corpus: gates + scrub + fingerprint shared
    with batch, keeper = state-backed first-arrival dedup."""
    return curation_gated(docs, pushdown_barrier=False).dropDuplicates(
        ["fingerprint"]
    ).select(
        "doc_id", "lang", "quality", "dup_bigram_frac", "n_tokens", "scrubbed"
    )
