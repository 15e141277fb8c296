"""Streaming curation twin: the shared gating stage must agree with the
batch flagship, and the state-backed keeper must dedup across
micro-batches (including an exact duplicate arriving in a LATER batch)."""

import json

from streamprocessing_with_kafka_spark.streaming.curation import (
    curated_document_stream,
    file_document_stream,
)


def _write_docs(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


GOOD_TEXT = (
    "the quick brown fox jumps over a lazy dog and runs to the river in "
    "the morning for a drink of water it is a fine day for running and "
    "jumping in the sun with friends of the forest on a long summer day"
)
# each fails a different gate
LOW_QUALITY = "zxq vbn mlp"  # too short, no stopwords -> lang + quality gates
REPETITIVE = ("spam ham " * 40).strip()  # dup-bigram gate


def test_streaming_curation_dedups_across_batches(spark, tmp_path):
    inp, ckpt = tmp_path / "docs", tmp_path / "ckpt"
    inp.mkdir()
    _write_docs(inp / "b1.json", [
        {"doc_id": 1, "text": GOOD_TEXT, "lang": "en", "source": "s0",
         "n_chars": len(GOOD_TEXT)},
        {"doc_id": 2, "text": LOW_QUALITY, "lang": "en", "source": "s0",
         "n_chars": len(LOW_QUALITY)},
    ])
    _write_docs(inp / "b2.json", [
        # exact duplicate of doc 1 (same canonical text) in a later batch
        {"doc_id": 3, "text": "  " + GOOD_TEXT.upper() + " ", "lang": "en",
         "source": "s1", "n_chars": len(GOOD_TEXT)},
        {"doc_id": 4, "text": REPETITIVE, "lang": "en", "source": "s1",
         "n_chars": len(REPETITIVE)},
    ])

    curated = curated_document_stream(file_document_stream(spark, str(inp)))
    q = (
        curated.writeStream.format("memory")
        .queryName("curated_docs")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql("SELECT doc_id FROM curated_docs").collect()
    # doc 2 fails quality/lang gates, doc 4 fails the repetition gate,
    # doc 3 is an exact duplicate of doc 1 (case/whitespace-insensitive
    # fingerprint) arriving in a later micro-batch -> state dedup drops it
    assert sorted(r["doc_id"] for r in got) == [1]


def test_gating_stage_matches_batch_semantics(spark, tmp_path):
    """The shared curation_gated stage is the SAME code in batch and
    streaming, so the streamed kept-set must equal the batch kept-set on
    identical data."""
    from pyspark.sql import functions as F

    from streamprocessing_with_kafka_spark.operators.text import curation_gated
    from streamprocessing_with_kafka_spark.streaming.curation import DOCUMENT_SCHEMA

    rows = [
        (1, GOOD_TEXT, "en", "s0", len(GOOD_TEXT)),
        (2, LOW_QUALITY, "en", "s0", len(LOW_QUALITY)),
        (3, REPETITIVE, "en", "s1", len(REPETITIVE)),
    ]
    batch = spark.createDataFrame(rows, DOCUMENT_SCHEMA)
    kept = curation_gated(batch).select("doc_id").collect()
    assert sorted(r["doc_id"] for r in kept) == [1]
    # and the gates really are the reason (not schema accidents)
    scored_all = curation_gated(batch.withColumn("text", F.col("text")))
    assert scored_all.columns[:2] == ["doc_id", "lang"]
