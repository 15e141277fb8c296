"""Streaming MinHash-LSH dedup twin: the narrow per-row signatures must be
bit-identical to the batch groupBy signatures, and the union of candidate
pairs emitted across micro-batches must equal the batch candidate set."""

import json
import math

from pyspark.sql import functions as F

from streamprocessing_with_kafka_spark.operators.dedup import (
    _band_keys,
    _signature_agg,
    word_ngram_rows,
    SHINGLE_N,
)
from streamprocessing_with_kafka_spark.sources.tables import load_table
from streamprocessing_with_kafka_spark.streaming.curation import (
    file_document_stream,
)
from streamprocessing_with_kafka_spark.streaming.minhash_dedup import (
    narrow_minhash_signatures,
    streaming_minhash_candidates,
)


def _batch_candidates(spark, sf_dir):
    """The batch LSH candidate set: pairs sharing any band bucket."""
    d = load_table(spark, sf_dir, "documents")
    sh = word_ngram_rows(d, SHINGLE_N, alias="shingle")
    bands = _band_keys(_signature_agg(sh))
    a, b = bands.alias("a"), bands.alias("b")
    return {
        (r.doc_a, r.doc_b)
        for r in a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .collect()
    }


def test_narrow_signatures_match_batch(spark, sf_dir):
    """Same shingles, same hash family => the streaming per-row mins must
    equal the batch groupBy mins EXACTLY for every doc."""
    d = load_table(spark, sf_dir, "documents")
    batch = {
        r["doc_id"]: tuple(r[c] for c in sorted(r.asDict()) if c.startswith("mh"))
        for r in _signature_agg(word_ngram_rows(d, SHINGLE_N, alias="shingle")).collect()
    }
    narrow = {
        r["doc_id"]: tuple(r[c] for c in sorted(r.asDict()) if c.startswith("mh"))
        for r in narrow_minhash_signatures(d).collect()
    }
    assert narrow == batch


def test_streaming_candidates_converge_to_batch(spark, sf_dir, tmp_path):
    """Candidates emitted across 3 micro-batches, deduped, == the batch
    candidate pair set (BUCKET_CAP far above any fixture bucket)."""
    rows = [
        r.asDict()
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .collect()
    ]
    inp, ckpt = tmp_path / "docs", tmp_path / "ckpt"
    inp.mkdir()
    per = math.ceil(len(rows) / 3)
    for b in range(3):
        with open(inp / f"b{b}.json", "w") as f:
            for r in rows[b * per : (b + 1) * per]:
                f.write(json.dumps(r) + "\n")
    q = (
        streaming_minhash_candidates(file_document_stream(spark, str(inp)))
        .writeStream.format("memory")
        .queryName("mh_cand_stream")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain"
    streamed = {
        (r.doc_a, r.doc_b)
        for r in spark.sql("SELECT DISTINCT doc_a, doc_b FROM mh_cand_stream").collect()
    }
    assert streamed == _batch_candidates(spark, sf_dir)


def test_bucket_cap_bounds_state_and_output(spark, tmp_path):
    """With bucket_cap=2, a bucket of 4 identical docs admits only the
    first two members -- exactly 1 pair emitted, not 6."""
    import streamprocessing_with_kafka_spark.streaming.minhash_dedup as md

    text = " ".join(f"w{i}" for i in range(10))
    inp, ckpt = tmp_path / "docs", tmp_path / "ckpt"
    inp.mkdir()
    with open(inp / "b0.json", "w") as f:
        for doc_id in range(4):
            f.write(
                json.dumps(
                    {"doc_id": doc_id, "text": text, "lang": "en",
                     "source": "s", "n_chars": len(text)}
                ) + "\n"
            )
    q = (
        md.streaming_minhash_candidates(
            file_document_stream(spark, str(inp)), bucket_cap=2
        )
        .writeStream.format("memory")
        .queryName("mh_cap_stream")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain"
    pairs = {
        (r.doc_a, r.doc_b)
        for r in spark.sql("SELECT DISTINCT doc_a, doc_b FROM mh_cap_stream").collect()
    }
    assert pairs == {(0, 1)}
