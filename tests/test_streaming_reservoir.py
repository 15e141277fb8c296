"""Streaming deterministic reservoir: the final per-stratum snapshot must
be BIT-IDENTICAL to the batch stratified sample over the same rows, state
must stay bounded at K per stratum, and the sample must be invariant to
how the stream is micro-batched (the determinism contract)."""

import json
import math

from streamprocessing_with_kafka_spark.operators.sampling import (
    STRATUM_K,
    stratified_sample,
)
from streamprocessing_with_kafka_spark.sources.tables import load_table
from streamprocessing_with_kafka_spark.streaming.curation import (
    file_document_stream,
)
from streamprocessing_with_kafka_spark.streaming.reservoir import (
    streaming_stratified_sample,
)


def _stream_sample(spark, sf_dir, tmp_path, n_batches):
    rows = [
        r.asDict()
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .collect()
    ]
    inp, ckpt = tmp_path / f"docs{n_batches}", tmp_path / f"ckpt{n_batches}"
    inp.mkdir()
    per = math.ceil(len(rows) / n_batches)
    for b in range(n_batches):
        with open(inp / f"b{b}.json", "w") as f:
            for r in rows[b * per : (b + 1) * per]:
                f.write(json.dumps(r) + "\n")
    name = f"res_stream_{n_batches}"
    q = (
        streaming_stratified_sample(file_document_stream(spark, str(inp)))
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .outputMode("update")
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain"
    return {
        (r.lang, r.source, r.doc_id, r.sample_rank)
        for r in spark.sql(
            f"""
            SELECT s.lang, s.source, s.doc_id, s.sample_rank
            FROM {name} s
            JOIN (SELECT lang AS ml, source AS ms, MAX(n_seen) AS mn
                  FROM {name} GROUP BY 1, 2) m
              ON s.lang = m.ml AND s.source = m.ms AND s.n_seen = m.mn
            """
        ).collect()
    }


def test_streaming_reservoir_converges_to_batch_sample(spark, sf_dir, tmp_path):
    streamed = _stream_sample(spark, sf_dir, tmp_path, n_batches=3)
    batch = {
        (r.lang, r.source, r.doc_id, r.sample_rank)
        for r in stratified_sample(spark, sf_dir).collect()
    }
    assert batch and streamed == batch


def test_streaming_reservoir_is_batching_invariant(spark, sf_dir, tmp_path):
    """1 batch vs 5 batches must yield the identical sample -- the
    determinism that makes the sampler retry/replay-safe."""
    assert _stream_sample(spark, sf_dir, tmp_path, 1) == _stream_sample(
        spark, sf_dir, tmp_path, 5
    )


def test_streaming_reservoir_state_is_bounded(spark, sf_dir, tmp_path):
    """No stratum snapshot may ever exceed K rows."""
    streamed = _stream_sample(spark, sf_dir, tmp_path, n_batches=4)
    per_stratum: dict = {}
    for lang, source, _, rank in streamed:
        per_stratum.setdefault((lang, source), []).append(rank)
    assert per_stratum
    for ranks in per_stratum.values():
        assert len(ranks) <= STRATUM_K
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
