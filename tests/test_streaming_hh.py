"""Streaming SpaceSaving heavy hitters: with capacity >= vocabulary the
final state must converge EXACTLY to the batch two-phase answer across
micro-batches; with a tiny capacity the sketch must evict but never
undercount a tracked token (the no-false-negative guarantee thresholding
relies on)."""

import json
import math

from pyspark.sql import functions as F

from streamprocessing_with_kafka_spark.operators.text import (
    HH_PHI,
    _tokens,
    token_heavy_hitters,
)
from streamprocessing_with_kafka_spark.sources.tables import load_table
from streamprocessing_with_kafka_spark.streaming.curation import (
    file_document_stream,
)
from streamprocessing_with_kafka_spark.streaming.heavy_hitters import (
    streaming_heavy_hitters,
)


def _stream_documents(spark, sf_dir, tmp_path, capacity, n_batches=3):
    """Spill the documents table into n_batches JSONL files, run the
    stateful sketch with availableNow, and return each shard's FINAL
    state (the emission at its max shard_total -- earlier triggers may
    list since-evicted tokens)."""
    rows = [
        r.asDict()
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .collect()
    ]
    inp, ckpt = tmp_path / "docs", tmp_path / "ckpt"
    inp.mkdir()
    per = math.ceil(len(rows) / n_batches)
    for b in range(n_batches):
        with open(inp / f"b{b}.json", "w") as f:
            for r in rows[b * per : (b + 1) * per]:
                f.write(json.dumps(r) + "\n")
    q = (
        streaming_heavy_hitters(file_document_stream(spark, str(inp)), capacity)
        .writeStream.format("memory")
        .queryName("hh_stream")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .outputMode("update")
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain"
    return spark.sql(
        """
        SELECT h.shard, h.token, h.est_count, h.shard_total
        FROM hh_stream h
        JOIN (SELECT shard AS m_shard, MAX(shard_total) AS mt
              FROM hh_stream GROUP BY shard) m
          ON h.shard = m.m_shard AND h.shard_total = m.mt
        """
    ).collect()


def test_streaming_sketch_converges_to_batch_answer(spark, sf_dir, tmp_path):
    final = _stream_documents(spark, sf_dir, tmp_path, capacity=100_000)
    total = sum({r.shard: r.shard_total for r in final}.values())
    threshold = max(1, math.ceil(HH_PHI * total))
    streamed = {
        (r.token, r.est_count) for r in final if r.est_count >= threshold
    }
    batch = {
        (r.token, r.n) for r in token_heavy_hitters(spark, sf_dir).collect()
    }
    # capacity exceeds the fixture vocabulary per shard, so the sketch is
    # exact and the streamed snapshot IS the batch answer
    assert batch and streamed == batch
    # token totals agree with the raw corpus (nothing dropped or doubled)
    d = load_table(spark, sf_dir, "documents")
    assert total == d.select(F.explode(_tokens()).alias("t")).count()


def test_streaming_sketch_evicts_but_never_undercounts(spark, sf_dir, tmp_path):
    capacity = 3  # well under the per-shard vocabulary -> forces eviction
    final = _stream_documents(spark, sf_dir, tmp_path, capacity=capacity)
    per_shard = {}
    for r in final:
        per_shard.setdefault(r.shard, []).append(r)
    # state is genuinely bounded: no shard tracks more than `capacity`
    assert per_shard and all(len(v) <= capacity for v in per_shard.values())
    d = load_table(spark, sf_dir, "documents")
    true_counts = {
        r.t: r.n
        for r in d.select(F.explode(_tokens()).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # eviction actually happened (vocabulary > capacity per shard)...
    assert any(len(v) == capacity for v in per_shard.values())
    # ...yet every tracked estimate is an OVERcount of the true frequency
    for r in final:
        assert r.est_count >= true_counts[r.token], r.token
