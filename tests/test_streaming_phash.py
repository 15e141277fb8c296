"""Streaming pHash ingest gate: arriving BMPs screened against a frozen
banded index must reproduce the batch Hamming verdicts exactly, across
multi-batch arrival; fresh images pass the gate silently."""

import struct

from pyspark.sql import functions as F

from streamprocessing_with_kafka_spark.operators.multimodal import (
    PHASH_BANDS,
    ahash_frame,
)
from streamprocessing_with_kafka_spark.streaming.phash_ingest import (
    _banded,
    match_batch,
    gate_sink,
    phash_index_model,
)
from tests.test_multimodal import make_bmp_pattern


def _pix_base(x, y):
    return (255, 255, 255) if (x // 2 + y // 2) % 2 else (0, 0, 0)


def _pix_noisy(x, y):
    if y < 2 and x < 4:
        r, g, b = _pix_base(x, y)
        return (255 - r, 255 - g, 255 - b)
    return _pix_base(x, y)


def _pix_inverted(x, y):
    r, g, b = _pix_base(x, y)
    return (255 - r, 255 - g, 255 - b)


def _frozen_index(spark, payloads):
    idx = spark.createDataFrame(payloads, "doc_id long, payload binary")
    hashes = ahash_frame(idx).select(
        F.col("ahash").alias("index_hash"), F.lit(1).alias("n_same_hash")
    )
    return _banded(hashes, "index_hash").localCheckpoint()


def test_gate_flags_noisy_dup_passes_fresh(spark):
    banded = _frozen_index(
        spark, [(100, make_bmp_pattern(16, 16, _pix_base))]
    )
    arriving = spark.createDataFrame(
        [
            (1, make_bmp_pattern(16, 16, _pix_noisy)),
            (2, make_bmp_pattern(16, 16, _pix_inverted)),
        ],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in match_batch(arriving, banded).collect()}
    assert set(got) == {1}
    assert 0 < got[1].hamming <= 3


def test_gate_streaming_multibatch_matches_batch(spark, tmp_path):
    banded = _frozen_index(
        spark,
        [
            (100, make_bmp_pattern(16, 16, _pix_base)),
            (101, make_bmp_pattern(16, 16, _pix_inverted)),
        ],
    )
    arrivals = [
        (1, make_bmp_pattern(16, 16, _pix_noisy)),       # matches base
        (2, make_bmp_pattern(16, 16, _pix_base)),        # exact dup, hamming 0
        (3, make_bmp_pattern(16, 16, lambda x, y: (x * 16 % 256, 0, 0))),
    ]
    inp, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ck"
    inp.mkdir()
    for i, row in enumerate(arrivals):
        spark.createDataFrame([row], "doc_id long, payload binary").write.parquet(
            str(inp / f"b{i}.parquet")
        )
    # batch expectation over the union
    all_docs = spark.createDataFrame(arrivals, "doc_id long, payload binary")
    expected = {
        (r.doc_id, r.index_hash): r.hamming
        for r in match_batch(all_docs, banded).collect()
    }
    stream = spark.readStream.schema("doc_id LONG, payload BINARY").option(
        "recursiveFileLookup", "true"
    ).parquet(str(inp))
    q = (
        stream.writeStream.foreachBatch(gate_sink(banded, str(out)))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain"
    streamed = {
        (r.doc_id, r.index_hash): r.hamming
        for r in spark.read.parquet(str(out)).collect()
    }
    assert streamed == expected
    assert (2, [k for (d, k) in expected if d == 2][0]) in streamed
    assert streamed[(2, [k for (d, k) in expected if d == 2][0])] == 0
    assert not any(d == 3 for (d, _) in streamed)


def test_index_model_bands_every_distinct_hash(spark, sf_dir):
    from streamprocessing_with_kafka_spark.operators.multimodal import (
        mm_phash_index,
    )

    n_hashes = (
        mm_phash_index(spark, sf_dir).select("ahash").distinct().count()
    )
    assert phash_index_model(spark, sf_dir).count() == n_hashes * PHASH_BANDS
