"""Streaming perceptual-hash ingest gate: screen arriving image
payloads against the FROZEN corpus pHash index -- the multimodal twin
of the frozen-model ingest family (`pq_ingest` / `ivf_ingest` /
`bpe_encode`): train/build offline, freeze the artifact, apply at scan
speed to arriving data.

The index is `operators/multimodal.mm_phash_index`'s hash set, shipped
banded exactly like the batch pair join (`phash_pairs`): each stored
64-bit aHash explodes once offline into its PHASH_BANDS 16-bit
(band, slice) keys.  Each arriving payload hashes through the SAME
`_ahash64` (one code path, two execution modes), explodes into its own
band keys, and a stream-static EQUI-join + JVM `bit_count` verify
yields every index hash within PHASH_HAMMING_MAX -- recall 1 by the
same pigeonhole argument, no all-pairs scan, no streaming state (the
gate is per-batch by design: an arriving image either matches the
frozen index or it does not; cross-batch arrival-vs-arrival dedup is
the next index refit's job, exactly as in production pHash pipelines).

Per-batch foreachBatch semantics (the `bpe_encode` shape) because the
candidate join emits one row per AGREEING BAND; the in-batch
dropDuplicates that collapses them is a plain batch operation.

tests/test_streaming_phash.py pins gate verdicts on genuine BMP
fixtures: a noisy duplicate of an indexed image is flagged with the
exact batch Hamming distance, a fresh image passes, across multi-batch
arrival."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from streamprocessing_with_kafka_spark.operators.multimodal import (
    PHASH_HAMMING_MAX,
    ahash_frame,
    mm_phash_index,
    phash_band_structs,
)


def _banded(hashes: DataFrame, hash_col: str) -> DataFrame:
    """Explode a (.., <hash_col>) frame into (band, slice) keys via the
    batch pair join's OWN banding definition
    (`multimodal.phash_band_structs`) -- one expression, both sides of
    the pigeonhole argument."""
    return hashes.select(
        "*", F.explode(phash_band_structs(hash_col)).alias("bk")
    ).select("*", "bk.band", "bk.slice").drop("bk")


def phash_index_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frozen banded index: distinct corpus hashes with their
    Hamming-0 cluster sizes, pre-exploded to band keys offline --
    built from the SAME batch operator, so gate verdicts are
    definitionally consistent with the stored index."""
    idx = (
        mm_phash_index(spark, sf_dir)
        .select(
            F.col("ahash").alias("index_hash"),
            F.col("n_same_hash"),
        )
        .distinct()
    )
    return _banded(idx, "index_hash")


def match_batch(docs: DataFrame, banded_index: DataFrame) -> DataFrame:
    """Gate one (doc_id, payload) batch against the frozen banded
    index: (doc_id, ahash, index_hash, hamming, n_same_hash), one row
    per matched index hash within PHASH_HAMMING_MAX."""
    arriving = _banded(ahash_frame(docs), "ahash")
    return (
        arriving.join(banded_index, ["band", "slice"])
        .select("doc_id", "ahash", "index_hash", "n_same_hash")
        .dropDuplicates(["doc_id", "ahash", "index_hash", "n_same_hash"])
        .withColumn(
            "hamming", F.expr("bit_count(ahash ^ index_hash)").cast("int")
        )
        .filter(F.col("hamming") <= PHASH_HAMMING_MAX)
    )


def gate_sink(banded_index: DataFrame, out_dir: str):
    """foreachBatch fn appending gate verdicts to a parquet log."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        match_batch(batch, banded_index).withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("append").parquet(out_dir)

    return write_batch
