"""Multimodal column plumbing: image/audio/video as opaque `binary`
payloads with typed metadata, decoded via Arrow-batched Pandas UDFs
(BASELINE.json north star).

The container has no image/audio codecs, so `decode` is a STUB: a
deterministic md5-derived fake standing in for a real decoder (clearly
marked below). Everything around it is the real production shape --
binary column, typed metadata schema, `mapInPandas` batch iteration,
per-frame fan-out -- and because the fake is pure arithmetic on md5, even
the Pandas-UDF path is DuckDB-oracle-checkable, which pins the Arrow
round-trip (binary -> pandas bytes -> arrow) exactly.

Scale notes: payloads stay opaque binary end to end (no base64 inflation,
no driver collect); mapInPandas streams Arrow batches so peak memory is
one batch per core; frame fan-out is a generate/explode (narrow, no
shuffle). At 100 TB you partition by the content shard key
(substr(md5, 1, n)) to spread decode work evenly -- included as
`shard_key`.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from streamprocessing_with_kafka_spark.sources.tables import load_table

MODALITIES = ["image", "audio", "video"]


def mm_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the multimodal corpus from `documents`: utf-8 payload
    bytes + a deterministic modality tag (doc_id % 3)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.element_at(F.array(*[F.lit(m) for m in MODALITIES]), (F.col("doc_id") % 3 + 1).cast("int")).alias(
            "mm_type"
        ),
    )


def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over the binary column -- no decode needed."""
    c = mm_corpus(spark, sf_dir)
    return c.select(
        "doc_id",
        "mm_type",
        F.octet_length("payload").alias("n_bytes"),
        F.md5("payload").alias("content_md5"),
        F.substring(F.md5("payload"), 1, 4).alias("shard_key"),
    )


MM_BINARY_META_SQL = """
SELECT doc_id,
  (['image', 'audio', 'video'])[doc_id % 3 + 1] AS mm_type,
  octet_length(encode(text)) AS n_bytes,
  md5(text) AS content_md5,
  substr(md5(text), 1, 4) AS shard_key
FROM documents
"""

_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mm_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """STUB decoder -- deterministic md5-derived dimensions.

    A real deployment replaces this body with PIL/ffmpeg/soundfile calls
    (raise NotImplementedError there if the codec is absent); the Spark
    plumbing -- schema, batching, partitioning -- is unchanged.
    """
    h = hashlib.md5(payload).hexdigest()
    width = 64 + int(h[0:4], 16) % 960
    height = 64 + int(h[4:8], 16) % 540
    n_frames = 1 + int(h[8:10], 16) % 30
    return width, height, n_frames


def mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode: mapInPandas streams (doc_id, payload,
    mm_type) batches through the (stub) decoder."""
    c = mm_corpus(spark, sf_dir)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mm_type": pdf["mm_type"],
                    "width": meta.map(lambda t: t[0]).astype("int32"),
                    "height": meta.map(lambda t: t[1]).astype("int32"),
                    "n_frames": meta.map(lambda t: t[2]).astype("int32"),
                }
            )

    return c.mapInPandas(decode_batches, schema=_DECODE_SCHEMA)


MM_DECODE_SQL = """
SELECT doc_id,
  (['image', 'audio', 'video'])[doc_id % 3 + 1] AS mm_type,
  CAST(64 + CAST(('0x' || substr(md5(text), 1, 4)) AS INTEGER) % 960 AS INTEGER) AS width,
  CAST(64 + CAST(('0x' || substr(md5(text), 5, 4)) AS INTEGER) % 540 AS INTEGER) AS height,
  CAST(1 + CAST(('0x' || substr(md5(text), 9, 2)) AS INTEGER) % 30 AS INTEGER) AS n_frames
FROM documents
"""

FRAME_STRIDE = 5


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame fan-out for video rows: sample every FRAME_STRIDE-th
    frame; frame payload reference is a content-addressed md5."""
    dec = mm_decode(spark, sf_dir).filter(F.col("mm_type") == "video")
    frames = F.filter(
        F.sequence(F.lit(0), F.col("n_frames") - 1),
        lambda i: i % FRAME_STRIDE == 0,
    )
    c = mm_corpus(spark, sf_dir).select("doc_id", F.md5("payload").alias("content_md5"))
    return (
        dec.join(c, "doc_id")
        .select("doc_id", F.explode(frames).alias("frame_id"), "content_md5")
        .withColumn(
            "frame_md5",
            F.md5(F.concat(F.col("content_md5"), F.lit("|"), F.col("frame_id").cast("string"))),
        )
        .select("doc_id", "frame_id", "frame_md5")
    )


MM_FRAME_SAMPLE_SQL = f"""
WITH dec AS ({MM_DECODE_SQL}),
d AS (SELECT doc_id, md5(text) AS content_md5 FROM documents),
fr AS (
  SELECT dec.doc_id, content_md5,
         unnest(list_filter(range(0, n_frames), i -> i % {FRAME_STRIDE} = 0)) AS frame_id
  FROM dec JOIN d ON dec.doc_id = d.doc_id
  WHERE mm_type = 'video'
)
SELECT doc_id, CAST(frame_id AS INTEGER) AS frame_id,
       md5(content_md5 || '|' || CAST(frame_id AS VARCHAR)) AS frame_md5
FROM fr
"""
