"""Streaming MinHash-LSH near-dup candidates: the incremental twin of the
batch candidate generator (operators/dedup.py minhash_lsh_pairs), for
deduplicating an INGEST stream against everything already ingested --
without ever re-scanning the corpus.

Two-stage shape, both stages bounded:

1. Per-row signatures, narrowly. The batch path explodes shingles and
   takes columnar groupBy mins (cheapest at rest); a stream can compute
   the same PERMS mins as pure array expressions per row -- no shuffle,
   no state. `narrow_minhash_signatures` produces bit-identical mh
   columns (pinned in tests/test_streaming_minhash.py), and the band keys
   reuse the batch `_band_keys` DEFINITIONALLY (same function, narrow
   select+explode), so a banding change in operators/dedup.py flows
   through here automatically.

2. Bucket membership as keyed state. applyInPandasWithState keyed on
   (band, band_key): state = the doc_ids previously seen in that bucket;
   each arriving doc emits candidate pairs against the existing members,
   then joins them. Emission is exactly-once per pair (append mode), so
   the union of all emissions converges to the batch candidate set.

State bound: a bucket stops ACCEPTING members at BUCKET_CAP -- the
streaming analog of the batch hot-shingle df cap: a degenerate bucket
(boilerplate signature band) would otherwise grow O(members) state and
emit O(members^2) pairs. Recall bound mirrors the batch cap's contract:
pairs lost are those whose ONLY shared band is hot in all bands -- at
production band widths that means boilerplate-alike docs, and the cap is
sized so real clusters sit far below it. Overflowing docs are dropped
from the bucket deterministically (arrival order, which IS the stream
semantics).

Reference scope note: the reference pipeline has no dedup at all
(src/app/order_validator.py is record-at-a-time validation); this module
is part of the north-star LLM-pipeline surface (BASELINE.json).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from streamprocessing_with_kafka_spark.functions.hashing import (
    family_hash_one,
    md5_long,
)
from streamprocessing_with_kafka_spark.operators.dedup import (
    PERMS,
    SHINGLE_N,
    _band_keys,
)

#: max doc_ids retained per (band, band_key) bucket -- state AND output
#: stay bounded for adversarial/boilerplate buckets
BUCKET_CAP = 64

CAND_OUTPUT_SCHEMA = "band INT, doc_a BIGINT, doc_b BIGINT"
CAND_STATE_SCHEMA = "doc_ids ARRAY<BIGINT>"


def narrow_minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, mh0..mh{PERMS-1}) as pure per-row array expressions --
    streaming-legal (no shuffle), bit-identical to the batch
    `_signature_agg` (same shingling, same md5, same hash family; the
    only difference is min-over-array vs min-over-groupBy).

    Docs with < SHINGLE_N tokens have no shingles and no signature --
    filtered, exactly as the batch explode drops them."""
    w = F.split(F.col("text"), " ")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (SHINGLE_N - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, i + k) for k in range(SHINGLE_N)]
            ),
        )
    )
    gh = F.transform(grams, lambda s: md5_long(s))
    return docs.filter(F.size(w) >= SHINGLE_N).select(
        "doc_id",
        *[
            F.array_min(
                F.transform(gh, lambda h: family_hash_one(h, p, PERMS))
            ).alias(f"mh{p}")
            for p in range(PERMS)
        ],
    )


def _make_update_bucket(bucket_cap: int):
    """Closure over the cap (pickled BY VALUE to the workers -- a module
    global would re-resolve to this module's default on the executor)."""

    def update_bucket(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        members: list[int] = list(state.get[0]) if state.exists else []
        seen = set(members)
        new_docs = sorted(
            {int(d) for pdf in pdfs for d in pdf["doc_id"]} - seen
        )
        out_a: list[int] = []
        out_b: list[int] = []
        for d in new_docs:
            if len(members) >= bucket_cap:
                break  # bucket saturated: bounded state, bounded emissions
            for m in members:
                out_a.append(min(m, d))
                out_b.append(max(m, d))
            members.append(d)
        state.update((members,))
        yield pd.DataFrame(
            {"band": [key[0]] * len(out_a), "doc_a": out_a, "doc_b": out_b}
        )

    return update_bucket


def streaming_minhash_candidates(
    docs: DataFrame, bucket_cap: int = BUCKET_CAP
) -> DataFrame:
    """(band, doc_a, doc_b) candidate pairs, append mode: every pair whose
    documents share a band bucket, emitted exactly once (at the arrival
    of the later document). Downstream either verifies with exact Jaccard
    against a shingle store or treats candidates as dedup suspects
    directly (MinHash-only, the common production choice).

    Distinct pairs across ALL emissions == the batch candidate set
    (modulo bucket saturation), proven in test_streaming_minhash.py."""
    bands = _band_keys(narrow_minhash_signatures(docs))
    return bands.groupBy(
        F.col("band").cast("int").alias("band"), "band_key"
    ).applyInPandasWithState(
        _make_update_bucket(bucket_cap),
        outputStructType=CAND_OUTPUT_SCHEMA,
        stateStructType=CAND_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
