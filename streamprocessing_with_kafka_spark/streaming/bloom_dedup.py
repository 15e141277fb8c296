"""Streaming exact-dedup gate with CONSTANT memory: a Bloom filter per
hash shard on applyInPandasWithState.

The state-backed dedup in streaming/curation.py (dropDuplicates on the
fingerprint) is exact but keeps every fingerprint forever -- O(corpus)
state, the same unbounded-vocabulary failure streaming/heavy_hitters.py
avoids with SpaceSaving. This module is the constant-memory point on that
trade-off curve: BLOOM_WORDS 63-bit words per shard, period. The Bloom
guarantee is one-sided exactly the way a dedup gate wants:

  - NO false negatives: a fingerprint that was inserted is always
    reported as seen -- a true duplicate can never sneak into the corpus;
  - false positives at a bounded rate: a unique document may be dropped
    with p ~ (1 - e^(-k*n/m))^k (k=BLOOM_K hashes, m bits, n inserted),
    i.e. the filter trades a quantified sliver of RECALL of uniques for
    hard memory bounds. Size m to the expected shard cardinality
    (47 KiB/shard here suits the demo corpus; a 100 TB ingest uses GiB
    shards and more of them -- the plan shape is unchanged).

All BLOOM_K bit positions derive from ONE md5 of the fingerprint via the
split-in-half double-hashing scheme (h1 + i*h2, Kirsch & Mitzenmacher
2006), so the test oracle can reproduce the exact bit pattern.

Arrival order inside a micro-batch is normalized to doc_id order, so
which copy of a duplicate pair is 'first' is deterministic under retries.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import hashlib

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from streamprocessing_with_kafka_spark.functions.hashing import md5_long
from streamprocessing_with_kafka_spark.operators.text import canonical_text

N_SHARDS = 8
BLOOM_WORDS = 6240  # 63-bit words per shard: 393120 bits ~ 47 KiB
BLOOM_K = 4

OUTPUT_SCHEMA = "doc_id BIGINT, fingerprint STRING, is_dup BOOLEAN"
STATE_SCHEMA = "words ARRAY<BIGINT>, n_inserted BIGINT"


def bloom_positions(fingerprint: str, n_bits: int, k: int = BLOOM_K) -> list[int]:
    """k deterministic bit positions from one md5 (double hashing)."""
    h = hashlib.md5(fingerprint.encode()).hexdigest()
    h1 = int(h[:15], 16)
    h2 = int(h[15:30], 16) | 1  # odd => full-period stepping
    return [(h1 + i * h2) % n_bits for i in range(k)]


def _make_update_shard(n_words: int, k: int):
    """Closure (pickled by value) over the filter geometry. Words carry
    63 usable bits each: bit 63 would overflow the signed BIGINT the
    state schema stores (Arrow int64), so the sign bit stays clear."""
    n_bits = n_words * 63

    def update_shard(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            words, n_inserted = list(state.get[0]), state.get[1]
        else:
            words, n_inserted = [0] * n_words, 0
        rows = sorted(
            ((int(r.doc_id), r.fingerprint) for pdf in pdfs for r in pdf.itertuples()),
            key=lambda t: t[0],
        )
        out_id, out_fp, out_dup = [], [], []
        for doc_id, fp in rows:
            # NULL fingerprint (NULL-text doc): batch dedup_exact keeps
            # ONE NULL-fingerprint group, so all such docs dedup against
            # each other. "<NULL>" contains non-hex characters and can
            # never collide with a real md5 hex fingerprint; isinstance
            # guards both None and NaN arrivals from pandas.
            pos = bloom_positions(
                fp if isinstance(fp, str) else "<NULL>", n_bits, k
            )
            seen = all(words[p // 63] & (1 << (p % 63)) for p in pos)
            if not seen:
                for p in pos:
                    words[p // 63] |= 1 << (p % 63)
                n_inserted += 1
            out_id.append(doc_id)
            out_fp.append(fp)
            out_dup.append(seen)
        state.update((words, n_inserted))
        yield pd.DataFrame(
            {"doc_id": out_id, "fingerprint": out_fp, "is_dup": out_dup}
        )

    return update_shard


def streaming_bloom_dedup(
    docs: DataFrame, n_words: int = BLOOM_WORDS, k: int = BLOOM_K
) -> DataFrame:
    """(doc_id, fingerprint, is_dup) in append mode: is_dup=True means the
    document's fingerprint was (probably) seen before -- drop it from the
    corpus. Fingerprinting is the batch `text.fingerprint` definition, so
    batch and stream agree on WHAT a duplicate is; sharding by fingerprint
    hash spreads filter state and update work across N_SHARDS parallel
    state partitions."""
    fp = docs.select(
        "doc_id",
        F.md5(canonical_text()).alias("fingerprint"),
    ).withColumn(
        "shard", (md5_long(F.col("fingerprint")) % N_SHARDS).cast("int")
    )
    return fp.groupBy("shard").applyInPandasWithState(
        _make_update_shard(n_words, k),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
