"""Streaming bounded-state stratified sampler: the incremental twin of
the batch `sample_stratified` (operators/sampling.py).

The batch operator keeps the K smallest md5-ranked docs per (lang,
source) stratum. That rank is a pure function of doc_id, which makes the
streaming version a *deterministic* bottom-K reservoir: state per
stratum is just the K smallest (rank_key, doc_id) pairs seen so far --
O(K) state per stratum forever, on an unbounded stream -- and the final
state is BIT-IDENTICAL to the batch sample over the same rows (pinned in
tests/test_streaming_reservoir.py), not merely distributionally
equivalent like a classical randomized reservoir.

Scale notes: applyInPandasWithState groups by stratum, so updates spread
across state partitions by (lang, source); a hot stratum costs one
sorted merge of (state K + batch arrivals) per trigger. Emission is
update-mode snapshots; consumers take each stratum's final snapshot
(max n_seen), exactly like the SpaceSaving twin."""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from streamprocessing_with_kafka_spark.operators.sampling import STRATUM_K

RESERVOIR_OUTPUT_SCHEMA = (
    "lang STRING, source STRING, doc_id BIGINT, sample_rank INT, n_seen BIGINT"
)
RESERVOIR_STATE_SCHEMA = (
    "keys ARRAY<STRING>, doc_ids ARRAY<BIGINT>, n_seen BIGINT"
)


def _rank_key():
    # the BATCH operator's rank key, not a local variant: the
    # streaming/batch convergence contract is definitional
    return F.md5(F.concat(F.lit("strat|"), F.col("doc_id").cast("string")))


def _make_update_stratum(k: int):
    """Closure over k (pickled by value to the workers)."""

    def update_stratum(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            keys, doc_ids, n_seen = state.get
            pool = list(zip(keys, doc_ids))
        else:
            pool, n_seen = [], 0
        for pdf in pdfs:
            n_seen += len(pdf)
            pool.extend(zip(pdf["rank_key"], pdf["doc_id"].astype("int64")))
            # keep the K smallest rank keys; (key, doc_id) is a total
            # order because the key is an injective-enough md5 of doc_id
            pool.sort()
            del pool[k:]
        state.update(
            ([p[0] for p in pool], [int(p[1]) for p in pool], int(n_seen))
        )
        yield pd.DataFrame(
            {
                "lang": [key[0]] * len(pool),
                "source": [key[1]] * len(pool),
                "doc_id": [int(p[1]) for p in pool],
                "sample_rank": list(range(1, len(pool) + 1)),
                "n_seen": [int(n_seen)] * len(pool),
            }
        )

    return update_stratum


def streaming_stratified_sample(docs: DataFrame, k: int = STRATUM_K) -> DataFrame:
    """(lang, source, doc_id, sample_rank, n_seen) per trigger, update
    mode: each stratum's current deterministic bottom-K sample."""
    keyed = docs.select(
        "lang", "source", "doc_id", _rank_key().alias("rank_key")
    )
    return keyed.groupBy("lang", "source").applyInPandasWithState(
        _make_update_stratum(k),
        outputStructType=RESERVOIR_OUTPUT_SCHEMA,
        stateStructType=RESERVOIR_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
