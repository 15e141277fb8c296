"""Streaming heavy hitters: the incremental twin of the batch two-phase
operator (operators/text.py token_heavy_hitters), built as the SpaceSaving
sketch (Metwally et al. 2005) per hash shard on applyInPandasWithState.

Why SpaceSaving and not a plain streaming groupBy(token).count(): the
update-mode aggregate keeps STATE PER DISTINCT TOKEN -- on an unbounded
vocabulary that state grows without bound, which is exactly the failure
the batch operator's pigeonhole avoids at rest. SpaceSaving caps state at
CAPACITY counters per shard and still guarantees (a) every token with
true frequency > shard_total / CAPACITY is tracked, and (b) estimates
only OVERcount, by at most the minimum counter at insertion time -- so
thresholding tracked tokens can produce false positives but never drop a
true heavy hitter. With CAPACITY >= the shard's vocabulary the sketch
degenerates to exact counts and the final state equals the batch answer
(the convergence test).

Sharding by md5(token) % N_SHARDS spreads state and update work across
N_SHARDS parallel state partitions -- the same key-spreading the batch
operator gets from its partition-local candidate pass."""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from streamprocessing_with_kafka_spark.functions.hashing import md5_long
from streamprocessing_with_kafka_spark.operators.text import _tokens

N_SHARDS = 8
CAPACITY = 4096  # tracked tokens per shard; error bound = shard_total/CAPACITY

HH_OUTPUT_SCHEMA = "shard INT, token STRING, est_count BIGINT, shard_total BIGINT"
HH_STATE_SCHEMA = "tokens ARRAY<STRING>, counts ARRAY<BIGINT>, total BIGINT"


def _make_update_shard(capacity: int):
    """Closure over capacity (pickled BY VALUE to the workers -- a module
    global would re-resolve to this module's default on the executor)."""

    def update_shard(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            tokens, counts, total = state.get
            counter = dict(zip(tokens, counts))
        else:
            counter, total = {}, 0
        for pdf in pdfs:
            for tok in pdf["token"]:
                total += 1
                if tok in counter:
                    counter[tok] += 1
                elif len(counter) < capacity:
                    counter[tok] = 1
                else:
                    # SpaceSaving eviction: the new token inherits the
                    # minimum counter + 1 (deterministic victim: min
                    # count, then token)
                    victim = min(counter, key=lambda t: (counter[t], t))
                    counter[tok] = counter.pop(victim) + 1
        state.update((list(counter.keys()), list(counter.values()), total))
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(counter),
                "token": list(counter.keys()),
                "est_count": list(counter.values()),
                "shard_total": [total] * len(counter),
            }
        )

    return update_shard


def streaming_heavy_hitters(docs: DataFrame, capacity: int = CAPACITY) -> DataFrame:
    """(shard, token, est_count, shard_total) per trigger, update mode:
    each shard's current SpaceSaving counters. Consumers threshold the
    latest snapshot PER SHARD (max shard_total -- earlier emissions may
    list since-evicted tokens): a token is a candidate heavy hitter when
    sum(est_count) >= phi * sum(shard totals) -- overestimates admit
    false positives, never false negatives."""
    # the batch operator's tokenizer, not a local re-implementation: the
    # streaming/batch convergence contract is definitional, so a tokenizer
    # change in operators/text.py must flow through here automatically
    toks = docs.select(F.explode(_tokens()).alias("token")).withColumn(
        "shard", (md5_long(F.col("token")) % N_SHARDS).cast("int")
    )
    return toks.groupBy("shard").applyInPandasWithState(
        _make_update_shard(capacity),
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
