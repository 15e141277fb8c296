"""Streaming benchmark decontamination: gate an INGEST stream of
documents against a static evaluation-set n-gram dictionary -- the
incremental twin of operators/decontaminate.py.

Production shape: the benchmark corpus is fixed long before ingest, so
its distinct hashed n-grams ship to every executor ONCE as a Spark
broadcast (thousands of benchmark docs -> a few MB of 64-bit hashes; the
same sliver-vs-corpus argument as the batch broadcast join). Each
arriving document is then scored in a STATELESS Arrow-batched
mapInPandas pass -- no join, no shuffle, no streaming state at all,
which is the cheapest legal shape for a per-row gate whose reference
data is static.

Convergence contract: tokenization (distinct word NGRAM_N-grams) and
hashing (md5 -> 60-bit int) are definitionally identical to the batch
operator, so scoring the same documents through the stream yields the
batch `decontaminate` answer row-for-row (pinned in
tests/test_streaming_decontam.py). Like the batch op, documents shorter
than NGRAM_N tokens produce no row, and eval-slice members are not
scored.
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from streamprocessing_with_kafka_spark.operators.decontaminate import (
    CONTAM_FRAC,
    EVAL_MOD,
    NGRAM_N,
)
from streamprocessing_with_kafka_spark.functions.hashing import md5_long
from streamprocessing_with_kafka_spark.operators.dedup import word_ngram_rows
from streamprocessing_with_kafka_spark.sources.tables import load_table

OUTPUT_SCHEMA = (
    "doc_id BIGINT, n_ngrams BIGINT, n_hits BIGINT, "
    "contamination_frac DOUBLE, is_contaminated BOOLEAN"
)


def eval_gram_hashes(spark: SparkSession, sf_dir: str) -> set[int]:
    """The static eval-set dictionary: distinct 60-bit hashes of the eval
    slice's word n-grams, built ONCE with the batch operator's own
    shingling so stream and batch agree definitionally."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % EVAL_MOD == 0
    )
    grams = word_ngram_rows(docs, NGRAM_N).select(
        md5_long(F.col("gram")).alias("gh")
    )
    return {r.gh for r in grams.distinct().collect()}


def _gram_hashes_py(text: str) -> set[int]:
    """Python twin of word_ngram_rows + md5_long for one document."""
    w = text.split(" ")
    out = set()
    for i in range(len(w) - NGRAM_N + 1):
        gram = " ".join(w[i : i + NGRAM_N])
        out.add(int(hashlib.md5(gram.encode()).hexdigest()[:15], 16))
    return out


def streaming_decontaminate(docs: DataFrame, eval_hashes) -> DataFrame:
    """Score a document stream against a broadcast eval dictionary.

    `eval_hashes` is a `sparkContext.broadcast(set_of_hashes)` handle (or
    a plain set in tests): one copy per executor, shared by every batch.
    Output mode append; one row per scoreable non-eval document."""

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ev = eval_hashes.value if hasattr(eval_hashes, "value") else eval_hashes
        for pdf in batches:
            rows = {
                "doc_id": [],
                "n_ngrams": [],
                "n_hits": [],
                "contamination_frac": [],
                "is_contaminated": [],
            }
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if int(doc_id) % EVAL_MOD == 0:
                    continue
                grams = _gram_hashes_py(text)
                if not grams:
                    continue
                hits = sum(1 for g in grams if g in ev)
                frac = hits / len(grams)
                rows["doc_id"].append(int(doc_id))
                rows["n_ngrams"].append(len(grams))
                rows["n_hits"].append(hits)
                # HALF_UP like Spark's round() -- Python's round() is
                # half-even and diverges on 7th-decimal .5 boundaries
                # (e.g. 1/128 = 0.0078125)
                rows["contamination_frac"].append(
                    math.floor(frac * 1_000_000 + 0.5) / 1_000_000
                )
                rows["is_contaminated"].append(frac >= CONTAM_FRAC)
            yield pd.DataFrame(rows)

    return docs.select("doc_id", "text").mapInPandas(score, OUTPUT_SCHEMA)
