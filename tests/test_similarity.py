"""Similarity / embedding near-dup invariants the oracle hash cannot
express: precision and recall of the banded-LSH near-dup path against the
brute-force baseline, and the plan-shape guarantee that the all-pairs
theta join is gone."""

import re

from pyspark.sql import functions as F

from streamprocessing_with_kafka_spark.operators.similarity import (
    cosine_pairs,
    embedding_near_dup_lsh,
)

THRESHOLD = 0.4


def _plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )


def test_near_dup_lsh_precision_is_exact(spark, sf_dir):
    """Every returned pair must appear in the brute-force answer with the
    IDENTICAL exact cosine: banding may lose pairs, never invent or
    mis-score them."""
    brute = {
        (r.vec_a, r.vec_b): r.cosine
        for r in cosine_pairs(spark, sf_dir)
        .filter(F.col("cosine") >= THRESHOLD)
        .collect()
    }
    lsh = {
        (r.vec_a, r.vec_b): r.cosine
        for r in embedding_near_dup_lsh(spark, sf_dir, THRESHOLD).collect()
    }
    assert lsh, "LSH near-dup returned nothing"
    for pair, cos in lsh.items():
        assert pair in brute and brute[pair] == cos, pair


def test_near_dup_lsh_recall_bound(spark, sf_dir):
    """Deterministic md5 planes + fixed test data => recall is a constant;
    pin it above the analytic expectation for this threshold band
    (p_bit ~ 0.65 at cosine 0.45 -> ~0.79 with 8 bands x 4 bits)."""
    brute = {
        (r.vec_a, r.vec_b)
        for r in cosine_pairs(spark, sf_dir)
        .filter(F.col("cosine") >= THRESHOLD)
        .collect()
    }
    lsh = {
        (r.vec_a, r.vec_b)
        for r in embedding_near_dup_lsh(spark, sf_dir, THRESHOLD).collect()
    }
    assert brute, "no near-dup pairs in fixture"
    recall = len(lsh & brute) / len(brute)
    assert recall >= 0.7, f"recall {recall:.3f} ({len(lsh & brute)}/{len(brute)})"


def test_near_dup_plan_has_no_theta_self_join(spark, sf_dir):
    """The candidate join must be an equi-join (hash-partitioned or
    broadcast HASH join) -- a BroadcastNestedLoopJoin / CartesianProduct
    here is the O(N^2) scale-killer this operator exists to avoid."""
    plan = _plan(spark, embedding_near_dup_lsh(spark, sf_dir, THRESHOLD))
    assert not re.search(r"BroadcastNestedLoopJoin|CartesianProduct", plan), plan
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan), plan
