"""Invariants for the round-3 curation additions the oracle hash cannot
express: classifier probability semantics, shuffle-shard permutation
properties, and domain-mix share/weight arithmetic."""

from pyspark.sql import functions as F

from streamprocessing_with_kafka_spark.operators.sampling import (
    N_SHARDS,
    domain_mix,
    shuffle_shard,
)
from streamprocessing_with_kafka_spark.operators.text import (
    QC_KEEP_PROB,
    quality_classifier,
)
from streamprocessing_with_kafka_spark.sources.tables import load_table


def test_quality_classifier_is_a_probability(spark, sf_dir):
    rows = quality_classifier(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.quality_prob < 1.0, r
        assert r.keep == (r.quality_prob >= QC_KEEP_PROB), r


def test_quality_classifier_deterministic(spark, sf_dir):
    a = sorted(map(tuple, quality_classifier(spark, sf_dir).collect()))
    b = sorted(map(tuple, quality_classifier(spark, sf_dir).collect()))
    assert a == b


def test_shuffle_shard_is_a_partitioned_permutation(spark, sf_dir):
    """Every doc appears exactly once; positions are dense 1..n_s within
    each shard; shard ids cover [0, N_SHARDS)."""
    rows = shuffle_shard(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    by_shard = {}
    for r in rows:
        assert 0 <= r.shard < N_SHARDS
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard


def test_shuffle_shard_not_id_ordered(spark, sf_dir):
    """The within-shard order must be a real shuffle, not doc_id order."""
    rows = shuffle_shard(spark, sf_dir).collect()
    shard0 = sorted((r.pos, r.doc_id) for r in rows if r.shard == 0)
    doc_ids = [d for _, d in shard0]
    assert doc_ids != sorted(doc_ids), "shard order degenerated to doc_id order"


def test_domain_mix_shares_and_weights(spark, sf_dir):
    rows = domain_mix(spark, sf_dir).collect()
    assert rows
    total_share = sum(r.token_share for r in rows)
    assert abs(total_share - 1.0) < 1e-4
    for r in rows:
        assert r.rebalance_weight > 0
        # weight * share == target (uniform) up to rounding
        assert abs(r.rebalance_weight * r.token_share - 1.0 / len(rows)) < 1e-4


def test_temperature_sample_rates_flatten_token_shares(spark, sf_dir):
    """keep_rate must be ANTITONE in the source's token share (share^(1/T-1)
    with T>1 decreases in share): the biggest source gets the smallest
    rate, the smallest source anchors at exactly 1.0."""
    from pyspark.sql import functions as F2

    from streamprocessing_with_kafka_spark.operators.sampling import (
        temperature_sample,
    )

    d = load_table(spark, sf_dir, "documents")
    tokens = {
        r.source: r.n
        for r in d.groupBy("source")
        .agg(F2.sum(F2.size(F2.split("text", " "))).alias("n"))
        .collect()
    }
    rows = temperature_sample(spark, sf_dir).collect()
    rates = {r.source: r.keep_rate for r in rows}
    assert max(rates.values()) == 1.0
    assert min(rates, key=rates.get) == max(tokens, key=tokens.get)
    assert max(rates, key=rates.get) == min(tokens, key=tokens.get)
    by_share = sorted(rates, key=tokens.get)
    assert [rates[s] for s in by_share] == sorted(rates.values(), reverse=True)
    for r in rows:
        assert 0.0 < r.keep_rate <= 1.0


def test_dsir_tilts_toward_target_vocabulary(spark):
    """DSIR semantics on a constructed corpus: target docs use vocabulary
    A; raw docs either share vocabulary A (target-like) or use a disjoint
    vocabulary B. Every target-like raw doc must out-score every B doc on
    avg_logratio (the importance weight orders by target likeness), the
    target slice itself is excluded from the output, and keep
    probabilities are valid probabilities."""
    from streamprocessing_with_kafka_spark.operators.sampling import (
        DSIR_TARGET_SOURCE,
        dsir_sample_frame,
    )

    va = "alpha beta gamma delta epsilon"
    vb = "zeta eta theta iota kappa"
    rows = []
    for i in range(10):  # target slice: vocabulary A
        rows.append((i, DSIR_TARGET_SOURCE, va))
    for i in range(10, 20):  # raw, target-like
        rows.append((i, "web", va))
    for i in range(20, 30):  # raw, off-target
        rows.append((i, "web", vb))
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.doc_id: r for r in dsir_sample_frame(d).collect()}

    assert set(out) == set(range(10, 30))  # target docs excluded
    like = [out[i].avg_logratio for i in range(10, 20)]
    off = [out[i].avg_logratio for i in range(20, 30)]
    assert min(like) > max(off)
    for r in out.values():
        assert 0.0 <= r.keep_prob <= 1.0
        assert r.is_kept in (True, False)
