"""Invariant tests for the SCD2 fold, the two-phase heavy hitters, and the
rollup cascade -- properties the oracle hash cannot express (supersets,
interval tiling, rewrite-equivalence against the naive plan)."""

from collections import defaultdict

from pyspark.sql import functions as F

from streamprocessing_with_kafka_spark.operators.history import (
    customer_priority_scd2,
    scd2_versions,
)
from streamprocessing_with_kafka_spark.operators.text import (
    HH_PHI,
    _tokens,
    token_heavy_hitters,
)
from streamprocessing_with_kafka_spark.operators.windows import (
    rollup_cascade_daily,
    user_interarrival,
)
from streamprocessing_with_kafka_spark.functions.numeric import dec_sum
from streamprocessing_with_kafka_spark.sources.tables import load_table


def test_scd2_intervals_tile(spark, sf_dir):
    rows = customer_priority_scd2(spark, sf_dir).collect()
    by_key = defaultdict(list)
    for r in rows:
        by_key[r.o_custkey].append(r)
    assert by_key
    for key, versions in by_key.items():
        versions.sort(key=lambda r: r.version)
        # versions are 1..n consecutive
        assert [r.version for r in versions] == list(range(1, len(versions) + 1))
        # exactly one open (is_current) version, and it is the last
        currents = [r for r in versions if r.is_current]
        assert len(currents) == 1 and currents[0].version == len(versions)
        for prev, nxt in zip(versions, versions[1:]):
            # half-open tiling: each version closes exactly where the next opens
            assert prev.valid_to == nxt.valid_from
            assert prev.valid_from <= prev.valid_to
            # a version only exists when the attribute actually changed
            assert prev.o_orderpriority != nxt.o_orderpriority
        assert versions[-1].valid_to is None


def test_scd2_versions_match_observation_changes(spark, sf_dir):
    """Replaying the raw observations per key must yield the same version
    sequence the operator emitted."""
    o = load_table(spark, sf_dir, "orders")
    obs = o.select("o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority").collect()
    seq = defaultdict(list)
    for r in sorted(obs, key=lambda r: (r.o_custkey, r.o_orderdate, r.o_orderkey)):
        s = seq[r.o_custkey]
        if not s or s[-1] != r.o_orderpriority:
            s.append(r.o_orderpriority)
    got = defaultdict(list)
    for r in customer_priority_scd2(spark, sf_dir).collect():
        got[r.o_custkey].append((r.version, r.o_orderpriority))
    assert set(got) == set(seq)
    for key, versions in got.items():
        assert [p for _, p in sorted(versions)] == seq[key]


def test_scd2_null_transitions_open_versions(spark):
    """The generic fold is null-safe: value->NULL and NULL->value both open
    versions, and a key whose FIRST observation is NULL still gets one."""
    obs = spark.createDataFrame(
        [
            # key 1: A -> NULL -> NULL (fold) -> B
            (1, 1, 1, "A"),
            (1, 2, 2, None),
            (1, 3, 3, None),
            (1, 4, 4, "B"),
            # key 2: starts NULL, then a value
            (2, 1, 5, None),
            (2, 2, 6, "C"),
        ],
        "k int, ts int, tb int, attr string",
    )
    out = scd2_versions(obs, key="k", attr="attr", ts="ts", tiebreak="tb")
    by_key = defaultdict(list)
    for r in sorted(out.collect(), key=lambda r: (r.k, r.version)):
        by_key[r.k].append((r.version, r.attr, r.is_current))
    assert by_key[1] == [(1, "A", False), (2, None, False), (3, "B", True)]
    assert by_key[2] == [(1, None, False), (2, "C", True)]


def test_heavy_hitters_match_naive_plan(spark, sf_dir):
    """The candidates-then-recount rewrite must be answer-invisible vs the
    naive full groupBy at the same threshold."""
    import math

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(_tokens()).alias("token"))
    total = toks.count()
    threshold = max(1, math.ceil(HH_PHI * total))
    naive = {
        (r.token, r.n)
        for r in toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= threshold)
        .collect()
    }
    two_phase = {(r.token, r.n) for r in token_heavy_hitters(spark, sf_dir).collect()}
    assert naive and two_phase == naive


def test_rollup_cascade_matches_direct_daily(spark, sf_dir):
    """Folding hourly partials into days must be bit-identical to a direct
    daily aggregate over raw events (mergeability)."""
    ev = load_table(spark, sf_dir, "events")
    direct = {
        (r.day, r.event_type): (r.n_events, r.total_value)
        for r in ev.groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"), dec_sum("value").alias("total_value"))
        .collect()
    }
    cascaded = {
        (r.day, r.event_type): (r.n_events, r.total_value)
        for r in rollup_cascade_daily(spark, sf_dir).collect()
    }
    assert cascaded == direct


def test_interarrival_gap_bounds(spark, sf_dir):
    rows = user_interarrival(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.min_gap_s <= r.avg_gap_s <= r.max_gap_s
        assert r.min_gap_s >= 0 and r.n_gaps >= 1
