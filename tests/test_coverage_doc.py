"""COVERAGE.md is the judge-facing operator inventory: every registered
query must appear in it (and every backtick-quoted query name in it must
exist), so the document cannot silently drift from the registry."""

import re

from streamprocessing_with_kafka_spark.plans.registry import registry


def _documented_names() -> set[str]:
    text = open("COVERAGE.md").read()
    return set(re.findall(r"`([a-z0-9_]+)`", text))


def test_every_registry_entry_is_documented():
    missing = sorted(set(registry()) - _documented_names())
    assert not missing, f"registry entries absent from COVERAGE.md: {missing}"


def test_documented_queries_exist():
    reg = set(registry())
    # backticked names that LOOK like query names (share a registered
    # family prefix) must all resolve; other backticks are file paths etc.
    prefixes = tuple(
        {n.split("_", 1)[0] + "_" for n in reg}
    )
    ghost = sorted(
        n
        for n in _documented_names()
        if n.startswith(prefixes) and "." not in n and n not in reg
        and any(c == "_" for c in n)
    )
    # allow documented non-query identifiers (modules, helpers)
    ghost = [g for g in ghost if not g.endswith(("_py", "_md"))]
    known_helpers = {
        "agg_order_dist",  # shorthand in prose
        "date_add",  # Spark function named in prose, not a query
        "orders_audit_frame",  # shared batch/streaming helper, not a query
    }
    ghost = [g for g in ghost if g not in known_helpers]
    assert not ghost, f"COVERAGE.md references unknown queries: {ghost}"


def test_driver_correctness_window_matches_budget():
    """The driver hash-checks only the FIRST 50 registered queries; since
    r3 the budget is the explicit CORRECTNESS_WINDOW list. Pin that
    registry() actually honors it, that the reference-parity block heads
    it every round, and that this round's fix rows are inside."""
    from streamprocessing_with_kafka_spark.plans.registry import (
        CORRECTNESS_WINDOW,
    )

    window = list(registry())[:50]
    assert window == CORRECTNESS_WINDOW
    # every round: the full 12-row parity block heads the rotation
    assert window[0] == "flagship_pipeline"
    assert {"route_invalid", "crud_upsert", "sql_enriched_orders"} <= set(
        window[:12]
    )
    for name in (
        # r12 window (OPTIMIZATION round, re-pinned over the planned
        # backlog rotation -- OPTIMIZATION_r12.md "Round governance"):
        # slots 13-48 take the ~36 queries whose operator code this
        # round restructured (a REAL code change outranks conf-closure
        # age for a slot, by the guard's own standard); 49-50 the two
        # oldest backlog greens. The guard is the exhaustive check;
        # spot-pin heads, middles, and the tail here.
        "text_decontaminate",  # head of the restructured block (slot 13)
        "dedup_minhash_lsh",  # honest-recompute localCheckpoint switch
        "dedup_ngram_jaccard",  # same
        "ann_topk_bruteforce",  # embeddings fan-out family
        "ann_topk_pq",  # same family, census-heaviest member
        "graph_triangles",  # wedge-join parallelism pin
        "join_interval_stab",  # sweep parallelism pin
        "basket_part_pairs",  # basket aggregate pin
        "join_market_share",  # lineitem rebalance opt-out
        "quality_benford",  # oldest backlog green (slot 49)
        "profile_key_skew",  # oldest backlog green (slot 50)
    ):
        assert name in window, name


def test_every_query_driver_checked_at_least_once():
    """Union coverage across rounds (VERDICT r2 'Next round #2'): every
    registered query must appear in a past round's CORRECTNESS_r*.json OR
    in the current window -- so a newly added query cannot dodge the
    driver's hash check by registering past position 50."""
    import glob
    import json

    from streamprocessing_with_kafka_spark.plans.registry import PENDING_WINDOW

    checked: set[str] = set(list(registry())[:50])
    for path in glob.glob("CORRECTNESS_r*.json"):
        checked.update(json.load(open(path)))
    # queries added after the round's window was finalized are covered by
    # the local parity suite now and MUST rotate into the next window --
    # the explicit PENDING_WINDOW list is the only escape hatch
    checked.update(PENDING_WINDOW)
    # rows-only queries (sql=None) are window-INELIGIBLE by the r1/r4
    # no_oracle rule (test_window_invariants pins it): a window slot for
    # one is a red row by construction. Their correctness lives in local
    # tests (e.g. mm_phash_index via the genuine-BMP phash_pairs pins).
    reg = registry()
    rows_only = {n for n, q in reg.items() if q.sql is None}
    never = sorted(set(reg) - checked - rows_only)
    assert not never, f"queries never driver-checked in any round: {never}"
