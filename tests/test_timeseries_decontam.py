"""Invariant tests for the gap-fill/LOCF time-series operator and the
benchmark-decontamination operator (exact values are covered by the
oracle-parity suite; these assert the semantic properties that make the
operators *correct by construction* at any scale).
"""

import datetime as dt

from pyspark.sql import functions as F

from streamprocessing_with_kafka_spark.operators.decontaminate import (
    EVAL_MOD,
    decontaminate,
)
from streamprocessing_with_kafka_spark.operators.windows import (
    gapfill_user_hourly,
    value_percentiles,
)


def test_gapfill_spine_is_dense_and_locf_total(spark, sf_dir):
    rows = gapfill_user_hourly(spark, sf_dir).orderBy("user_id", "bucket").collect()
    assert rows
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    hour = dt.timedelta(hours=1)
    for series in by_user.values():
        # dense spine: consecutive buckets exactly one hour apart
        for a, b in zip(series, series[1:]):
            assert b.bucket - a.bucket == hour, (a, b)
        # the spine starts at an observation, so LOCF is total
        assert not series[0].is_gap
        for r in series:
            assert r.filled_value is not None
            if not r.is_gap:
                assert r.filled_value == r.observed_value
            else:
                assert r.observed_value is None


def test_gapfill_carries_last_observation(spark, sf_dir):
    rows = gapfill_user_hourly(spark, sf_dir).orderBy("user_id", "bucket").collect()
    last = {}
    for r in rows:
        if not r.is_gap:
            last[r.user_id] = r.observed_value
        assert r.filled_value == last[r.user_id]


def test_decontaminate_scores_only_training_docs(spark, sf_dir):
    rows = decontaminate(spark, sf_dir).collect()
    assert rows
    flagged = 0
    for r in rows:
        assert r.doc_id % EVAL_MOD != 0  # eval slice never scored
        assert 0 < r.n_ngrams
        assert 0 <= r.n_hits <= r.n_ngrams
        assert 0.0 <= r.contamination_frac <= 1.0
        flagged += bool(r.is_contaminated)
        if r.is_contaminated:
            assert r.n_hits > 0
    # the fixture corpus contains near-dup pairs that straddle the split,
    # so contamination must actually fire
    assert flagged > 0


def test_percentiles_are_monotone(spark, sf_dir):
    for r in value_percentiles(spark, sf_dir).collect():
        assert r.p25 <= r.p50 <= r.p75 <= r.p99
        assert r.n_events > 0
