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


# -------------------------- property-based gap-fill (hypothesis) ----------

from decimal import Decimal  # noqa: E402

from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

from streamprocessing_with_kafka_spark.streaming.gapfill import _dec  # noqa: E402

from pyspark.sql.types import (  # noqa: E402
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

EV_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)

event = st.tuples(
    st.integers(0, 2),  # few users so series overlap
    st.datetimes(
        min_value=dt.datetime(2024, 1, 1), max_value=dt.datetime(2024, 1, 4)
    ),
    st.floats(min_value=-100, max_value=100, allow_nan=False, allow_infinity=False),
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(event, min_size=1, max_size=40))
def test_gapfill_matches_model(spark, rows):
    from streamprocessing_with_kafka_spark.operators.windows import gapfill_hourly

    out = gapfill_hourly(spark.createDataFrame(rows, EV_SCHEMA)).collect()

    # model: exact decimal hourly sums per (user, hour-bucket)
    buckets = {}
    for u, ts, v in rows:
        b = ts.replace(minute=0, second=0, microsecond=0)
        buckets.setdefault(u, {}).setdefault(b, Decimal(0))
        buckets[u][b] += _dec(v)

    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    assert set(by_user) == set(buckets)
    hour = dt.timedelta(hours=1)
    for u, series in by_user.items():
        series.sort(key=lambda r: r.bucket)
        want = buckets[u]
        assert series[0].bucket == min(want)
        assert series[-1].bucket == max(want)
        last = None
        for prev, r in zip([None] + series, series):
            if prev is not None:
                assert r.bucket - prev.bucket == hour
            if r.bucket in want:
                assert not r.is_gap
                assert r.observed_value == float(want[r.bucket])
                last = r.observed_value
            else:
                assert r.is_gap and r.observed_value is None
            assert r.filled_value == last


def test_decontaminate_counts_known_overlaps(spark):
    """Hand-built corpus with exactly computable 5-gram overlaps: doc 0
    is the eval doc; doc 8 shares a 6-token span (two of its four
    5-grams), doc 9 shares nothing, doc 10 is a verbatim copy (fully
    contaminated), doc 11 is too short to produce any 5-gram."""
    from streamprocessing_with_kafka_spark.operators.decontaminate import (
        decontaminate_docs,
    )

    eval_text = "alpha beta gamma delta epsilon zeta eta"  # 7 tokens
    docs = spark.createDataFrame(
        [
            (0, eval_text),  # eval slice (0 % 7 == 0)
            # 8 tokens -> 4 5-grams; the first two cover the shared span
            # "beta gamma delta epsilon zeta eta" (6 tokens -> 2 5-grams)
            (8, "beta gamma delta epsilon zeta eta theta iota"),
            (9, "one two three four five six"),  # 2 5-grams, no overlap
            (10, eval_text),  # verbatim eval copy
            (11, "too short now"),  # < 5 tokens -> excluded entirely
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in decontaminate_docs(docs).collect()}
    assert set(rows) == {8, 9, 10}  # eval doc and short doc never scored
    assert (rows[8].n_ngrams, rows[8].n_hits) == (4, 2)
    assert rows[8].contamination_frac == 0.5 and rows[8].is_contaminated
    assert (rows[9].n_ngrams, rows[9].n_hits) == (2, 0)
    assert not rows[9].is_contaminated
    assert (rows[10].n_ngrams, rows[10].n_hits) == (3, 3)
    assert rows[10].contamination_frac == 1.0 and rows[10].is_contaminated


def test_attribution_consistent_with_flag(spark, sf_dir):
    """Every attributed (train, eval) pair implies the train doc has hits
    in the flag-level scorer, and containment is a valid (0, 1] fraction
    of the eval doc's gram count."""
    from streamprocessing_with_kafka_spark.operators.decontaminate import (
        decontaminate,
        decontaminate_attribution,
    )

    attr = decontaminate_attribution(spark, sf_dir).collect()
    assert attr, "probe showed attributed pairs exist in the fixture"
    hits = {r.doc_id: r.n_hits for r in decontaminate(spark, sf_dir).collect()}
    for r in attr:
        assert 0 < r.containment <= 1.0
        assert 0 < r.shared_ngrams <= r.eval_ngrams
        assert hits.get(r.doc_id, 0) >= r.shared_ngrams


def test_decontaminate_fuzzy_semantics(spark):
    """Fuzzy decontamination over a synthetic shingle frame: an exact
    shingle-set copy of an eval doc MUST be flagged with jaccard 1 (equal
    sets -> equal signatures -> every band collides, a deterministic
    guarantee, not a probabilistic one); a disjoint doc must not pair with
    anything; every returned pair respects the train/eval split and its
    jaccard matches the brute-force set computation."""
    from streamprocessing_with_kafka_spark.operators.decontaminate import (
        FUZZY_THRESHOLD,
        decontaminate_fuzzy_from_shingles,
    )

    sets = {
        0: set(range(100, 120)),  # eval (0 % 7 == 0)
        2: set(range(100, 120)),  # train, exact copy of eval doc 0
        3: set(range(1000, 1020)),  # train, disjoint from everything
        4: set(range(100, 115)) | set(range(2000, 2005)),  # train, j=0.6
    }
    rows = [
        (doc, h, len(hs)) for doc, hs in sets.items() for h in sorted(hs)
    ]
    sh = spark.createDataFrame(rows, "doc_id long, _h long, n long")
    got = {
        (r.doc_id, r.eval_doc_id): r.jaccard
        for r in decontaminate_fuzzy_from_shingles(sh).collect()
    }

    assert got.get((2, 0)) == 1.0  # identical sets: guaranteed caught
    assert not any(3 in pair for pair in got)  # disjoint never pairs
    for (train, ev), j in got.items():
        assert train % 7 != 0 and ev % 7 == 0
        inter = len(sets[train] & sets[ev])
        union = len(sets[train] | sets[ev])
        assert j == round(inter / union, 6)
        assert j >= FUZZY_THRESHOLD
