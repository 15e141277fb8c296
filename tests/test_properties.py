"""Property-based invariants for the validate/enrich/route core
(SURVEY.md §5 item 4): for ANY input row mix, every row lands in exactly
one branch, enrichment matches the reference formula, and the pipeline is
deterministic."""

import decimal
import math

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from streamprocessing_with_kafka_spark.operators.route import route
from streamprocessing_with_kafka_spark.operators.validate import (
    REQUIRED_FIELDS,
    validate_and_enrich,
)

RAW_SCHEMA = StructType([StructField(f, StringType()) for f in REQUIRED_FIELDS])

number_like = st.one_of(
    st.integers(-1000, 1000).map(str),
    st.floats(
        min_value=-1e4, max_value=1e4, allow_nan=False, allow_infinity=False
    ).map(lambda v: f"{v:.4f}"),
    st.sampled_from(["abc", "", "1e3", "  7 ", "NaN", "-0"]),
)
date_like = st.one_of(
    st.dates().map(lambda d: d.isoformat()),
    st.integers(0, 40000).map(str),  # epoch days
    st.sampled_from(["not-a-date", "2024-13-45", ""]),
)
order = st.fixed_dictionaries(
    {
        "order_id": st.one_of(st.none(), st.integers(0, 10**6).map(str)),
        "product_name": st.one_of(st.none(), st.text(max_size=20)),
        "quantity": st.one_of(st.none(), number_like),
        "price": st.one_of(st.none(), number_like),
        "order_date": st.one_of(st.none(), date_like),
    }
)


def _run(spark, rows):
    df = spark.createDataFrame(
        [tuple(r[f] for f in REQUIRED_FIELDS) for r in rows], RAW_SCHEMA
    )
    return route(validate_and_enrich(df)).collect()


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(order, min_size=1, max_size=12))
def test_pipeline_invariants(spark, rows):
    out = _run(spark, rows)

    # conservation: every input row exits exactly once, in exactly one branch
    assert len(out) == len(rows)
    assert all(r["target"] in ("enriched_orders", "invalid_orders") for r in out)

    for r in out:
        if r["is_valid"]:
            assert r["target"] == "enriched_orders"
            # reference formula: total_price = round(q * p, 2). NB 'NaN'
            # parses as a float in BOTH the reference (float('NaN')) and
            # try_cast, and NaN < 0 is false -- so NaN rows are "valid",
            # faithfully mirroring order_validator.py:146-163.
            assert r["quantity"] is not None and r["price"] is not None
            if math.isnan(r["quantity"]) or math.isnan(r["price"]):
                assert math.isnan(r["total_price"])
            else:
                assert r["quantity"] >= 0 and r["price"] >= 0
                # Spark's round() is HALF_UP on the shortest decimal repr
                # of the double (BigDecimal.valueOf), matching the DuckDB
                # oracle. Python's round() is banker's on the binary value
                # and disagrees on exact .xx5 products (e.g. 3 * 1.375),
                # so the expectation must model HALF_UP explicitly.
                expect = float(
                    decimal.Decimal(repr(r["quantity"] * r["price"])).quantize(
                        decimal.Decimal("0.01"), rounding=decimal.ROUND_HALF_UP
                    )
                )
                assert math.isclose(
                    r["total_price"], expect, rel_tol=0, abs_tol=1e-9
                )
            assert r["status_message"] == "Validated and enriched successfully"
        else:
            assert r["target"] == "invalid_orders"
            assert r["total_price"] is None
            assert r["status_message"]  # non-empty reject reason
        # T9: the kafka key is never null
        assert r["kafka_key"] is not None

    # determinism: identical input -> identical output (string-canonical
    # comparison: NaN != NaN would fail a plain Row equality)
    again = _run(spark, rows)
    canon = lambda rs: sorted(tuple(str(v) for v in r) for r in rs)
    assert canon(out) == canon(again)


# ---------------------- round-3 primitive properties (pure Python, fast)


@settings(deadline=None)  # first call pays the module import
@given(st.text(min_size=1, max_size=40), st.integers(6, 20))
def test_bloom_positions_properties(fp, log2_bits):
    """k positions: in range, deterministic, and the double-hashing step
    is odd (full period) so positions are not all identical."""
    from streamprocessing_with_kafka_spark.streaming.bloom_dedup import (
        BLOOM_K,
        bloom_positions,
    )

    n_bits = 1 << log2_bits
    pos = bloom_positions(fp, n_bits)
    assert len(pos) == BLOOM_K
    assert all(0 <= p < n_bits for p in pos)
    assert pos == bloom_positions(fp, n_bits)


@given(
    st.lists(
        st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
        min_size=4,
        max_size=64,
    )
)
def test_int8_quantizer_reference_properties(vec):
    """The floor(x*127/scale + 0.5) formula: codes in [-127, 127] and
    per-component reconstruction error <= scale/127 (half a step each
    way, plus the scale floor for all-zero vectors)."""
    scale = max(max(abs(x) for x in vec), 1e-30)
    codes = [math.floor(x * 127 / scale + 0.5) for x in vec]
    assert all(-127 <= c <= 127 for c in codes)
    for x, c in zip(vec, codes):
        assert abs(c * scale / 127 - x) <= scale / 127 + 1e-12


# ---------------------------------------------------------------------------
# Water-filling: the closed-form allocator must agree with the textbook
# iterative cap-and-redistribute algorithm for ANY corpus shape.
# ---------------------------------------------------------------------------


def _iterative_waterfill(avail: dict, budget: float) -> dict:
    """Reference implementation: repeatedly allocate the remaining budget
    proportionally over uncapped sources, cap overshoots, redistribute."""
    w = {s: 1.0 / len(avail) for s in avail}
    alloc = {}
    remaining, active = budget, set(avail)
    while active:
        tot_w = sum(w[s] for s in active)
        share = {s: remaining * w[s] / tot_w for s in active}
        over = {s for s in active if share[s] >= avail[s] - 1e-9}
        if not over:
            alloc.update(share)
            break
        for s in over:
            alloc[s] = float(avail[s])
            remaining -= avail[s]
            active.discard(s)
    return alloc


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    counts=st.lists(st.integers(1, 400), min_size=2, max_size=8),
)
def test_waterfill_matches_iterative_reference(spark, counts):
    import streamprocessing_with_kafka_spark.operators.sampling as smp

    docs = spark.createDataFrame(
        [
            (i, " ".join(["w"] * n), f"s{i}")
            for i, n in enumerate(counts)
        ],
        "doc_id long, text string, source string",
    )
    orig = smp.load_table
    try:
        smp.load_table = lambda s, d, t: docs
        rows = smp.budget_waterfill(spark, "x").collect()
    finally:
        smp.load_table = orig

    avail = {f"s{i}": n for i, n in enumerate(counts)}
    budget = smp.WATERFILL_BUDGET_FRAC * sum(counts)
    expect = _iterative_waterfill(avail, budget)
    assert {r.source for r in rows} == set(avail)
    for r in rows:
        assert abs(r.alloc_tokens - expect[r.source]) < 0.02, (
            r.source, r.alloc_tokens, expect[r.source], counts,
        )
    assert abs(sum(r.alloc_tokens for r in rows) - budget) < 0.02 * len(counts)


# ---------------------------------------------------------------------------
# EWMA: the batch window expression and the streaming per-row arithmetic
# must be BIT-identical for any value sequence (the convergence contract).
# ---------------------------------------------------------------------------


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=20,
    )
)
def test_ewma_batch_equals_streaming_arithmetic(spark, vals):
    from streamprocessing_with_kafka_spark.operators.timeseries import (
        EWMA_LAGS,
        ewma_frame,
    )
    from streamprocessing_with_kafka_spark.streaming.ewma import _ewma_row

    ev = spark.createDataFrame(
        [
            (1, i, f"2024-06-01 00:{i // 60:02d}:{i % 60:02d}", v)
            for i, v in enumerate(vals)
        ],
        "user_id long, event_id long, ts string, value double",
    ).selectExpr("user_id", "event_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
    got = {r.event_id: r.ewma for r in ewma_frame(ev).collect()}
    for i in range(len(vals)):
        window = vals[max(0, i - EWMA_LAGS + 1) : i + 1]
        assert got[i] == _ewma_row(window), (i, vals)


# ---------------------------------------------------------------------------
# Histogram: for ANY value distribution (including all-equal -> width 0)
# the bins must partition the corpus exactly and keep a complete spine.
# ---------------------------------------------------------------------------


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.floats(
            min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=30,
    ),
    constant=st.booleans(),
)
def test_histogram_partitions_any_distribution(spark, vals, constant):
    import streamprocessing_with_kafka_spark.operators.windows as wmod

    if constant:
        vals = [vals[0]] * len(vals)  # exercise the width == 0 guard
    ev = spark.createDataFrame(
        [
            (i, "2024-01-01 00:00:00", 1, "t", v, "{}")
            for i, v in enumerate(vals)
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type",
        "value", "props",
    )
    orig = wmod.load_table
    try:
        wmod.load_table = lambda s, d, t: ev
        rows = wmod.value_histogram(spark, "x").collect()
    finally:
        wmod.load_table = orig
    assert len(rows) == wmod.HIST_BINS
    assert sorted(r.bin for r in rows) == list(range(wmod.HIST_BINS))
    assert sum(r.n_events for r in rows) == len(vals)
    if constant:
        by_bin = {r.bin: r.n_events for r in rows}
        assert by_bin[0] == len(vals)  # width-0 guard routes all to bin 0


# ---------------------------------------------------------------------------
# Triangles: ANY random co-occurrence layout must match the brute-force
# Python count (edges from shared cells, triangles by set algebra).
# ---------------------------------------------------------------------------


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    cells=st.lists(
        st.tuples(
            st.integers(0, 3),  # cell id -> (type, hour)
            st.lists(st.integers(1, 8), min_size=1, max_size=5, unique=True),
        ),
        min_size=1,
        max_size=6,
    )
)
def test_triangles_match_bruteforce(spark, cells):
    import itertools

    import streamprocessing_with_kafka_spark.operators.graph as gmod

    rows, eid = [], 0
    for cell_id, users in cells:
        for u in users:
            rows.append(
                (eid, f"2024-01-01 {cell_id:02d}:30:00", u, "click", 1.0, "{}")
            )
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type",
        "value", "props",
    )
    orig = gmod.load_table
    try:
        gmod.load_table = lambda s, d, t: ev
        got = {r.user_id: r for r in gmod.triangle_clustering(spark, "x").collect()}
    finally:
        gmod.load_table = orig
    # users generated for the same cell id land in the SAME (type, hour)
    # cell -- union them before pairing, as the operator's distinct does
    merged: dict = {}
    for cell_id, users in cells:
        merged.setdefault(cell_id, set()).update(users)
    edges = set()
    for users in merged.values():
        for a, b in itertools.combinations(sorted(users), 2):
            edges.add((a, b))
    nodes = {u for e in edges for u in e}
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    tri = {n: 0 for n in nodes}
    for a, b, c in itertools.combinations(sorted(nodes), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    assert set(got) == nodes
    for n in nodes:
        assert got[n].degree == len(adj[n]), n
        assert got[n].n_triangles == tri[n], n


# ---------------------------------------------------------------------------
# Holt: the truncated matrix-power weighted sums must match the Python
# recomputation (same literal accumulation order) for ANY value sequence.
# ---------------------------------------------------------------------------


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=12,
        max_size=24,
    )
)
def test_holt_matches_python_recompute(spark, vals):
    import streamprocessing_with_kafka_spark.operators.timeseries as tmod

    ev = spark.createDataFrame(
        [(t, t, 1, "t", v, "{}") for t, v in enumerate(vals)],
        "event_id long, hours long, user_id long, event_type string, value double, props string",
    ).selectExpr(
        "event_id",
        "CAST('2024-01-01 00:00:00' AS TIMESTAMP) + make_interval(0,0,0,0,CAST(hours AS INT),0,0) AS ts",
        "user_id", "event_type", "value", "props",
    )
    orig = tmod.load_table
    try:
        tmod.load_table = lambda s, d, t: ev
        rows = sorted(
            tmod.holt_forecast(spark, "x").collect(), key=lambda r: r.bucket
        )
    finally:
        tmod.load_table = orig
    ys = [round(v, 6) for v in vals]
    K = tmod.HOLT_LAGS
    for t, r in enumerate(rows):
        if t < K - 1:
            assert r.level is None and r.trend is None
            continue
        level = 0.0
        trend = 0.0
        for j, (wl, wb) in enumerate(tmod._HOLT_WEIGHTS):
            level = level + ys[t - j] * wl
            trend = trend + ys[t - j] * wb
        assert math.isclose(r.level, level, rel_tol=1e-9, abs_tol=2e-6), t
        assert math.isclose(r.trend, trend, rel_tol=1e-9, abs_tol=2e-6), t


# ---------------- interval sweep family: fuzz vs brute force ----------------

_DAY_US_ = 86_400_000_000

interval = st.tuples(
    st.integers(0, 4 * 86_400),  # start second within a 4-day span
    st.integers(1, 3 * 86_400),  # duration seconds (may cross days)
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ivs=st.lists(interval, min_size=1, max_size=14))
def test_interval_stab_matches_bruteforce(spark, ivs):
    """For ANY interval set (random starts/durations, day-crossing,
    same-instant ties, nested), every probe's open-count equals the
    quadratic definition: # intervals with s <= p < e."""
    from streamprocessing_with_kafka_spark.operators.windows import (
        interval_stab_counts,
    )

    base = 1_700_000_000 * 1_000_000  # fixed epoch anchor
    rows = [
        (i, base + s * 1_000_000, base + (s + d) * 1_000_000)
        for i, (s, d) in enumerate(ivs)
    ]
    df = spark.createDataFrame(rows, "iid long, s_us long, e_us long")
    got = {r.iid: r.n_open for r in interval_stab_counts(df).collect()}
    for iid, s, _ in rows:
        expect = sum(1 for (_, s2, e2) in rows if s2 <= s < e2)
        assert got[iid] == expect, (iid, rows)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ivs=st.lists(interval, min_size=1, max_size=12))
def test_daily_peaks_match_bruteforce(spark, ivs):
    """Per-day peak concurrency equals a brute-force sweep over every
    boundary instant of that day (half-open intervals)."""
    from streamprocessing_with_kafka_spark.operators.windows import (
        daily_interval_peaks,
    )

    base = 1_700_000_000 * 1_000_000
    base -= base % _DAY_US_  # align to a day boundary for readability
    rows = [
        (base + s * 1_000_000, base + (s + d) * 1_000_000)
        for (s, d) in ivs
    ]
    df = spark.createDataFrame(rows, "s_us long, e_us long")
    got = {
        int((r.day.timestamp() * 1_000_000 - base) // _DAY_US_): r.peak_concurrency
        for r in daily_interval_peaks(df).collect()
    }
    # brute force: for each day an interval overlaps, evaluate the open
    # count at every boundary instant clamped into that day
    days = sorted(
        {d for (s, e) in rows for d in range((s - base) // _DAY_US_,
                                             (e - 1 - base) // _DAY_US_ + 1)}
    )
    for day in days:
        lo, hi = base + day * _DAY_US_, base + (day + 1) * _DAY_US_
        probes = {lo} | {
            p for (s, e) in rows for p in (s, e) if lo <= p < hi
        }
        peak = max(
            sum(1 for (s, e) in rows if s <= p < e) for p in probes
        )
        assert got[day] == peak, (day, rows)
