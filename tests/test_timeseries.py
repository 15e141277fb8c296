"""Semantic invariants for the time-series operators and the waterfill
planner that the oracle hash-match cannot express: EWMA convexity and
truncation bounds, Markov row-stochasticity, the MAD fence's robustness,
containment vs Jaccard asymmetry, and water-filling budget exhaustion."""

import math

from pyspark.sql import Window, functions as F

from streamprocessing_with_kafka_spark.operators.dedup import containment_pairs
from streamprocessing_with_kafka_spark.operators.sampling import (
    WATERFILL_BUDGET_FRAC,
    budget_waterfill,
)
from streamprocessing_with_kafka_spark.operators.timeseries import (
    EWMA_ALPHA,
    EWMA_LAGS,
    ewma_user_value,
    mad_outlier_summary,
    markov_transitions,
)


def test_ewma_is_convex_and_tracks_recursive_form(spark, sf_dir):
    rows = ewma_user_value(spark, sf_dir).collect()
    assert rows
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user_rows in by_user.values():
        user_rows.sort(key=lambda r: (r.ts, r.event_id))
        vals = [r.value for r in user_rows]
        for i, r in enumerate(user_rows):
            window = vals[max(0, i - EWMA_LAGS + 1) : i + 1]
            # convex combination of the window it was computed from
            assert min(window) - 1e-6 <= r.ewma <= max(window) + 1e-6
            assert r.n_hist == len(window)
            # matches the truncated-EWMA definition recomputed in python
            ws = [EWMA_ALPHA * (1 - EWMA_ALPHA) ** k for k in range(len(window))]
            expect = sum(w * x for w, x in zip(ws, reversed(window))) / sum(ws)
            assert math.isclose(r.ewma, round(expect, 6), rel_tol=0, abs_tol=2e-6)


def test_markov_rows_are_stochastic(spark, sf_dir):
    rows = markov_transitions(spark, sf_dir).collect()
    assert rows
    by_prev: dict = {}
    for r in rows:
        assert r.transitions > 0
        by_prev.setdefault(r.prev_type, []).append(r.prob)
    for probs in by_prev.values():
        assert math.isclose(sum(probs), 1.0, abs_tol=1e-4)


def test_mad_fence_flags_planted_outlier_only(spark):
    base = [(i, "t", 10.0 + (i % 5) * 0.1) for i in range(50)]
    planted = [(99, "t", 1e6)]
    ev = spark.createDataFrame(
        [(eid, "2024-01-01 00:00:00", 1, t, v, "{}") for (eid, t, v) in base + planted],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    import streamprocessing_with_kafka_spark.operators.timeseries as ts_mod

    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med"), F.count(F.lit(1)).alias("n_events")
    )
    # exercise the full operator via a monkeypatched loader-free path:
    # rebuild the same pipeline on the in-memory frame
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "abs_dev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(abs_dev, 0.5)").alias("mad")
    )
    row = dev.join(F.broadcast(mad), "event_type").filter(
        F.col("abs_dev") > ts_mod.MAD_K * F.col("mad")
    ).collect()
    # mean/stddev would be dragged by the 1e6 outlier; MAD flags only it
    assert {r.event_id for r in row} == {99}


def test_mad_summary_counts_match_manual_fence(spark, sf_dir):
    import duckdb

    out = {r.event_type: r for r in mad_outlier_summary(spark, sf_dir).collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    manual = dict(
        con.sql(
            """
            WITH med AS (SELECT event_type, quantile_cont(value, .5) m FROM events GROUP BY 1),
            dev AS (SELECT e.event_type, abs(value - m) d FROM events e JOIN med USING (event_type)),
            mad AS (SELECT event_type, quantile_cont(d, .5) md FROM dev GROUP BY 1)
            SELECT d.event_type, count(*) FILTER (d > 3.0 * md) FROM dev d JOIN mad USING (event_type) GROUP BY 1
            """
        ).fetchall()
    )
    con.close()
    assert {t: r.n_outliers for t, r in out.items()} == manual


def test_containment_catches_subset_dup_jaccard_misses(spark):
    small = "alpha beta gamma delta epsilon zeta"
    big = small + " " + " ".join(f"w{i}" for i in range(200))
    docs = spark.createDataFrame(
        [(1, small), (2, big)], "doc_id long, text string"
    )
    import streamprocessing_with_kafka_spark.operators.dedup as dd

    sh = (
        dd.word_ngram_rows(docs, dd.SHINGLE_N, alias="shingle")
        .select("doc_id", dd.md5_long(F.col("shingle")).alias("_h"))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("doc_id")))
    )
    a, b = sh.alias("a"), sh.alias("b")
    pair = (
        a.join(b, (F.col("a._h") == F.col("b._h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id"), F.col("b.doc_id"))
        .agg(F.count(F.lit(1)).alias("inter"), F.first("a.n").alias("na"), F.first("b.n").alias("nb"))
        .collect()
    )
    assert len(pair) == 1
    inter, na, nb = pair[0].inter, pair[0].na, pair[0].nb
    jac = inter / (na + nb - inter)
    cont = inter / min(na, nb)
    # the small doc is fully embedded: containment ~= 1, jaccard tiny
    assert cont >= 0.9
    assert jac < 0.1


def test_containment_pairs_runs_and_scores_in_unit_interval(spark, sf_dir):
    rows = containment_pairs(spark, sf_dir, threshold=0.0).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.containment <= 1.0
        assert r.doc_a < r.doc_b
        assert r.na > 0 and r.nb > 0


def test_waterfill_exhausts_budget_and_respects_caps(spark, sf_dir):
    rows = budget_waterfill(spark, sf_dir).collect()
    assert rows
    total_avail = sum(r.avail for r in rows)
    budget = WATERFILL_BUDGET_FRAC * total_avail
    allocated = sum(r.alloc_tokens for r in rows)
    # exactly exhausts the budget (closed form, no iteration residue)
    assert math.isclose(allocated, budget, rel_tol=1e-6)
    levels = []
    for r in rows:
        assert r.alloc_tokens <= r.avail + 1e-6  # never over-allocates
        assert 0.0 < r.fill_ratio <= 1.0 + 1e-9
        if r.capped:
            assert math.isclose(r.alloc_tokens, r.avail, rel_tol=1e-9)
        else:
            levels.append(r.alloc_tokens / r.weight)
    # all uncapped sources sit at ONE water level (2dp alloc rounding
    # re-inflated by 1/w bounds the spread)
    if levels:
        assert max(levels) - min(levels) <= 0.01 / min(r.weight for r in rows) + 1e-6


def test_autocorr_matches_python_recompute(spark, sf_dir):
    import duckdb

    from streamprocessing_with_kafka_spark.operators.timeseries import (
        autocorr_hourly,
    )

    got = {r.event_type: r for r in autocorr_hourly(spark, sf_dir).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    series = {}
    for t, b, x in con.sql(
        "SELECT event_type, date_trunc('hour', ts), sum(value) FROM events GROUP BY 1,2 ORDER BY 1,2"
    ).fetchall():
        series.setdefault(t, []).append(x)
    con.close()
    for t, xs in series.items():
        n = len(xs)
        mu = sum(xs) / n
        den = sum((x - mu) ** 2 for x in xs)
        assert got[t].n_buckets == n
        for k in (1, 2, 3):
            rk = getattr(got[t], f"r{k}")
            assert -1.0 <= rk <= 1.0
            expect = sum((xs[i] - mu) * (xs[i - k] - mu) for i in range(k, n)) / den
            assert abs(rk - expect) < 1e-4, (t, k, rk, expect)


def test_cusum_matches_textbook_recursion(spark, sf_dir):
    """The windowed closed form must equal Page's sequential recursion
    c_t = max(0, c_{t-1} + d_t) recomputed in python, and a planted level
    shift must alarm."""
    import duckdb

    from streamprocessing_with_kafka_spark.operators.timeseries import (
        CUSUM_H,
        CUSUM_K,
        cusum_changepoints,
    )

    got = {}
    for r in cusum_changepoints(spark, sf_dir).collect():
        got.setdefault(r.event_type, []).append(r)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    series = {}
    for t, b, x in con.sql(
        "SELECT event_type, date_trunc('hour', ts), sum(value) FROM events GROUP BY 1,2 ORDER BY 1,2"
    ).fetchall():
        series.setdefault(t, []).append(x)
    con.close()
    for t, xs in series.items():
        n = len(xs)
        mu = sum(xs) / n
        var = sum(x * x for x in xs) / n - mu * mu
        sigma = max(var, 0.0) ** 0.5
        k, h = CUSUM_K * sigma, CUSUM_H * sigma
        rows = sorted(got[t], key=lambda r: r.bucket)
        cu = cd = 0.0
        assert len(rows) == n
        for x, r in zip(xs, rows):
            cu = max(0.0, cu + (x - mu - k))
            cd = max(0.0, cd + (mu - x - k))
            assert abs(r.cusum_up - cu) < 1e-3, (t, r.bucket, r.cusum_up, cu)
            assert abs(r.cusum_dn - cd) < 1e-3, (t, r.bucket, r.cusum_dn, cd)
            assert r.is_alarm == (r.cusum_up > round(h, 6) or r.cusum_dn > round(h, 6))


def test_cusum_alarms_on_planted_level_shift(spark):
    """A clean mean shift of ~4 sigma must raise the upward alarm after
    the shift and never before it."""
    from streamprocessing_with_kafka_spark.operators import timeseries as ts_mod

    rows = []
    eid = 0
    for hour in range(48):
        level = 10.0 if hour < 36 else 14.0  # shift at hour 36
        for _ in range(4):
            rows.append(
                (eid, f"2024-01-{1 + hour // 24:02d} {hour % 24:02d}:10:00", 1,
                 "shifted", level + (eid % 3) * 0.2, "{}")
            )
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type", "value", "props")

    import streamprocessing_with_kafka_spark.sources.tables as tables

    orig = tables.load_table
    try:
        tables_load = lambda spark_, sf_, name: ev  # noqa: E731
        ts_mod.load_table = tables_load
        out = sorted(
            ts_mod.cusum_changepoints(spark, "ignored").collect(),
            key=lambda r: r.bucket,
        )
    finally:
        ts_mod.load_table = orig
    pre = [r for r in out if r.bucket.day == 1 and r.bucket.hour < 12]
    post = [r for r in out if (r.bucket.day - 1) * 24 + r.bucket.hour >= 40]
    assert not any(r.is_alarm for r in pre)
    assert all(r.is_alarm for r in post)


def test_attribution_credits_only_within_window(spark):
    """A purchase right after a click attributes; one with no click or a
    stale click does not; clicks AFTER the purchase never count."""
    import streamprocessing_with_kafka_spark.operators.timeseries as ts_mod

    rows = [
        # user 1: click then purchase 1h later -> attributed
        (1, "2024-03-01 00:00:00", 1, "click", 0.0),
        (2, "2024-03-01 01:00:00", 1, "purchase", 10.0),
        # user 2: purchase with NO prior click -> not attributed
        (3, "2024-03-01 01:00:00", 2, "purchase", 20.0),
        # user 2: click only AFTER the purchase -> still not attributed
        (4, "2024-03-01 02:00:00", 2, "click", 0.0),
        # user 3: click 30h before purchase -> stale, not attributed
        (5, "2024-03-01 00:00:00", 3, "click", 0.0),
        (6, "2024-03-02 06:00:00", 3, "purchase", 40.0),
    ]
    ev = spark.createDataFrame(
        [(e, t, u, ty, v, "{}") for (e, t, u, ty, v) in rows],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type",
        "value", "props"
    )
    orig = ts_mod.load_table
    try:
        ts_mod.load_table = lambda s, d, n: ev
        out = {r.day.isoformat(): r for r in ts_mod.attribution_last_touch(spark, "x").collect()}
    finally:
        ts_mod.load_table = orig
    d1, d2 = out["2024-03-01"], out["2024-03-02"]
    assert (d1.purchases, d1.attributed, d1.attributed_value) == (2, 1, 10.0)
    assert (d2.purchases, d2.attributed) == (1, 0)
    assert d2.attributed_value is None


def test_type_overlap_on_planted_partial_audience(spark):
    """Fixture with KNOWN partial overlaps (the sf tables are degenerate
    here: every user does every type): 4 users -- two do {a,b}, one does
    {a}, one does {b,c}. Checks pair counts, jaccard, and lift."""
    import streamprocessing_with_kafka_spark.operators.timeseries as ts_mod

    rows = []
    eid = 0
    for u, types in [(1, "ab"), (2, "ab"), (3, "a"), (4, "bc")]:
        for t in types:
            rows.append((eid, "2024-04-01 00:00:00", u, t, 1.0, "{}"))
            eid += 1
            # duplicate event of the same type must not inflate the sets
            rows.append((eid, "2024-04-01 01:00:00", u, t, 1.0, "{}"))
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type",
        "value", "props"
    )
    orig = ts_mod.load_table
    try:
        ts_mod.load_table = lambda s, d, n: ev
        out = {(r.type_a, r.type_b): r for r in ts_mod.type_overlap(spark, "x").collect()}
    finally:
        ts_mod.load_table = orig
    assert set(out) == {("a", "b"), ("b", "c")}  # no (a,c) pair exists
    ab = out[("a", "b")]
    assert (ab.users_a, ab.users_b, ab.users_both) == (3, 3, 2)
    assert ab.jaccard == 0.5  # 2 / (3 + 3 - 2)
    assert ab.lift == round(2 * 4 / (3 * 3), 6)
    bc = out[("b", "c")]
    assert (bc.users_a, bc.users_b, bc.users_both) == (3, 1, 1)


def test_health_report_rows_match_constituents(spark, sf_dir):
    """The composed health row must equal its constituent operators
    joined -- drift here means the glue broke, not the constituents."""
    from streamprocessing_with_kafka_spark.operators.timeseries import (
        autocorr_hourly,
        cusum_changepoints,
        events_health_report,
        mad_outlier_summary,
    )

    got = {r.event_type: r for r in events_health_report(spark, sf_dir).collect()}
    mad = {r.event_type: r for r in mad_outlier_summary(spark, sf_dir).collect()}
    acf = {r.event_type: r for r in autocorr_hourly(spark, sf_dir).collect()}
    alarms: dict = {}
    for r in cusum_changepoints(spark, sf_dir).collect():
        a = alarms.setdefault(r.event_type, [0, None])
        if r.is_alarm:
            a[0] += 1
            a[1] = r.bucket if a[1] is None else max(a[1], r.bucket)
    assert got.keys() == mad.keys() == acf.keys() == alarms.keys()
    for t, g in got.items():
        assert (g.n_events, g.med, g.mad, g.n_outliers) == (
            mad[t].n_events, mad[t].med, mad[t].mad, mad[t].n_outliers
        )
        assert (g.n_buckets, g.r1) == (acf[t].n_buckets, acf[t].r1)
        assert (g.cusum_alarms, g.last_alarm) == tuple(alarms[t])


def test_holt_tracks_planted_linear_trend(spark, tmp_path):
    """On y_t = 10 + 2t (exact integers, hourly buckets) the truncated
    Holt state must (a) equal the Python recomputation of the SAME
    truncated weighted sums exactly (one 6dp rounding apart), (b) sit
    near the true slope 2 and level y_t, and (c) agree with the full
    textbook recursion to within the documented |lambda|^K init decay."""
    from streamprocessing_with_kafka_spark.operators.timeseries import (
        HOLT_ALPHA,
        HOLT_BETA,
        HOLT_HORIZON,
        HOLT_LAGS,
        _HOLT_WEIGHTS,
        holt_forecast,
    )

    n = 40
    ys = [10.0 + 2.0 * t for t in range(n)]
    ev = spark.createDataFrame(
        [
            (t, f"2024-01-01 00:00:00", 1, "t", ys[t], "{}")
            for t in range(n)
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn(
        "ts",
        F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_interval(hours=F.col("event_id")),
    )
    d = str(tmp_path / "sf")
    ev.write.parquet(d + "/events.parquet")
    rows = sorted(holt_forecast(spark, d).collect(), key=lambda r: r.bucket)
    assert len(rows) == n
    # rows before full history are NULL
    for r in rows[: HOLT_LAGS - 1]:
        assert r.level is None and r.trend is None and r.forecast is None
    for t in range(HOLT_LAGS - 1, n):
        level = sum(ys[t - j] * wl for j, (wl, _) in enumerate(_HOLT_WEIGHTS))
        trend = sum(ys[t - j] * wb for j, (_, wb) in enumerate(_HOLT_WEIGHTS))
        r = rows[t]
        assert math.isclose(r.level, round(level, 6), abs_tol=2e-6)
        assert math.isclose(r.trend, round(trend, 6), abs_tol=2e-6)
        assert math.isclose(
            r.forecast, round(level + HOLT_HORIZON * trend, 6), abs_tol=5e-6
        )
        # near the generating process (truncation + warm-up tolerance)
        assert abs(r.trend - 2.0) < 0.35, (t, r.trend)
        assert abs(r.level - ys[t]) < 2.5, (t, r.level)
    # full textbook recursion (l0=y0, b0=y1-y0) agrees within init decay
    a, b = HOLT_ALPHA, HOLT_BETA
    l, tr = ys[0], ys[1] - ys[0]
    rec = {}
    for t in range(1, n):
        l_new = a * ys[t] + (1 - a) * (l + tr)
        tr = b * (l_new - l) + (1 - b) * tr
        l = l_new
        rec[t] = (l, tr)
    for t in range(HOLT_LAGS - 1, n):
        assert abs(rows[t].level - rec[t][0]) < 0.6
        assert abs(rows[t].trend - rec[t][1]) < 0.6


def test_cep_pattern_semantics_on_planted_sequences(spark, tmp_path):
    """A->B within T matches; A->C->B is killed by the intervening
    error; a stale A does not match; B with no A does not match; an
    error BEFORE the click does not kill the match."""
    from streamprocessing_with_kafka_spark.operators.timeseries import (
        cep_click_purchase,
    )

    rows = [
        # user 1: clean click -> purchase (5 min) => MATCH
        (10, "2024-01-01 10:00:00", 1, "click"),
        (11, "2024-01-01 10:05:00", 1, "purchase"),
        # user 2: click -> error -> purchase => NO match
        (20, "2024-01-01 10:00:00", 2, "click"),
        (21, "2024-01-01 10:02:00", 2, "error"),
        (22, "2024-01-01 10:05:00", 2, "purchase"),
        # user 3: click 31 min before purchase => NO match (stale)
        (30, "2024-01-01 10:00:00", 3, "click"),
        (31, "2024-01-01 10:31:00", 3, "purchase"),
        # user 4: purchase with no click => NO match
        (40, "2024-01-01 10:00:00", 4, "purchase"),
        # user 5: error BEFORE the click does not invalidate => MATCH
        (50, "2024-01-01 09:50:00", 5, "error"),
        (51, "2024-01-01 10:00:00", 5, "click"),
        (52, "2024-01-01 10:10:00", 5, "purchase"),
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        [(e, ts, u, t, 1.0, "{}") for (e, ts, u, t) in rows],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type",
        "value", "props",
    ).write.parquet(d + "/events.parquet")
    got = {r.purchase_event_id: r for r in cep_click_purchase(spark, d).collect()}
    assert set(got) == {11, 52}
    assert got[11].gap_us == 5 * 60 * 1_000_000
    assert got[52].gap_us == 10 * 60 * 1_000_000


def test_chi2_matches_python_recompute_and_detects_dependence(spark, tmp_path):
    """Planted dependent table (type a only at hour 0, type b only at
    hour 1) must produce the textbook chi2 = N for a 2x2 extreme; and
    the statistic must equal an independent Python recompute."""
    from streamprocessing_with_kafka_spark.operators.timeseries import (
        chi2_type_hour,
    )

    rows = []
    eid = 0
    for _ in range(30):
        rows.append((eid, "2024-01-01 00:15:00", 1, "a", 1.0, "{}")); eid += 1
    for _ in range(20):
        rows.append((eid, "2024-01-01 01:15:00", 1, "b", 1.0, "{}")); eid += 1
    d = str(tmp_path / "chi")
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type",
        "value", "props",
    ).write.parquet(d + "/events.parquet")
    out = {r.event_type: r for r in chi2_type_hour(spark, d).collect()}
    # perfectly dependent 2x2 -> chi2 == N, dof == 1
    assert out["a"].dof == 1
    assert abs(out["a"].chi2_total - 50.0) < 1e-6
    assert out["a"].chi2_total == out["b"].chi2_total
    # python recompute of the contributions
    n, ra, rb, c0, c1 = 50, 30, 20, 30, 20
    exp = {("a", 0): ra * c0 / n, ("a", 1): ra * c1 / n,
           ("b", 0): rb * c0 / n, ("b", 1): rb * c1 / n}
    obs = {("a", 0): 30, ("a", 1): 0, ("b", 0): 0, ("b", 1): 20}
    contrib_a = sum((obs[k] - exp[k]) ** 2 / exp[k] for k in exp if k[0] == "a")
    assert abs(out["a"].chi2_contrib - round(contrib_a, 6)) < 1e-9
    assert out["a"].n_events == 30 and out["b"].n_events == 20


def test_session_concurrency_planted_intervals(spark, tmp_path):
    """Known session overlap: three sessions overlapping at 10:29 give
    peak 3; a session starting EXACTLY when another ends is not
    concurrent with it (half-open); a session crossing midnight is
    active-but-not-started on day 2."""
    from streamprocessing_with_kafka_spark.operators.windows import (
        session_concurrency,
    )

    rows = [
        (1, "2024-01-01 10:00:00", 1),  # session [10:00, 10:30)
        (2, "2024-01-01 10:10:00", 2),  # [10:10, 10:40)
        (3, "2024-01-01 10:29:00", 3),  # [10:29, 10:59) -> 3 overlap here
        (4, "2024-01-01 10:30:00", 5),  # [10:30, 11:00): u1 just ended
        (5, "2024-01-01 23:50:00", 4),  # [23:50, 00:20 next day)
    ]
    d = str(tmp_path / "conc")
    spark.createDataFrame(
        [(e, ts, u, "click", 1.0, "{}") for (e, ts, u) in rows],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type",
        "value", "props",
    ).write.parquet(d + "/events.parquet")
    out = {str(r.day): r for r in session_concurrency(spark, d).collect()}
    assert len(out) == 2
    d1 = out["2024-01-01 00:00:00"]
    assert (d1.peak_concurrency, d1.n_active_sessions, d1.n_sessions_started) == (3, 5, 5)
    d2 = out["2024-01-02 00:00:00"]
    assert (d2.peak_concurrency, d2.n_active_sessions, d2.n_sessions_started) == (1, 1, 0)


def test_seasonality_indices_on_planted_grid(spark, tmp_path):
    """Hand-computed seasonal indices; 2024-01-01 is a Monday and must
    land in dow bucket 0 under the integer epoch-day formula."""
    from streamprocessing_with_kafka_spark.operators.timeseries import (
        seasonality_profile,
    )

    rows = [
        (1, "2024-01-01 09:00:00", 10.0),  # Monday hr 9
        (2, "2024-01-01 09:30:00", 10.0),
        (3, "2024-01-01 18:00:00", 40.0),  # Monday hr 18
        (4, "2024-01-02 09:00:00", 20.0),  # Tuesday hr 9
    ]
    d = str(tmp_path / "seas")
    spark.createDataFrame(
        [(e, ts, 1, "x", v, "{}") for (e, ts, v) in rows],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type",
        "value", "props",
    ).write.parquet(d + "/events.parquet")
    out = {(r.dow, r.hr): r for r in seasonality_profile(spark, d).collect()}
    assert set(out) == {(0, 9), (0, 18), (1, 9)}
    # type mean = 80/4 = 20
    assert out[(0, 9)].cell_mean == 10.0
    assert out[(0, 9)].hour_index == round((40 / 3) / 20, 6)  # hr-9 band
    assert out[(0, 18)].hour_index == 2.0
    assert out[(0, 9)].dow_index == 1.0  # Monday mean 20 == type mean
    assert out[(1, 9)].dow_index == 1.0


def test_rolling_wau_hand_computed(spark, tmp_path):
    """Planted activity: WAU(d) = distinct users active in [d-6, d],
    report days clipped to the observed range."""
    from streamprocessing_with_kafka_spark.operators.windows import rolling_wau

    acts = [(1, "2024-01-01"), (2, "2024-01-01"), (3, "2024-01-03"), (2, "2024-01-09")]
    d = str(tmp_path / "wau")
    spark.createDataFrame(
        [(i, f"{day} 12:00:00", u, "click", 1.0, "{}") for i, (u, day) in enumerate(acts)],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type",
        "value", "props",
    ).write.parquet(d + "/events.parquet")
    out = {r.report_day.day: r.wau for r in rolling_wau(spark, d).collect()}
    assert out == {1: 2, 2: 2, 3: 3, 4: 3, 5: 3, 6: 3, 7: 3, 8: 1, 9: 2}


def test_orders_backlog_planted_lifecycles(spark, tmp_path):
    """Three orders with known open intervals; an order shipping at the
    day-D midnight instant is NOT open during day D (half-open)."""
    from streamprocessing_with_kafka_spark.operators.windows import orders_backlog

    d = str(tmp_path / "bk")
    orders = [(1, "2024-01-01"), (2, "2024-01-02"), (3, "2024-01-01")]
    ships = [(1, "2024-01-04"), (2, "2024-01-03"), (3, "2024-01-02")]
    spark.createDataFrame(
        [(o, 1, "O", 10.0, ts) for (o, ts) in orders],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, ts string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "CAST(ts AS TIMESTAMP) AS o_orderdate", "'1-URGENT' AS o_orderpriority",
    ).write.parquet(d + "/orders.parquet")
    spark.createDataFrame(
        [(o, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", ts) for (o, ts) in ships],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, ts string",
    ).selectExpr(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "CAST(ts AS TIMESTAMP) AS l_shipdate",
    ).write.parquet(d + "/lineitem.parquet")
    out = {r.day.day: r for r in orders_backlog(spark, d).collect()}
    assert set(out) == {1, 2, 3}
    assert (out[1].peak_concurrency, out[1].n_active_sessions, out[1].n_sessions_started) == (2, 2, 2)
    assert (out[2].peak_concurrency, out[2].n_active_sessions, out[2].n_sessions_started) == (2, 2, 1)
    assert (out[3].peak_concurrency, out[3].n_active_sessions, out[3].n_sessions_started) == (1, 1, 0)


def test_user_streaks_gaps_islands_and_tiebreak(spark, tmp_path):
    """User 1: days 1-3, 5-6, 10 -> longest 3 starting day 1.
    User 2: two 2-day streaks -> tie resolves to the EARLIEST start."""
    from streamprocessing_with_kafka_spark.operators.timeseries import (
        user_streaks,
    )

    days_u1 = ["01", "02", "03", "05", "06", "10"]
    days_u2 = ["01", "02", "05", "06"]
    rows = [(i, f"2024-01-{d} 09:00:00", 1) for i, d in enumerate(days_u1)]
    rows += [
        (100 + i, f"2024-01-{d} 09:00:00", 2) for i, d in enumerate(days_u2)
    ]
    d = str(tmp_path / "streaks")
    spark.createDataFrame(
        [(eid, ts, u, "click", 1.0, "{}") for (eid, ts, u) in rows],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(
        d + "/events.parquet"
    )
    got = {r.user_id: r for r in user_streaks(spark, d).collect()}
    u1, u2 = got[1], got[2]
    assert (u1.n_active_days, u1.n_streaks, u1.longest_streak) == (6, 3, 3)
    assert str(u1.longest_start)[:10] == "2024-01-01"
    assert (u2.n_active_days, u2.n_streaks, u2.longest_streak) == (4, 2, 2)
    assert str(u2.longest_start)[:10] == "2024-01-01"


def test_interval_stab_half_open_and_same_instant(spark, tmp_path):
    """A [1,4), B [2,3), C [2,5), D [3,6): starts at the same instant
    see each other (B and C), an interval is NOT open at its end
    (B invisible to D), and the probe never counts itself."""
    from streamprocessing_with_kafka_spark.operators.windows import (
        orders_open_at_start,
    )

    d = str(tmp_path / "stab")
    orders = [(1, "2024-01-01"), (2, "2024-01-02"), (3, "2024-01-02"), (4, "2024-01-03")]
    ships = [(1, "2024-01-04"), (2, "2024-01-03"), (3, "2024-01-05"), (4, "2024-01-06")]
    spark.createDataFrame(
        [(o, 1, "O", 10.0, ts) for (o, ts) in orders],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, ts string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "CAST(ts AS TIMESTAMP) AS o_orderdate", "'1-URGENT' AS o_orderpriority",
    ).write.parquet(d + "/orders.parquet")
    spark.createDataFrame(
        [(o, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", ts) for (o, ts) in ships],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, ts string",
    ).selectExpr(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "CAST(ts AS TIMESTAMP) AS l_shipdate",
    ).write.parquet(d + "/lineitem.parquet")
    got = {
        r.o_orderkey: r.n_open_at_start
        for r in orders_open_at_start(spark, d).collect()
    }
    assert got == {1: 0, 2: 2, 3: 2, 4: 2}


def test_nearest_join_directions_and_tiebreak(spark, tmp_path):
    """Views at 10:00 and 10:10: purchase 10:04 -> before(10:00),
    10:05 -> equidistant tie goes to the EARLIER view, 10:10 ->
    0-gap 'before' on the same-instant view, 09:00 -> 'after';
    a user with no views emits nothing."""
    from streamprocessing_with_kafka_spark.operators.joins import (
        nearest_join_events,
    )

    rows = [
        (1, "2024-01-01 10:00:00", 1, "view"),
        (2, "2024-01-01 10:10:00", 1, "view"),
        (3, "2024-01-01 10:04:00", 1, "purchase"),
        (4, "2024-01-01 10:05:00", 1, "purchase"),
        (5, "2024-01-01 10:10:00", 1, "purchase"),
        (6, "2024-01-01 09:00:00", 1, "purchase"),
        (7, "2024-01-01 12:00:00", 2, "purchase"),
    ]
    d = str(tmp_path / "nearest")
    spark.createDataFrame(
        [(eid, ts, u, t, 1.0, "{}") for (eid, ts, u, t) in rows],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(
        d + "/events.parquet"
    )
    got = {r.event_id: r for r in nearest_join_events(spark, d).collect()}
    assert set(got) == {3, 4, 5, 6}
    assert (str(got[3].nearest_view_ts)[11:16], got[3].direction) == ("10:00", "before")
    assert (str(got[4].nearest_view_ts)[11:16], got[4].direction) == ("10:00", "before")
    assert got[4].gap_us == 300 * 1_000_000
    assert (got[5].gap_us, got[5].direction) == (0, "before")
    assert (str(got[6].nearest_view_ts)[11:16], got[6].direction) == ("10:00", "after")


def test_sax_words_shape_and_motif(spark, tmp_path):
    """A rising 24-hour ramp gives a monotone word; a second day with
    the identical shape yields the SAME word (the motif property)."""
    import math

    from streamprocessing_with_kafka_spark.operators.timeseries import (
        SAX_BREAKS,
        SAX_SEG_HOURS,
        sax_daily_words,
    )

    vals = [float(h) for h in range(24)]
    rows = []
    eid = 0
    for day in ("2024-01-01", "2024-01-02"):
        for h, v in enumerate(vals):
            rows.append((eid, f"{day} {h:02d}:30:00", 1, "t", v))
            eid += 1
    d = str(tmp_path / "sax")
    spark.createDataFrame(
        [(e, ts, u, t, v, "{}") for (e, ts, u, t, v) in rows],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(
        d + "/events.parquet"
    )
    got = {str(r.day)[:10]: r for r in sax_daily_words(spark, d).collect()}
    assert got["2024-01-01"].sax_word == got["2024-01-02"].sax_word
    word = got["2024-01-01"].sax_word
    assert len(word) == 24 // SAX_SEG_HOURS
    assert list(word) == sorted(word)  # rising ramp -> monotone letters
    # replicate the operator's arithmetic exactly
    xs = vals * 2
    n = float(len(xs))
    sx, sxx = sum(xs), sum(x * x for x in xs)
    mean, std = sx / n, math.sqrt((sxx - sx * sx / n) / n)
    expected = ""
    for s0 in range(0, 24, SAX_SEG_HOURS):
        paa = sum(vals[s0 : s0 + SAX_SEG_HOURS]) / SAX_SEG_HOURS
        z = (paa - mean) / std
        expected += (
            "a" if z < SAX_BREAKS[0] else
            "b" if z < SAX_BREAKS[1] else
            "c" if z < SAX_BREAKS[2] else "d"
        )
    assert word == expected
    assert got["2024-01-01"].n_hours == 24


def test_rolling_time_window_range_vs_rows(spark, tmp_path):
    """Bursty fixture where 'last 30 minutes' != 'last N rows': events
    at 00, 10, 20, 29, 31 minutes -- the 31' event's trailing window
    holds 10/20/29/31 (the 00' event ages out; boundary INCLUSIVE at
    exactly -30')."""
    from streamprocessing_with_kafka_spark.operators.windows import (
        rolling_time_window,
    )

    mins = [0, 10, 20, 29, 31, 40]
    rows = [(i, f"2024-01-01 10:{m:02d}:00", 1, "t", 1.0) for i, m in enumerate(mins)]
    d = str(tmp_path / "rtw")
    spark.createDataFrame(
        [(e, ts, u, t, v, "{}") for (e, ts, u, t, v) in rows],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(
        d + "/events.parquet"
    )
    got = {r.event_id: r.n_events_30m for r in rolling_time_window(spark, d).collect()}
    assert got[0] == 1          # 00'
    assert got[3] == 4          # 29': 00,10,20,29
    assert got[4] == 4          # 31': 10,20,29,31 (00 aged out)
    # 40': 40 - 30 = 10 -> the 10' event sits exactly on the boundary
    # and IS included (inclusive frame): {10,20,29,31,40} = 5
    assert got[5] == 5


def test_seasonal_anomaly_flags_outlier_week_only(spark, tmp_path):
    """12 Mondays at 10:00 with value 10, one with 1000: only that
    bucket flags (same-hour-of-week profile, outlier-inclusive std)."""
    from datetime import date, timedelta

    from streamprocessing_with_kafka_spark.operators.timeseries import (
        seasonal_anomaly,
    )

    d0 = date(2024, 1, 1)  # a Monday
    rows = []
    for k in range(12):
        day = d0 + timedelta(weeks=k)
        rows.append((k, f"{day} 10:00:00", 1, "t", 1000.0 if k == 6 else 10.0))
    d = str(tmp_path / "seas")
    spark.createDataFrame(
        [(e, ts, u, t, v, "{}") for (e, ts, u, t, v) in rows],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(
        d + "/events.parquet"
    )
    got = {str(r.bucket)[:10]: r for r in seasonal_anomaly(spark, d).collect()}
    outlier_day = str(d0 + timedelta(weeks=6))
    assert got[outlier_day].is_anomaly is True
    assert got[outlier_day].z > 3
    for day, r in got.items():
        if day != outlier_day:
            assert r.is_anomaly is False


def test_funnel_timing_boundaries(spark, tmp_path):
    """Converted = first purchase AT-OR-AFTER first view; purchases
    before the first view don't count; non-viewers aren't in the
    denominator; gap percentiles interpolate over converters only."""
    from streamprocessing_with_kafka_spark.operators.timeseries import (
        funnel_timing,
    )

    t0 = "2024-01-01 10:00:"
    rows = [
        (1, t0 + "00", 1, "view"), (2, t0 + "10", 1, "purchase"),
        (3, t0 + "00", 2, "view"),
        (4, t0 + "20", 3, "view"), (5, t0 + "10", 3, "purchase"),
        (6, t0 + "00", 4, "view"), (7, t0 + "30", 4, "purchase"),
        (8, t0 + "05", 4, "purchase"),
        (9, t0 + "00", 5, "purchase"),
    ]
    d = str(tmp_path / "ft")
    spark.createDataFrame(
        [(e, ts, u, t, 1.0, "{}") for (e, ts, u, t) in rows],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(
        d + "/events.parquet"
    )
    r = funnel_timing(spark, d).collect()[0]
    assert r.n_viewers == 4          # users 1-4; user 5 never viewed
    assert r.n_converted == 2        # user 1 (+10s) and user 4 (+5s)
    assert r.conversion_rate == 0.5
    assert r.p50_seconds == 7.5      # interpolated between 5 and 10
    assert r.p95_seconds == 9.75


def test_markov_entropy_deterministic_chain_is_zero(spark, tmp_path):
    """Strictly alternating click/view: every transition is certain ->
    per-state conditional entropy 0, entropy rate 0, while the
    MARGINAL next-type entropy is ln 2 (the gap = what knowing the
    previous event buys)."""
    import math

    from streamprocessing_with_kafka_spark.operators.timeseries import (
        markov_entropy,
    )

    rows = []
    for i in range(10):
        t = "click" if i % 2 == 0 else "view"
        rows.append((i, f"2024-01-01 10:{i:02d}:00", 1, t))
    d = str(tmp_path / "me")
    spark.createDataFrame(
        [(e, ts, u, t, 1.0, "{}") for (e, ts, u, t) in rows],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(
        d + "/events.parquet"
    )
    got = {r.prev_type: r for r in markov_entropy(spark, d).collect()}
    assert got["click"].entropy == 0.0
    assert got["view"].entropy == 0.0
    rate = got["__rate__"]
    assert rate.entropy == 0.0
    # marginal next-type counts are 5 view / 4 click over 9 transitions
    h_marg = math.log(9) - (5 * math.log(5) + 4 * math.log(4)) / 9
    assert abs(rate.share - h_marg) < 1e-5
    assert rate.n_transitions == 9
    shares = [got[k].share for k in ("click", "view")]
    assert abs(sum(shares) - 1.0) < 1e-6


def test_drawdown_hand_computed_path(spark, tmp_path):
    """Hourly sums 10, 8, 12, 5, 9: running peak 10,10,12,12,12 ->
    max drawdown 7 at the 4th hour from peak 12 (frac 7/12); the
    earlier 10->8 slump (dd 2) must not win."""
    from streamprocessing_with_kafka_spark.operators.timeseries import (
        hourly_drawdown,
    )

    vals = [10.0, 8.0, 12.0, 5.0, 9.0]
    rows = [
        (i, f"2024-01-01 {10+i:02d}:15:00", 1, "t", v)
        for i, v in enumerate(vals)
    ]
    d = str(tmp_path / "dd")
    spark.createDataFrame(
        [(e, ts, u, t, v, "{}") for (e, ts, u, t, v) in rows],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(
        d + "/events.parquet"
    )
    r = hourly_drawdown(spark, d).collect()[0]
    assert r.max_drawdown == 7.0
    assert r.peak_value == 12.0
    assert r.dd_frac == round(7 / 12, 6)
    assert str(r.trough_bucket)[11:13] == "13"  # the 5-valued hour


def test_runs_test_trending_vs_alternating(spark, tmp_path):
    """Type 'trend': 6 lows then 6 highs -> R = 2, far below expected
    (z strongly negative, nonrandom). Type 'alt': perfectly
    alternating -> R = 12, far above (z positive, nonrandom)."""
    from streamprocessing_with_kafka_spark.operators.timeseries import (
        runs_test,
    )

    rows, eid = [], 0
    trend_vals = [1.0] * 6 + [9.0] * 6
    alt_vals = [1.0, 9.0] * 6
    for h, v in enumerate(trend_vals):
        rows.append((eid, f"2024-01-01 {h:02d}:10:00", 1, "trend", v)); eid += 1
    for h, v in enumerate(alt_vals):
        rows.append((eid, f"2024-01-01 {h:02d}:10:00", 1, "alt", v)); eid += 1
    d = str(tmp_path / "runs")
    spark.createDataFrame(
        [(e, ts, u, t, v, "{}") for (e, ts, u, t, v) in rows],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(
        d + "/events.parquet"
    )
    got = {r.event_type: r for r in runs_test(spark, d).collect()}
    tr, al = got["trend"], got["alt"]
    assert (tr.n1, tr.n2, tr.runs) == (6, 6, 2)
    assert tr.expected_runs == 7.0  # 2*6*6/12 + 1
    assert tr.z < -2 and tr.nonrandom is True
    assert (al.n1, al.n2, al.runs) == (6, 6, 12)
    assert al.z > 2 and al.nonrandom is True


def test_gapfill_null_sum_hours_keep_ignore_nulls_locf(spark):
    """r8 code-review finding: an observed hour whose values are ALL NULL
    aggregates to hour_value = NULL and must behave exactly like a gap --
    is_gap = true, the LOCF carry SKIPS it (ignore-nulls), and leading
    NULL hours fill with NULL. The generated sf data has no NULL values,
    so this class lives only here (the nulls-variant sweep nulls ts too,
    emptying both sides)."""
    from streamprocessing_with_kafka_spark.operators.windows import (
        gapfill_hourly,
    )

    ev = spark.createDataFrame(
        [
            # user 1: leading NULL-sum hour, then 5.0, a NULL-sum hour,
            # a true gap, then 7.0
            (1, "2024-01-01 00:10:00", None),
            (1, "2024-01-01 01:20:00", 5.0),
            (1, "2024-01-01 02:30:00", None),
            (1, "2024-01-01 04:40:00", 7.0),
            # user 2: an hour mixing NULL and non-NULL stays observed
            (2, "2024-01-01 00:00:00", None),
            (2, "2024-01-01 00:30:00", 3.0),
        ],
        "user_id long, ts string, value double",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")

    rows = {
        (r.user_id, r.bucket.hour): r
        for r in gapfill_hourly(ev).collect()
    }
    assert sorted(rows) == [(1, 0), (1, 1), (1, 2), (1, 3), (1, 4), (2, 0)]
    # leading NULL-sum hour: a gap with nothing to carry
    assert rows[(1, 0)].is_gap and rows[(1, 0)].filled_value is None
    assert rows[(1, 0)].observed_value is None
    # observed non-null hour
    r11 = rows[(1, 1)]
    assert (r11.observed_value, r11.filled_value, r11.is_gap) == (5.0, 5.0, False)
    # observed ALL-NULL hour: is_gap, carry skips it back to 5.0
    r12 = rows[(1, 2)]
    assert (r12.observed_value, r12.filled_value, r12.is_gap) == (None, 5.0, True)
    # true gap after the NULL-sum hour still carries 5.0, not NULL
    r13 = rows[(1, 3)]
    assert (r13.observed_value, r13.filled_value, r13.is_gap) == (None, 5.0, True)
    assert (rows[(1, 4)].observed_value, rows[(1, 4)].is_gap) == (7.0, False)
    # NULL + 3.0 in one hour: dec_sum over non-null values = 3.0, observed
    r20 = rows[(2, 0)]
    assert (r20.observed_value, r20.filled_value, r20.is_gap) == (3.0, 3.0, False)
