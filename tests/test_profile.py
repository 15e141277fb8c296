"""profile_frame must count nulls/distincts correctly and compute min/max
on the native type (casting first would order "10" < "9" wrong)."""

from streamprocessing_with_kafka_spark.operators.profile import profile_frame


def test_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (10, "b"), (9, None)],
        "n int, s string",
    )
    rows = {r["column"]: r for r in profile_frame(df).collect()}
    assert set(rows) == {"n", "s"}

    n = rows["n"]
    assert (n["n_rows"], n["n_nulls"], n["n_distinct"]) == (5, 0, 4)
    # native-type min/max: 9 < 10 numerically even though "10" < "9"
    assert (n["min_value"], n["max_value"]) == ("1", "10")

    s = rows["s"]
    assert (s["n_rows"], s["n_nulls"], s["n_distinct"]) == (5, 2, 2)
    assert (s["min_value"], s["max_value"]) == ("a", "b")


def test_profile_drift_frame_flags(spark):
    """Drift semantics on a constructed stream whose time range puts the
    cutoff at t=50min: a type whose mean value doubles in the second half
    flags with a large positive Welch z; a type with the same distribution
    in both halves does not flag (z ~ 0, ratio 1); a type that vanishes in
    the second half flags on volume ratio with a NULL z (n_b = 0)."""
    import datetime as dt

    from streamprocessing_with_kafka_spark.operators.profile import (
        profile_drift_frame,
    )

    t0 = dt.datetime(2024, 1, 1)

    def at(minute):
        return t0 + dt.timedelta(minutes=minute)

    rows = []
    # pin the global range to [0, 100] min so the cutoff is exactly 50
    rows += [(at(0), "shift", 1, 100.0), (at(100), "shift", 1, 200.0)]
    for m in range(1, 41):  # type "shift": mean 100 -> 200, nonzero var
        v = 1.0 if m % 2 else -1.0
        rows += [
            (at(m), "shift", m, 100.0 + v),
            (at(m + 59), "shift", m, 200.0 + v),
        ]
    for m in range(1, 41):  # type "same": identical halves, nonzero var
        v = 10.0 if m % 2 else 20.0
        rows += [(at(m), "same", m, v), (at(m + 59), "same", m, v)]
    for m in range(1, 11):  # type "gone": first half only
        rows += [(at(m), "gone", m, 50.0)]
    e = spark.createDataFrame(
        rows, "ts timestamp, event_type string, user_id long, value double"
    )
    out = {r.event_type: r for r in profile_drift_frame(e).collect()}

    shift = out["shift"]
    assert shift.drift_flag and shift.welch_z > 3
    assert (shift.mean_a, shift.mean_b) == (100.0, 200.0)
    assert shift.n_a == shift.n_b == 41

    same = out["same"]
    assert not same.drift_flag and abs(same.welch_z) < 1e-9
    assert same.count_ratio == 1.0

    gone = out["gone"]
    assert gone.drift_flag and gone.welch_z is None and gone.n_b == 0
    assert gone.count_ratio == 0.0


def test_profile_drift_zero_variance_type_yields_null_z(spark):
    """A type with constant value in BOTH windows: variance sum is <= 0
    (possibly -epsilon under double cancellation), so welch_z must be
    NULL -- never NaN (Spark orders NaN above zero, so a post-sqrt guard
    would emit a spurious flag where the DuckDB oracle emits NULL)."""
    import datetime as dt

    from streamprocessing_with_kafka_spark.operators.profile import (
        profile_drift_frame,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [(t0, "flat", 1, 7.0), (t0 + dt.timedelta(minutes=100), "flat", 2, 7.0)]
    for m in range(1, 41):
        rows += [
            (t0 + dt.timedelta(minutes=m), "flat", m, 7.0),
            (t0 + dt.timedelta(minutes=m + 59), "flat", m, 7.0),
        ]
    e = spark.createDataFrame(
        rows, "ts timestamp, event_type string, user_id long, value double"
    )
    out = profile_drift_frame(e).collect()[0]
    assert out.welch_z is None and not out.drift_flag


def test_key_skew_finds_planted_heavy_key(spark, tmp_path):
    """A planted 100x-heavy key must rank first with the right share
    and skew factor, across repeated runs (the sort-limit must not
    degrade under the scalar join)."""
    from streamprocessing_with_kafka_spark.operators.profile import (
        key_skew_profile,
    )

    rows = [(i, 777, "O", 10.0) for i in range(100)]  # heavy key
    rows += [(100 + i, i % 20, "O", 10.0) for i in range(100)]  # 5 each
    d = str(tmp_path / "skew")
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "CAST('2024-01-01' AS TIMESTAMP) AS o_orderdate",
        "'1-URGENT' AS o_orderpriority",
    ).write.parquet(d + "/orders.parquet")
    for _ in range(2):
        out = key_skew_profile(spark, d).collect()
        top = max(out, key=lambda r: r.cnt)
        assert (top.key, top.cnt) == (777, 100)
        assert top.n_rows == 200 and top.n_keys == 21
        assert top.share == 0.5
        assert top.skew_factor == round(100 / (200 / 21), 6)
        # ties at cnt=5 break by key asc: keys 0..8 fill the 9 slots
        assert {r.key for r in out} == {777, *range(9)}
        assert len(out) == 10


def test_numeric_correlations_hand_computed(spark, tmp_path):
    """Planted lineitem where extendedprice = 10*quantity exactly
    (r = 1), discount is anti-correlated with quantity (r = -1), and
    tax is constant (r undefined -> NULL via 0/0)."""
    from streamprocessing_with_kafka_spark.operators.profile import (
        numeric_correlations,
    )

    rows = [(i, 1, 1, 1, float(q), 10.0 * q, 1.0 - q * 0.1, 0.05, "N", "O")
            for i, q in enumerate([1, 2, 3, 4, 5])]
    d = str(tmp_path / "corr")
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string",
    ).selectExpr("*", "CAST('2024-01-01' AS TIMESTAMP) AS l_shipdate").write.parquet(
        d + "/lineitem.parquet"
    )
    got = {
        (r.col_a, r.col_b): r.pearson_r
        for r in numeric_correlations(spark, d).collect()
    }
    assert got[("l_quantity", "l_extendedprice")] == 1.0
    assert got[("l_quantity", "l_discount")] == -1.0
    assert got[("l_quantity", "l_tax")] is None  # zero variance
    assert got[("l_extendedprice", "l_discount")] == -1.0
