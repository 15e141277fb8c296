

def test_rfm_segments_hand_computed(spark, tmp_path):
    """Four customers with fully separated R/F/M land in hand-computed
    quartile segments (interpolated edges over 4 values)."""
    from streamprocessing_with_kafka_spark.operators.analytics import rfm_segments

    orders = []
    k = 0
    for _ in range(10):  # cust 1: recent, frequent, big
        orders.append((k, 1, "2024-01-31", 1000.0)); k += 1
    orders.append((k, 2, "2024-01-01", 10.0)); k += 1  # cust 2: stale, rare, small
    for day in ("2024-01-19", "2024-01-20", "2024-01-21"):  # cust 3
        orders.append((k, 3, day, 100.0)); k += 1
    for _ in range(5):  # cust 4
        orders.append((k, 4, "2024-01-11", 200.0)); k += 1
    d = str(tmp_path / "rfm")
    spark.createDataFrame(
        [(o, c, "O", p, ts) for (o, c, ts, p) in orders],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, ts string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "CAST(ts AS TIMESTAMP) AS o_orderdate", "'1-URGENT' AS o_orderpriority",
    ).write.parquet(d + "/orders.parquet")
    segs = {
        (r.r_score, r.f_score, r.m_score): r
        for r in rfm_segments(spark, d).collect()
    }
    assert len(segs) == 4
    assert segs[(4, 4, 4)].n_customers == 1
    assert segs[(4, 4, 4)].avg_monetary == 10000.0
    assert segs[(1, 1, 1)].avg_monetary == 10.0
    assert (3, 2, 2) in segs  # cust 3: recency 10, freq 3, monetary 300
    assert (2, 3, 3) in segs  # cust 4: recency 20, freq 5, monetary 1000


def test_revenue_concentration_hand_computed(spark, tmp_path):
    """Equal spends give Gini 0; an extreme distribution matches the
    hand-applied sort formula; top_share = ceil(10%) heaviest."""
    from streamprocessing_with_kafka_spark.operators.analytics import (
        revenue_concentration,
    )

    def write(d, spends):
        rows = [(i, c, "O", s) for i, (c, s) in enumerate(spends)]
        spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double",
        ).selectExpr(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "CAST('2024-01-01' AS TIMESTAMP) AS o_orderdate",
            "'1-URGENT' AS o_orderpriority",
        ).write.parquet(d + "/orders.parquet")

    d1 = str(tmp_path / "equal")
    write(d1, [(1, 250.0), (2, 250.0), (3, 250.0), (4, 250.0)])
    r = revenue_concentration(spark, d1).collect()[0]
    assert (r.n_customers, r.total_revenue, r.gini, r.top_share) == (4, 1000.0, 0.0, 0.25)

    d2 = str(tmp_path / "extreme")
    write(d2, [(1, 1.0), (2, 1.0), (3, 1.0), (4, 997.0)])
    r = revenue_concentration(spark, d2).collect()[0]
    # iw = 1 + 2 + 3 + 4*997 = 3994; G = 2*3994/4000 - 5/4 = 0.747
    assert r.gini == 0.747
    assert r.top_share == 0.997


def test_pareto_frontier_domination_and_multiplicity(spark, tmp_path):
    """Planted grid: (d1,10)x2 kept (price beats everything later),
    (d1,5) dominated same-date, (d2,8) dominated by equal price on a
    later date, (d3,8) kept (most recent date's max)."""
    from streamprocessing_with_kafka_spark.operators.analytics import (
        pareto_frontier,
    )

    rows = [
        (1, "2024-01-01", 10.0),
        (2, "2024-01-01", 10.0),
        (3, "2024-01-01", 5.0),
        (4, "2024-01-02", 8.0),
        (5, "2024-01-03", 8.0),
    ]
    d = str(tmp_path / "sky")
    spark.createDataFrame(
        [(o, 1, "O", p, ts) for (o, ts, p) in rows],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, ts string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "CAST(ts AS TIMESTAMP) AS o_orderdate", "'1-URGENT' AS o_orderpriority",
    ).write.parquet(d + "/orders.parquet")
    got = {
        (str(r.o_orderdate)[:10], r.o_totalprice): r.n_orders
        for r in pareto_frontier(spark, d).collect()
    }
    assert got == {("2024-01-01", 10.0): 2, ("2024-01-03", 8.0): 1}


def test_ship_latency_interpolated_percentiles(spark, tmp_path):
    """Two orders, latencies 2 and 10 days -> interpolated p50 = 6,
    p95 = 9.6, avg = 6."""
    from streamprocessing_with_kafka_spark.operators.analytics import (
        ship_latency_monthly,
    )

    d = str(tmp_path / "sla")
    orders = [(1, "2024-01-05"), (2, "2024-01-20")]
    ships = [(1, 1, "2024-01-07"), (2, 1, "2024-01-30"), (2, 2, "2024-02-15")]
    spark.createDataFrame(
        [(o, 1, "O", 10.0, ts) for (o, ts) in orders],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, ts string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "CAST(ts AS TIMESTAMP) AS o_orderdate", "'1-URGENT' AS o_orderpriority",
    ).write.parquet(d + "/orders.parquet")
    spark.createDataFrame(
        [(o, ln, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", ts) for (o, ln, ts) in ships],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, ts string",
    ).selectExpr(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "CAST(ts AS TIMESTAMP) AS l_shipdate",
    ).write.parquet(d + "/lineitem.parquet")
    rows = ship_latency_monthly(spark, d).collect()
    assert len(rows) == 1  # the Feb line ships later; FIRST ship is Jan
    r = rows[0]
    assert r.n_orders == 2
    assert r.p50_days == 6.0
    assert abs(r.p95_days - 9.6) < 1e-9
    assert r.avg_days == 6.0


def test_mode_by_nation_deterministic_tiebreak(spark, tmp_path):
    from streamprocessing_with_kafka_spark.operators.analytics import (
        mode_segment_by_nation,
    )

    rows = [(1, 1, "BUILDING"), (2, 1, "BUILDING"), (3, 1, "AUTOMOBILE"),
            (4, 2, "MACHINERY"), (5, 2, "AUTOMOBILE"), (6, 2, "MACHINERY"),
            (7, 2, "AUTOMOBILE")]
    d = str(tmp_path / "mode")
    spark.createDataFrame(
        rows, "c_custkey long, c_nationkey int, c_mktsegment string"
    ).selectExpr(
        "c_custkey", "concat('Customer#', c_custkey) AS c_name",
        "c_nationkey", "0.0 AS c_acctbal", "c_mktsegment",
    ).write.parquet(d + "/customer.parquet")
    got = {r.c_nationkey: r for r in mode_segment_by_nation(spark, d).collect()}
    assert got[1].modal_segment == "BUILDING" and got[1].n_customers == 2
    # nation 2 ties 2-2: lexicographically smaller segment wins
    assert got[2].modal_segment == "AUTOMOBILE" and got[2].n_customers == 2


def test_cohort_ltv_triangle_hand_computed(spark, tmp_path):
    """Two cohorts: Jan (custs 1, 2) and Feb (cust 3). Cust 1 orders
    100 in Jan + 50 in Mar (age 2); cust 2 orders 20 in Jan. Jan cohort:
    age 0 -> (100+20)/2 = 60, age 2 -> (170)/2 = 85 cumulative."""
    from streamprocessing_with_kafka_spark.operators.analytics import cohort_ltv

    orders = [
        (1, 1, "2024-01-10", 100.0),
        (2, 2, "2024-01-20", 20.0),
        (3, 1, "2024-03-05", 50.0),
        (4, 3, "2024-02-15", 70.0),
    ]
    d = str(tmp_path / "ltv")
    spark.createDataFrame(
        [(o, c, "O", p, ts) for (o, c, ts, p) in orders],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, ts string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "CAST(ts AS TIMESTAMP) AS o_orderdate", "'1-URGENT' AS o_orderpriority",
    ).write.parquet(d + "/orders.parquet")
    got = {
        (str(r.cohort)[:7], r.age_months): r
        for r in cohort_ltv(spark, d).collect()
    }
    jan0 = got[("2024-01", 0)]
    assert (jan0.cohort_size, jan0.n_orders, jan0.revenue) == (2, 2, 120.0)
    assert jan0.cum_rev_per_member == 60.0
    jan2 = got[("2024-01", 2)]
    assert (jan2.n_orders, jan2.revenue) == (1, 50.0)
    assert jan2.cum_rev_per_member == 85.0
    feb0 = got[("2024-02", 0)]
    assert (feb0.cohort_size, feb0.cum_rev_per_member) == (1, 70.0)
    assert set(k[1] for k in got if k[0] == "2024-01") == {0, 2}


def test_abc_parts_hand_computed_classes(spark, tmp_path):
    """Revenues 50/30/15/5: cumulative shares .5/.8/.95/1.0 -> classes
    A, A (<= .8 inclusive), B (<= .95 inclusive), C."""
    from streamprocessing_with_kafka_spark.operators.analytics import abc_parts

    rows = [(i, pk, price) for i, (pk, price) in enumerate(
        [(1, 50.0), (2, 30.0), (3, 15.0), (4, 5.0)]
    )]
    d = str(tmp_path / "abc")
    spark.createDataFrame(
        [(o, pk, 1, 1, 1.0, pr, 0.0, 0.0, "N", "O") for (o, pk, pr) in rows],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string",
    ).selectExpr("*", "CAST('2024-01-01' AS TIMESTAMP) AS l_shipdate").write.parquet(
        d + "/lineitem.parquet"
    )
    got = {r.l_partkey: r for r in abc_parts(spark, d).collect()}
    assert [got[k].rank for k in (1, 2, 3, 4)] == [1, 2, 3, 4]
    assert [got[k].abc_class for k in (1, 2, 3, 4)] == ["A", "A", "B", "C"]
    assert got[2].cum_share == 0.8
    assert got[4].cum_share == 1.0


def test_km_survival_textbook_with_censoring(spark, tmp_path):
    """Durations: event@1, censored@2, event@3 (n=3). S = 2/3 after
    t=1, unchanged by the censoring at t=2 (risk set shrinks, no
    event), 0 after the last event. A fourth order placed after the
    cutoff is excluded from the study but sets max(first_ship)."""
    from streamprocessing_with_kafka_spark.operators.analytics import (
        fulfillment_survival,
    )

    # max first_ship = 2024-03-01 -> cutoff = 2024-01-31
    orders = [(1, "2024-01-01"), (2, "2024-01-29"), (3, "2024-01-01"),
              (4, "2024-02-05")]
    ships = [(1, "2024-01-02"), (2, "2024-02-20"), (3, "2024-01-04"),
             (4, "2024-03-01")]
    d = str(tmp_path / "km")
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
    got = {r.t: r for r in fulfillment_survival(spark, d).collect()}
    assert set(got) == {1, 2, 3}
    assert (got[1].n_risk, got[1].d, got[1].c) == (3, 1, 0)
    assert got[1].survival == round(2 / 3, 6)
    assert (got[2].n_risk, got[2].d, got[2].c) == (2, 0, 1)
    assert got[2].survival == round(2 / 3, 6)  # censoring: no S drop
    assert (got[3].n_risk, got[3].d) == (1, 1)
    assert got[3].survival == 0.0


def test_discount_elasticity_recovers_planted_line(spark, tmp_path):
    """Brand X: quantity = 100*discount + 5 exactly -> slope 100,
    intercept 5, r2 = 1; brand Y constant discount -> NULL slope."""
    from streamprocessing_with_kafka_spark.operators.analytics import (
        discount_elasticity,
    )

    d = str(tmp_path / "elas")
    lines = []
    for i, disc in enumerate([0.0, 0.02, 0.04, 0.06, 0.08]):
        lines.append((i, 1, 100.0 * disc + 5.0, disc))
    for i in range(3):
        lines.append((100 + i, 2, float(i), 0.05))
    spark.createDataFrame(
        [(o, pk, 1, 1, q, 10.0, disc, 0.0, "N", "O") for (o, pk, q, disc) in lines],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string",
    ).selectExpr("*", "CAST('2024-01-01' AS TIMESTAMP) AS l_shipdate").write.parquet(
        d + "/lineitem.parquet"
    )
    spark.createDataFrame(
        [(1, "part one", "BRAND#X", "t", 1, 10.0),
         (2, "part two", "BRAND#Y", "t", 1, 10.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).write.parquet(d + "/part.parquet")
    got = {r.p_brand: r for r in discount_elasticity(spark, d).collect()}
    x = got["BRAND#X"]
    assert (x.n_lines, x.slope, x.intercept, x.r2) == (5, 100.0, 5.0, 1.0)
    y = got["BRAND#Y"]
    assert y.slope is None and y.intercept is None and y.r2 is None


def test_logrank_hand_computed_separated_groups(spark, tmp_path):
    """3 urgent orders all ship at t=1, 3 low all at t=10: O-E = 1.5,
    V = 0.45 -> chi2 = 5.0 exactly (hand-worked hypergeometric)."""
    from streamprocessing_with_kafka_spark.operators.analytics import (
        fulfillment_logrank,
    )

    orders, ships = [], []
    for i in range(3):
        orders.append((i, "2024-01-01", "1-URGENT"))
        ships.append((i, "2024-01-02"))
    for i in range(3, 6):
        orders.append((i, "2024-01-01", "5-LOW"))
        ships.append((i, "2024-01-11"))
    # sacrificial late shipper sets cutoff = 2024-03-01 (placed after it)
    orders.append((9, "2024-03-05", "5-LOW"))
    ships.append((9, "2024-03-31"))
    d = str(tmp_path / "lr")
    spark.createDataFrame(
        [(o, 1, "O", 10.0, ts, pr) for (o, ts, pr) in orders],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, ts string, pr string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "CAST(ts AS TIMESTAMP) AS o_orderdate", "pr AS o_orderpriority",
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
    r = fulfillment_logrank(spark, d).collect()[0]
    assert (r.n_total, r.n1_total, r.observed_g1) == (6, 3, 3)
    assert r.expected_g1 == 1.5
    assert r.logrank_chi2 == 5.0
