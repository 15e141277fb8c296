

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
