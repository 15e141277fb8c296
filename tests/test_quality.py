"""Semantic tests for the data-quality constraint audit and the FastSS
fuzzy similarity join (operators/quality.py) on planted-violation
fixtures -- the sf tables are clean, so the fixtures carry the failure
semantics the audit exists to catch."""

import pytest

from streamprocessing_with_kafka_spark.operators.quality import (
    FUZZY_MAX_DIST,
    fuzzy_name_pairs,
    quality_report,
)


def _write(df, path):
    df.write.mode("overwrite").parquet(path)


@pytest.fixture()
def dirty_dir(spark, tmp_path):
    """orders with: 1 null custkey, a duplicated orderkey, 1 bad status,
    1 out-of-bounds price, 2 dangling FKs; customer 1..3; documents with
    1 inconsistent n_chars and 3-of-5 below the length gate."""
    d = str(tmp_path / "dirty")
    _write(
        spark.createDataFrame(
            [
                (1, 1, "O", 100.0),
                (2, 2, "F", 200.0),
                (2, 3, "P", 300.0),  # dup orderkey
                (4, None, "O", 400.0),  # null custkey
                (5, 1, "X", 500.0),  # bad status
                (6, 2, "O", -7.0),  # out of bounds
                (7, 99, "O", 700.0),  # dangling FK
                (8, 98, "O", 800.0),  # dangling FK
            ],
            "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double",
        ).selectExpr(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "CAST('2024-01-01' AS TIMESTAMP) AS o_orderdate",
            "'1-URGENT' AS o_orderpriority",
        ),
        d + "/orders.parquet",
    )
    _write(
        spark.createDataFrame(
            [(1,), (2,), (3,)], "c_custkey long"
        ).selectExpr(
            "c_custkey", "concat('Customer#', c_custkey) AS c_name",
            "CAST(1 AS INT) AS c_nationkey", "0.0 AS c_acctbal",
            "'BUILDING' AS c_mktsegment",
        ),
        d + "/customer.parquet",
    )
    long_text = "x" * 150
    _write(
        spark.createDataFrame(
            [
                (1, long_text, len(long_text)),
                (2, long_text, len(long_text)),
                (3, "short", 5),
                (4, "short", 5),
                (5, "mislabeled", 999),  # n_chars != length(text), short
            ],
            "doc_id long, text string, n_chars long",
        ).selectExpr("doc_id", "text", "'en' AS lang", "'src0' AS source", "n_chars"),
        d + "/documents.parquet",
    )
    return d


def test_quality_report_flags_planted_violations(spark, dirty_dir):
    rows = {
        (r.table_name, r.check_name): r
        for r in quality_report(spark, dirty_dir).collect()
    }
    assert len(rows) == 8
    # orders: 8 rows total
    r = rows[("orders", "completeness_o_custkey")]
    assert (r.metric, r.passed) == (round(7 / 8, 6), False)
    r = rows[("orders", "unique_o_orderkey")]
    assert (r.metric, r.passed) == (round(7 / 8, 6), False)
    r = rows[("orders", "domain_o_orderstatus")]
    assert (r.metric, r.passed) == (round(7 / 8, 6), False)
    r = rows[("orders", "bounds_o_totalprice")]
    assert (r.metric, r.passed) == (round(7 / 8, 6), False)
    # FK: custkeys 99, 98 dangling and the NULL row cannot match -> 5/8
    r = rows[("orders", "fk_o_custkey_in_customer")]
    assert (r.metric, r.passed) == (round(5 / 8, 6), False)
    # documents: 5 rows, all doc_ids unique
    assert rows[("documents", "unique_doc_id")].passed is True
    r = rows[("documents", "consistent_n_chars")]
    assert (r.metric, r.passed) == (round(4 / 5, 6), False)
    # 2 of 5 docs >= 100 chars -> 0.4 < 0.5 gate
    r = rows[("documents", "min_length_gate")]
    assert (r.metric, r.passed) == (0.4, False)


def test_quality_report_clean_on_sf_tables(spark, sf_dir):
    """The generated tables are clean: every hard constraint passes."""
    rows = quality_report(spark, sf_dir).collect()
    hard = [r for r in rows if r.check_name != "min_length_gate"]
    assert all(r.passed for r in hard), [
        (r.check_name, r.metric) for r in hard if not r.passed
    ]
    assert all(r.metric == 1.0 for r in hard)


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.fixture()
def names_dir(spark, tmp_path):
    names = [
        (1, "alpha"),
        (2, "alpht"),   # substitution of 1 -> dist 1 to alpha
        (3, "alphaa"),  # insertion -> dist 1 to alpha, dist 2 to alpht
        (4, "alph"),    # deletion -> dist 1 to alpha/alpht, 2 to alphaa
        (5, "beta"),    # far from everything
        (6, "betA"),    # case-sensitive: dist 1 to beta
    ]
    d = str(tmp_path / "names")
    _write(
        spark.createDataFrame(names, "c_custkey long, c_name string").selectExpr(
            "c_custkey", "c_name", "CAST(0 AS INT) AS c_nationkey",
            "0.0 AS c_acctbal", "'X' AS c_mktsegment",
        ),
        d + "/customer.parquet",
    )
    return d, names


def test_fuzzy_pairs_match_bruteforce(spark, names_dir):
    """The blocked plan must return EXACTLY the brute-force pair set --
    FastSS recall is 1 by construction, verify removes the rest."""
    d, names = names_dir
    want = {
        (a_id, b_id)
        for i, (a_id, a) in enumerate(names)
        for (b_id, b) in names[i + 1 :]
        if _levenshtein(a, b) <= FUZZY_MAX_DIST
    }
    got = {
        (r.custkey_a, r.custkey_b): r.dist
        for r in fuzzy_name_pairs(spark, d).collect()
    }
    assert set(got) == want
    assert want == {(1, 2), (1, 3), (1, 4), (2, 4), (5, 6)}
    for (a_id, b_id), dist in got.items():
        a = dict(names)[a_id]
        b = dict(names)[b_id]
        assert dist == _levenshtein(a, b)


def test_k_anonymity_flags_small_classes(spark, tmp_path):
    from streamprocessing_with_kafka_spark.operators.quality import (
        K_ANONYMITY,
        k_anonymity_audit,
    )

    rows = [(i, 1, "BIG") for i in range(K_ANONYMITY + 2)]  # safe class
    rows += [(100 + i, 2, "MID") for i in range(3)]  # small class
    rows += [(200, 3, "SOLO")]  # singleton: worst case
    d = str(tmp_path / "kanon")
    _write(
        spark.createDataFrame(
            rows, "c_custkey long, c_nationkey int, c_mktsegment string"
        ).selectExpr(
            "c_custkey", "concat('Customer#', c_custkey) AS c_name",
            "c_nationkey", "0.0 AS c_acctbal", "c_mktsegment",
        ),
        d + "/customer.parquet",
    )
    got = {
        (r.c_nationkey, r.c_mktsegment): r
        for r in k_anonymity_audit(spark, d).collect()
    }
    assert got[(1, "BIG")].at_risk is False
    assert got[(2, "MID")].at_risk is True
    assert got[(3, "SOLO")].at_risk is True
    assert got[(3, "SOLO")].reident_risk == 1.0
    assert got[(2, "MID")].reident_risk == round(1 / 3, 6)


def test_benford_digit_extraction_and_shares(spark, tmp_path):
    import math

    from streamprocessing_with_kafka_spark.operators.quality import benford_audit

    vals = [1.0, 19.99, 25.0, 999.0, 0.5, 150000.0]  # 0.5 excluded
    d = str(tmp_path / "benford")
    _write(
        spark.createDataFrame(
            [(i, 1, "O", v) for i, v in enumerate(vals)],
            "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double",
        ).selectExpr(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "CAST('2024-01-01' AS TIMESTAMP) AS o_orderdate",
            "'1-URGENT' AS o_orderpriority",
        ),
        d + "/orders.parquet",
    )
    got = {r.digit: r for r in benford_audit(spark, d).collect()}
    assert set(got) == {1, 2, 9}
    assert got[1].n == 3  # 1.0, 19.99, 150000.0
    assert got[2].n == 1 and got[9].n == 1
    assert got[1].obs_share == round(3 / 5, 6)
    assert got[1].benford_share == round(math.log10(2.0), 6)
    assert got[9].abs_dev == round(abs(round(1 / 5, 6) - round(math.log10(10 / 9), 6)), 6)


def test_quality_gate_composes_three_planes(spark, sf_dir):
    """The gate's known verdict on the synthetic tables: every hard
    constraint passes, the Benford screen FAILS (uniform synthetic
    prices are exactly what it flags), and each constituent row
    carries its audit plane."""
    from streamprocessing_with_kafka_spark.operators.quality import quality_gate

    rows = {(r.audit, r.check_name): r for r in quality_gate(spark, sf_dir).collect()}
    assert len(rows) == 10
    assert rows[("benford", "benford_mad")].passed is False
    assert rows[("benford", "benford_mad")].metric > 0.015
    assert rows[("constraints", "unique_o_orderkey")].passed is True
    assert ("privacy", "k_anon_at_risk_share") in rows


def test_l_diversity_entropy_and_flags(spark, tmp_path):
    """Planted classes: homogeneous (distinct_l=1, entropy_l=1), uniform
    2-value (entropy_l=2), and skewed 3-value (1 < entropy_l < 3)."""
    import math

    from streamprocessing_with_kafka_spark.operators.quality import (
        l_diversity_audit,
    )

    d = str(tmp_path / "ldiv")
    cust = [(1, 1, "HOMOG"), (2, 2, "UNIF"), (3, 3, "SKEW")]
    _write(
        spark.createDataFrame(
            cust, "c_custkey long, c_nationkey int, c_mktsegment string"
        ).selectExpr(
            "c_custkey", "concat('Customer#', c_custkey) AS c_name",
            "c_nationkey", "0.0 AS c_acctbal", "c_mktsegment",
        ),
        d + "/customer.parquet",
    )
    orders = (
        [(i, 1, "1-URGENT") for i in range(4)]
        + [(10, 2, "1-URGENT"), (11, 2, "2-HIGH"), (12, 2, "1-URGENT"), (13, 2, "2-HIGH")]
        + [(20, 3, "1-URGENT")] * 1
        + [(21, 3, "2-HIGH")] * 1
        + [(22, 3, "3-MEDIUM"), (23, 3, "3-MEDIUM"), (24, 3, "3-MEDIUM"), (25, 3, "3-MEDIUM")]
    )
    _write(
        spark.createDataFrame(
            orders, "o_orderkey long, o_custkey long, o_orderpriority string"
        ).selectExpr(
            "o_orderkey", "o_custkey", "'O' AS o_orderstatus",
            "100.0 AS o_totalprice",
            "CAST('2024-01-01' AS TIMESTAMP) AS o_orderdate",
            "o_orderpriority",
        ),
        d + "/orders.parquet",
    )
    got = {r.c_mktsegment: r for r in l_diversity_audit(spark, d).collect()}
    assert got["HOMOG"].distinct_l == 1
    assert got["HOMOG"].homogeneity_risk is True
    assert got["HOMOG"].entropy_l == 1.0
    assert got["UNIF"].distinct_l == 2
    assert got["UNIF"].entropy_l == 2.0
    # skew: 1/6, 1/6, 4/6 -> H = ln6 - (4 ln4)/6; entropy_l = exp(H)
    h = math.log(6.0) - (4.0 * math.log(4.0)) / 6.0
    assert got["SKEW"].distinct_l == 3
    assert got["SKEW"].homogeneity_risk is False
    assert abs(got["SKEW"].entropy_l - math.exp(h)) < 1e-5
