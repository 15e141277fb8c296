"""Semantic invariants for the rank-window and dedup-dashboard
operators beyond the oracle hash: quartile balance/monotonicity and
dashboard-vs-cluster-frame consistency."""

from streamprocessing_with_kafka_spark.operators.analytics import (
    customer_revenue_quartiles,
)
from streamprocessing_with_kafka_spark.operators.dedup import (
    dedup_cluster_keepers,
    dedup_stats_by_source,
)
from streamprocessing_with_kafka_spark.sources.tables import load_table


def test_quartiles_are_balanced_and_monotone(spark, sf_dir):
    rows = customer_revenue_quartiles(spark, sf_dir).collect()
    assert rows
    n = len(rows)
    sizes: dict = {}
    bounds: dict = {}
    for r in rows:
        assert 1 <= r.quartile <= 4
        assert 0.0 <= r.pct_rank <= 1.0
        assert 0.0 < r.cume <= 1.0
        sizes[r.quartile] = sizes.get(r.quartile, 0) + 1
        lo, hi = bounds.get(r.quartile, (float("inf"), float("-inf")))
        bounds[r.quartile] = (min(lo, r.revenue), max(hi, r.revenue))
    # ntile balance: sizes differ by at most 1
    assert max(sizes.values()) - min(sizes.values()) <= 1, sizes
    assert sum(sizes.values()) == n
    # monotone: every revenue in quartile q >= every revenue in q+1
    for q in (1, 2, 3):
        assert bounds[q][0] >= bounds[q + 1][1], (q, bounds)


def test_dedup_dashboard_is_consistent_with_cluster_frame(spark, sf_dir):
    stats = {r.source: r for r in dedup_stats_by_source(spark, sf_dir).collect()}
    docs = {
        r.doc_id: r.source
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "source").collect()
    }
    labels = {r.doc_id: r.keeper_doc_id for r in dedup_cluster_keepers(spark, sf_dir).collect()}
    # recompute the dashboard from the raw cluster frame
    for src, row in stats.items():
        members = [d for d, s in docs.items() if s == src]
        in_cl = [d for d in members if d in labels]
        dropped = [d for d in in_cl if labels[d] != d]
        assert row.n_docs == len(members)
        assert row.n_in_clusters == len(in_cl)
        assert row.n_dropped == len(dropped)
        assert row.n_clusters == len({labels[d] for d in in_cl})
        assert 0 <= row.n_dropped <= row.n_in_clusters <= row.n_docs
    assert set(stats) == set(docs.values())


def test_source_divergence_bounds_and_skew_ordering(spark, tmp_path):
    """Entropy <= ln(n_terms) (uniform bound), KL >= 0 always, and a
    planted skewed source must diverge more than a corpus-like one."""
    import math

    from streamprocessing_with_kafka_spark.operators.text import source_divergence

    docs = [
        # balanced: mirrors the corpus mix
        (0, "a b c d a b c d", "en", "balanced", 15),
        (1, "a b c d d c b a", "en", "balanced", 15),
        # skewed: almost all one term
        (2, "a a a a a a a b", "en", "skewed", 15),
        (3, "a a a a a a a c", "en", "skewed", 15),
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(d + "/documents.parquet")
    rows = {r.source: r for r in source_divergence(spark, d).collect()}
    assert set(rows) == {"balanced", "skewed"}
    for r in rows.values():
        assert r.kl_from_corpus >= 0.0
        assert r.entropy <= math.log(r.n_terms) + 1e-9
    assert rows["skewed"].kl_from_corpus > rows["balanced"].kl_from_corpus
    assert rows["skewed"].entropy < rows["balanced"].entropy


def test_basket_pairs_on_planted_orders(spark, tmp_path):
    """Planted baskets with known co-occurrence: lift/support/confidence
    arithmetic and the min-support gate, recomputed by hand."""
    from streamprocessing_with_kafka_spark.operators.analytics import (
        basket_part_pairs,
    )

    orders = [  # (orderkey, [parts])
        (1, [10, 20]),
        (2, [10, 20]),
        (3, [10, 20, 30]),
        (4, [10, 30]),
        (5, [40]),
    ]
    rows = []
    for ok, parts in orders:
        for i, p in enumerate(parts):
            rows.append((ok, p, 1, i, 1.0, 1.0, 0.0, 0.0, "N", "O",
                         "2024-01-01 00:00:00"))
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, l_shipdate string",
    ).selectExpr(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "CAST(l_shipdate AS TIMESTAMP) AS l_shipdate",
    ).write.parquet(d + "/lineitem.parquet")
    got = {(r.pa, r.pb): r for r in basket_part_pairs(spark, d).collect()}
    # (10,20): 3 orders; (10,30): 2; (20,30): 1 -> below min support
    assert set(got) == {(10, 20), (10, 30)}
    n = 5
    c10, c20, c30 = 4, 3, 2
    r = got[(10, 20)]
    assert r.c_ab == 3
    assert r.support == round(3 / n, 6)
    assert r.confidence_a_to_b == round(3 / c10, 6)
    assert r.lift == round(3 * n / (c10 * c20), 6)
    r = got[(10, 30)]
    assert r.c_ab == 2 and r.lift == round(2 * n / (c10 * c30), 6)


def test_basket_reuses_one_order_exchange(spark, sf_dir):
    """The per-order aggregate feeds three consumers; the executed plan
    must reuse its exchange (one corpus scan+shuffle), not re-derive it."""
    from streamprocessing_with_kafka_spark.operators.analytics import (
        basket_part_pairs,
    )

    df = basket_part_pairs(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "ReusedExchange" in plan, plan


def test_corpus_report_rows_match_constituents(spark, sf_dir):
    """The flagship's glued row must equal the constituent operators
    queried independently (the composition contract)."""
    from streamprocessing_with_kafka_spark.operators.compose import (
        corpus_report_pipeline,
    )
    from streamprocessing_with_kafka_spark.operators.text import source_divergence

    report = {r.source: r for r in corpus_report_pipeline(spark, sf_dir).collect()}
    stats = {r.source: r for r in dedup_stats_by_source(spark, sf_dir).collect()}
    div = {r.source: r for r in source_divergence(spark, sf_dir).collect()}
    assert set(report) == set(stats) == set(div)
    for src, r in report.items():
        assert r.n_docs == stats[src].n_docs
        assert r.drop_frac == stats[src].drop_frac
        assert r.n_clusters == stats[src].n_clusters
        assert r.entropy == div[src].entropy
        assert r.kl_from_corpus == div[src].kl_from_corpus
        assert 0.0 <= r.mean_quality <= 1.0
        assert 0.0 <= r.keep_frac <= 1.0
