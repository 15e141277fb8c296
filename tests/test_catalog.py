"""register_views: the text-SQL front end -- every table plus the
pipeline output views queryable verbatim through spark.sql, with scan
pushdown intact through the view."""

from streamprocessing_with_kafka_spark.sources.tables import (
    TABLES,
    register_views,
)


def test_all_views_queryable_and_enriched_matches_reference_shape(spark, sf_dir):
    names = register_views(spark, sf_dir)
    assert set(TABLES) < set(names)
    for t in names:
        assert spark.sql(f"SELECT * FROM {t} LIMIT 1").columns
    # the reference's documented end-to-end check, verbatim
    enriched = spark.sql("SELECT * FROM enriched_orders")
    assert enriched.columns == [
        "order_id", "product_name", "quantity", "price", "order_date",
        "total_price",
    ]
    assert enriched.count() > 0
    dead = spark.sql("SELECT count(*) AS n FROM invalid_orders").first().n
    assert dead > 0


def test_view_keeps_scan_pushdown(spark, sf_dir):
    register_views(spark, sf_dir)
    plan = (
        spark.sql("SELECT o_orderkey FROM orders WHERE o_custkey = 42")
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "PushedFilters: [IsNotNull(o_custkey), EqualTo(o_custkey,42)]" in plan, plan
