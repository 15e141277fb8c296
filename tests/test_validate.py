"""Unit tests for the validate/enrich/route core: every FIXTURES.md §1 row
class, including the reference's golden WASP order (README.md:123-130) and
its poison-pill defect (SURVEY.md §2.4 ST4) asserted *fixed*."""

from pyspark.sql import Row, functions as F

from streamprocessing_with_kafka_spark.operators.route import route
from streamprocessing_with_kafka_spark.operators.validate import validate_and_enrich

COLS = ["order_id", "product_name", "quantity", "price", "order_date"]


def run(spark, rows):
    df = spark.createDataFrame(
        [Row(**dict(zip(COLS, r))) for r in rows],
        schema="order_id string, product_name string, quantity string, "
        "price string, order_date string",
    )
    out = route(validate_and_enrich(df))
    return {r["order_id"] or "unknown": r.asDict() for r in out.collect()}


def test_golden_wasp_order(spark):
    """README.md:123-130: qty=2 price=200 -> total_price=400.0, valid."""
    out = run(spark, [("155", "Autonomous Mobile Robot - WASP", "2", "200", "2025-11-09")])
    r = out["155"]
    assert r["is_valid"] is True
    assert r["total_price"] == 400.0
    assert r["order_date"] == "2025-11-09"
    assert r["target"] == "enriched_orders"
    assert r["status_message"] == "Validated and enriched successfully"


def test_epoch_days_date(spark):
    """T7: '20401' epoch-days == 2025-11-09."""
    out = run(spark, [("1", "p", "1", "1", "20401")])
    assert out["1"]["order_date"] == "2025-11-09"
    assert out["1"]["is_valid"] is True


def test_missing_fields_short_circuits(spark):
    out = run(spark, [("2", None, "abc", None, "2024-01-01")])
    r = out["2"]
    assert r["is_valid"] is False
    # missing-fields message wins outright; numeric errors not mentioned
    assert r["status_message"] == "Missing required fields: product_name, price"
    assert r["target"] == "invalid_orders"
    assert r["total_price"] is None


def test_non_numeric_and_negative(spark):
    out = run(
        spark,
        [
            ("3", "p", "abc", "10", "2024-01-01"),
            ("4", "p", "5", "-10", "2024-01-01"),
            ("5", "p", "-1", "xyz", "2024-01-01"),
        ],
    )
    assert out["3"]["status_message"] == "Invalid quantity: abc"
    assert out["4"]["status_message"] == "Negative price: -10"
    # multiple errors joined with '; ', price first (reference check order)
    assert out["5"]["status_message"] == "Invalid price: xyz; Negative quantity: -1"
    assert all(not out[k]["is_valid"] for k in ("3", "4", "5"))


def test_poison_pill_routes_instead_of_looping(spark):
    """ST4: invalid row missing order_date must route to invalid_orders
    (the reference KeyErrors and livelocks -- order_validator.py:259,:373)."""
    out = run(spark, [("6", "p", "abc", "10", None)])
    r = out["6"]
    assert r["is_valid"] is False
    assert r["target"] == "invalid_orders"
    assert "order_date" in r["status_message"]


def test_missing_order_id_key_defaults_to_unknown(spark):
    """T9: order_validator.py:267-269."""
    out = run(spark, [(None, "p", "1", "1", "2024-01-01")])
    assert "unknown" in out
    assert out["unknown"]["target"] == "invalid_orders"


def test_valid_rows_round_half_up(spark):
    """T6: round(q*p, 2) at order_validator.py:215."""
    out = run(spark, [("7", "p", "3", "0.335", "2024-01-01")])
    assert out["7"]["total_price"] == 1.01  # 1.005 rounds away from zero


def test_generator_rows_all_valid(spark):
    """FIXTURES.md §4: every generated row passes T1-T4."""
    from streamprocessing_with_kafka_spark.sources.generator import generate_orders

    gen = generate_orders(spark, 100).select(
        "order_id",
        "product_name",
        F.col("quantity").cast("string"),
        F.col("price").cast("string"),
        "order_date",
    )
    out = route(validate_and_enrich(gen))
    assert out.count() == 100
    assert out.filter(~F.col("is_valid")).count() == 0
    # invariant: total_price == round(q*p, 2) for every row
    bad = out.filter(
        F.abs(F.col("total_price") - F.round(F.col("quantity") * F.col("price"), 2)) > 1e-9
    )
    assert bad.count() == 0
