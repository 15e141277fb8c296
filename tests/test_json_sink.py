"""K4 JSON collection sink: round-trips through the reference's
{"orders": [...]} envelope shape."""

from streamprocessing_with_kafka_spark.sources.json_source import (
    read_order_collection,
    write_order_collection,
)


def test_collection_roundtrip(spark, tmp_path):
    rows = [
        ("1", "a", 2.0, 10.0, "2024-01-01"),
        ("2", "b", 3.0, 5.5, "2024-01-02"),
    ]
    df = spark.createDataFrame(
        rows,
        "order_id string, product_name string, quantity double, "
        "price double, order_date string",
    )
    path = str(tmp_path / "orders.json")
    write_order_collection(df, path)

    back = read_order_collection(spark, path)
    got = sorted(
        (r["order_id"], r["product_name"], r["quantity"], r["price"], r["order_date"])
        for r in back.collect()
    )
    assert got == sorted(rows)
