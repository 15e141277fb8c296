"""CSV source: the column-parse (from_csv) and file-read (spark.read.csv)
paths share the univocity parser and must produce identical rows for the
same lines -- so the oracle-checked registered query also certifies the
file-source path."""

from pyspark.sql import functions as F

from streamprocessing_with_kafka_spark.sources.csv_source import (
    CSV_FIELDS,
    CSV_OPTIONS,
    csv_lines,
    csv_parse_orders,
)


def test_corrupt_classes_partition_correctly(spark, sf_dir):
    rows = csv_parse_orders(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.raw_key % 31 == 0:
            assert r.is_corrupt and r.order_id == "broken" and r.quantity is None
        elif r.raw_key % 13 == 0:
            assert r.is_corrupt and r.order_id == str(r.raw_key)
            assert r.product_name is not None and r.price is None
        elif r.raw_key % 7 == 0:
            # semantic error: parser accepts it, only the cast nulls it
            assert not r.is_corrupt and r.quantity is None and r.price is not None
        else:
            assert not r.is_corrupt and r.quantity is not None


def test_file_read_path_matches_from_csv(spark, sf_dir, tmp_path):
    lines = csv_lines(spark, sf_dir).orderBy("raw_key").limit(200)
    path = tmp_path / "orders.csv"
    path.write_text("".join(r.line + "\n" for r in lines.collect()))

    from_file = (
        spark.read.schema(f"{CSV_FIELDS}, _corrupt_record STRING")
        .options(**CSV_OPTIONS)
        .csv(str(path))
    )
    from_col = lines.select(
        F.from_csv(
            "line", f"{CSV_FIELDS}, _corrupt_record STRING", CSV_OPTIONS
        ).alias("p")
    ).select("p.*")

    key = lambda r: (r.order_id or "", r.product_name or "", r.quantity or "",
                     r.price or "", r.order_date or "", r._corrupt_record or "")
    assert sorted(map(key, from_file.collect())) == sorted(
        map(key, from_col.collect())
    )
