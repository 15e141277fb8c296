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
