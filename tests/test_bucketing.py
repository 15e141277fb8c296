"""Bucketed co-located join: the fact-to-fact join itself must run with
no Exchange (the one-time bucketed write replaced the per-query shuffle);
only the tiny post-join aggregation may shuffle."""

import re

from streamprocessing_with_kafka_spark.operators.bucketing import (
    bucketed_order_lineitem_join,
)


def test_join_is_exchange_free(spark, sf_dir):
    # at fixture scale Spark would broadcast the filtered orders side,
    # which hides the property under test (broadcast joins never shuffle);
    # disable it to surface the co-located SMJ a fact-to-fact join gets at
    # real scale, where neither side fits in a broadcast.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = bucketed_order_lineitem_join(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    # exactly one exchange: the post-join groupBy on o_orderpriority;
    # the join inputs read pre-bucketed data directly
    exchanges = re.findall(r"Exchange (\w+)", plan)
    assert len(exchanges) == 1, plan
    assert "o_orderpriority" in " ".join(
        l for l in plan.splitlines() if "Exchange" in l
    ), plan


def test_bucketed_join_matches_plain_join(spark, sf_dir):
    from pyspark.sql import functions as F

    from streamprocessing_with_kafka_spark.functions.numeric import dec_sum
    from streamprocessing_with_kafka_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        r["o_orderpriority"]: (r["revenue"], r["n_lines"])
        for r in (
            o.filter(F.col("o_orderstatus") == "O")
            .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderpriority")
            .agg(
                dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                    "revenue"
                ),
                F.count(F.lit(1)).alias("n_lines"),
            )
            .collect()
        )
    }
    bucketed = {
        r["o_orderpriority"]: (r["revenue"], r["n_lines"])
        for r in bucketed_order_lineitem_join(spark, sf_dir).collect()
    }
    assert bucketed == plain
