"""Evidence dump: one PageRank round's compiled plan under both mass-
aggregate strategies (plans/r13/graph_pagerank_round_{combine,pin}.txt).
The full query's explain is post-checkpoint (the rounds run eagerly), so
the per-round plan is dumped from the factored _pagerank_round helper."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
from pyspark.sql import functions as F  # noqa: E402

from streamprocessing_with_kafka_spark.operators.graph import (  # noqa: E402
    _pagerank_round,
    cooccurrence_edges,
)
from streamprocessing_with_kafka_spark.session import get_spark  # noqa: E402
from streamprocessing_with_kafka_spark.sources.tables import load_table  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("r13pagerankplan")
spark.sparkContext.setLogLevel("ERROR")

ev = load_table(spark, SF, "events")
e = cooccurrence_edges(ev)
directed = e.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
    e.select(F.col("v").alias("src"), F.col("u").alias("dst"))
)
deg = directed.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
n_row = deg.agg(F.count(F.lit(1)).alias("n"))
ranks = deg.join(F.broadcast(n_row)).select(
    "src", "degree", F.round(1.0 / F.col("n"), 6).alias("pr")
)
p = spark.sparkContext.defaultParallelism
for combine, tag in [(True, "combine"), (False, "pin")]:
    df = _pagerank_round(directed, deg, n_row, ranks, p, combine)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    out = f"plans/r13/graph_pagerank_round_{tag}.txt"
    with open(out, "w") as f:
        f.write(plan)
    print(f"wrote {out}: partial_sum_lines={plan.count('partial_sum')} "
          f"repartition_by_num={plan.count('REPARTITION_BY_NUM')}")
spark.stop()
