"""In-session A/B: r12 wedge-join triangle counting vs adjacency-array
edge-intersection (compact-forward). Checks result equality first, then
interleaved timing."""
import sys
import time

sys.path.insert(0, ".")
from pyspark.sql import functions as F  # noqa: E402

from streamprocessing_with_kafka_spark.operators.graph import triangle_clustering  # noqa: E402
from streamprocessing_with_kafka_spark.operators.graph import cooccurrence_edges  # noqa: E402
from streamprocessing_with_kafka_spark.session import get_spark  # noqa: E402
from streamprocessing_with_kafka_spark.sources.tables import load_table  # noqa: E402

spark = get_spark("ab_tri")
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"
p = spark.sparkContext.defaultParallelism


def new_formulation():
    ev = load_table(spark, SF, "events")
    e = cooccurrence_edges(ev)
    degree = (
        e.select(F.col("u").alias("user_id")).unionAll(e.select(F.col("v").alias("user_id")))
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("degree"))
    )
    ed = (
        e.join(degree.select(F.col("user_id").alias("u"), F.col("degree").alias("du")), "u")
        .join(degree.select(F.col("user_id").alias("v"), F.col("degree").alias("dv")), "v")
    )
    u_first = (F.col("du") < F.col("dv")) | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    d = ed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("t"),
    ).localCheckpoint()
    adj = d.groupBy("s").agg(F.collect_list("t").alias("nbr"))
    dd = (
        d.repartition(p)
        .join(F.broadcast(adj), "s")
        .join(
            F.broadcast(adj.select(F.col("s").alias("t"), F.col("nbr").alias("nbr_t"))),
            "t",
            "left",
        )
        .select(
            "s",
            "t",
            F.array_intersect(
                F.col("nbr"), F.coalesce(F.col("nbr_t"), F.array())
            ).alias("zs"),
        )
    )
    per_edge = dd.select("s", "t", F.col("zs"), F.size("zs").alias("cnt")).filter(F.col("cnt") > 0)
    contribs = (
        per_edge.select(F.col("s").alias("user_id"), F.col("cnt").alias("c"))
        .unionAll(per_edge.select(F.col("t").alias("user_id"), F.col("cnt").alias("c")))
        .unionAll(per_edge.select(F.explode("zs").alias("user_id"), F.lit(1).alias("c")))
    )
    tri_per_user = contribs.groupBy("user_id").agg(F.sum("c").alias("n_triangles"))
    lcc = F.when(
        F.col("degree") >= 2,
        F.round(
            2.0 * F.coalesce("n_triangles", F.lit(0)).cast("double")
            / (F.col("degree") * (F.col("degree") - 1)).cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return degree.join(tri_per_user, "user_id", "left").select(
        "user_id",
        "degree",
        F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
        lcc.alias("clustering_coeff"),
    )


def old_formulation():
    return triangle_clustering(spark, SF)


# equality check at sf0.01 to be quick, then sf0.1
SF = "/root/testdata/sf0.01"
a = old_formulation().orderBy("user_id").collect()
b = new_formulation().orderBy("user_id").collect()
assert len(a) == len(b), (len(a), len(b))
for ra, rb in zip(a, b):
    assert ra == rb, (ra, rb)
print(f"equal at sf0.01: {len(a)} rows", flush=True)

SF = "/root/testdata/sf0.1"
# warm
new_formulation().write.format("noop").mode("overwrite").save()
old_formulation().write.format("noop").mode("overwrite").save()

to, tn = [], []
for i in range(3):
    t0 = time.time(); old_formulation().write.format("noop").mode("overwrite").save(); to.append(time.time() - t0)
    t0 = time.time(); new_formulation().write.format("noop").mode("overwrite").save(); tn.append(time.time() - t0)
    print(f"round {i}: old={to[-1]:.2f} new={tn[-1]:.2f}", flush=True)
print(f"old min={min(to):.2f} | new min={min(tn):.2f}")
spark.stop()
