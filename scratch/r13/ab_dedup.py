"""In-session interleaved A/B: join vs fused pair generation for the
capped/uncapped shingle pair search and the minhash band candidates.
Interleaving (ABAB...) cancels box-load drift that poisons cross-session
comparisons."""
import sys
import time

sys.path.insert(0, ".")
from pyspark.sql import functions as F  # noqa: E402

from streamprocessing_with_kafka_spark.functions.lineage import (  # noqa: E402
    drain_ephemeral_checkpoints,
)
from streamprocessing_with_kafka_spark.operators import dedup  # noqa: E402
from streamprocessing_with_kafka_spark.session import get_spark  # noqa: E402

spark = get_spark("ab_dedup")
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"
RUNS = 6
CAP = dedup.CAPPED_MAX_SHINGLE_DF


def sh():
    return dedup._shingles_with_count(spark, SF)


def jac(inter):
    return (
        inter.withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"), 6),
        )
        .filter(F.col("jaccard") >= 0.8)
        .select("doc_a", "doc_b", "jaccard")
    )


def capped_join():
    s = sh()
    keep = (
        s.groupBy("_h").agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= CAP).select("_h")
    )
    return jac(dedup._pair_intersections(s.join(keep, "_h")))


def capped_fused():
    return jac(dedup._pair_intersections_fused(sh(), CAP))


def uncapped_join():
    return jac(dedup._pair_intersections(sh()))


def uncapped_fused():
    s = sh()
    pe = dedup._group_pair_explode(s, ["_h"], F.struct("doc_id", "n"))
    inter = (
        pe.select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
            F.col("a.n").alias("na"), F.col("b.n").alias("nb"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"), F.first("na").alias("na"), F.first("nb").alias("nb"))
    )
    return jac(inter)


def mh_cand_join():
    s = sh()
    bands = dedup._band_keys(dedup._signature_agg(s))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return dedup.verify_jaccard_pairs(cand, s, s, "doc_a", "doc_b", 0.7)


def mh_cand_fused():
    s = sh()
    bands = dedup._band_keys(dedup._signature_agg(s))
    cand = (
        dedup._group_pair_explode(bands, ["band", "band_key"], F.col("doc_id"))
        .select(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"))
        .distinct()
    )
    return dedup.verify_jaccard_pairs(cand, s, s, "doc_a", "doc_b", 0.7)


PAIRS = [
    ("capped", capped_join, capped_fused),
    ("uncapped", uncapped_join, uncapped_fused),
    ("minhash", mh_cand_join, mh_cand_fused),
]

# warm lap
for _, a, b in PAIRS:
    for fn in (a, b):
        fn().write.format("noop").mode("overwrite").save()
        drain_ephemeral_checkpoints()

for name, a, b in PAIRS:
    ta, tb = [], []
    for _ in range(RUNS):
        for fn, acc in ((a, ta), (b, tb)):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            acc.append(time.time() - t0)
            drain_ephemeral_checkpoints()
    print(
        f"{name}: join min={min(ta):.3f} med={sorted(ta)[RUNS//2]:.3f} | "
        f"fused min={min(tb):.3f} med={sorted(tb)[RUNS//2]:.3f}",
        flush=True,
    )
spark.stop()
