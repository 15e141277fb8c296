"""Unit tests for the cross-engine determinism primitives: the md5-derived
hash family and the order-independent decimal sum."""

import duckdb

from pyspark.sql import functions as F

from streamprocessing_with_kafka_spark.functions.hashing import (
    MERSENNE61,
    family_hashes,
    family_hashes_sql,
    md5_long,
    md5_long_sql,
)
from streamprocessing_with_kafka_spark.functions.numeric import dec_sum


def test_hash_family_matches_duckdb(spark):
    words = [f"w{i}" for i in range(64)]
    df = spark.createDataFrame([(w,) for w in words], "s string")
    got = df.select(
        "s", *[h.alias(f"h{p}") for p, h in enumerate(family_hashes(F.col("s"), 4))]
    ).collect()
    con = duckdb.connect()
    exprs = ", ".join(
        f"{e} AS h{p}" for p, e in enumerate(family_hashes_sql(md5_long_sql("s"), 4))
    )
    oracle = {
        r[0]: r[1:]
        for r in con.execute(
            f"SELECT s, {exprs} FROM (SELECT unnest(?) AS s)", [words]
        ).fetchall()
    }
    for row in got:
        assert tuple(row[f"h{p}"] for p in range(4)) == oracle[row["s"]]
        for p in range(4):
            assert 0 <= row[f"h{p}"] < MERSENNE61


def test_hash_family_permutations_disagree(spark):
    """The per-permutation xor masks must decorrelate the minima: over a
    set of keys, different permutations pick different argmins."""
    words = [(f"key-{i}",) for i in range(200)]
    df = spark.createDataFrame(words, "s string")
    hs = family_hashes(F.col("s"), 8)
    mins = df.select(
        *[F.min_by("s", h).alias(f"arg{p}") for p, h in enumerate(hs)]
    ).collect()[0]
    argmins = {mins[f"arg{p}"] for p in range(8)}
    assert len(argmins) >= 6  # near-independent minima, not one shared argmin


def test_dec_sum_is_partition_order_independent(spark):
    vals = [(0.1,)] * 1000 + [(1e15,), (-1e15,)]
    df = spark.createDataFrame(vals, "v double")
    a = df.repartition(1).agg(dec_sum("v").alias("s")).collect()[0]["s"]
    b = df.repartition(32).agg(dec_sum("v").alias("s")).collect()[0]["s"]
    c = df.orderBy(F.rand(7)).repartition(7).agg(dec_sum("v").alias("s")).collect()[0]["s"]
    assert a == b == c  # bit-identical, not just close
