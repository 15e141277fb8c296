"""Lake layout + maintenance: partitioned writes must prune on read, and
compaction must shrink file counts without changing the data."""

import os
import re

from pyspark.sql import functions as F

from streamprocessing_with_kafka_spark.sources.lake import (
    compact_parquet,
    read_events_day,
    write_events_partitioned,
)
from streamprocessing_with_kafka_spark.sources.tables import load_table


def _plan(spark, df, mode="formatted"):
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def test_partitioned_write_and_prune(spark, sf_dir, tmp_path):
    lake = str(tmp_path / "events_lake")
    write_events_partitioned(spark, sf_dir, lake)

    # hive-style partition dirs, one file per day (repartition by the
    # partition column prevents small files)
    days = [d for d in os.listdir(lake) if d.startswith("event_date=")]
    assert len(days) >= 2
    for d in days:
        files = [
            f for f in os.listdir(os.path.join(lake, d)) if f.endswith(".parquet")
        ]
        assert len(files) == 1, (d, files)

    # no rows lost or duplicated
    src = load_table(spark, sf_dir, "events")
    assert spark.read.parquet(lake).count() == src.count()

    # the day filter must be a partition prune, not a data filter
    day = days[0].split("=", 1)[1]
    df = read_events_day(spark, lake, day)
    plan = _plan(spark, df)
    m = re.search(r"PartitionFilters: \[[^\]]*event_date[^\]]*\]", plan)
    assert m, plan
    expect = (
        src.withColumn("event_date", F.to_date("ts"))
        .filter(F.col("event_date") == day)
        .count()
    )
    assert df.count() == expect > 0


def test_compaction_shrinks_file_count_preserving_data(spark, sf_dir, tmp_path):
    src, dst = str(tmp_path / "frag"), str(tmp_path / "compact")
    events = load_table(spark, sf_dir, "events")
    events.repartition(40).write.parquet(src)
    frag_files = sum(
        f.endswith(".parquet") for f in os.listdir(src)
    )
    assert frag_files >= 30  # genuinely fragmented input

    out_files = compact_parquet(spark, src, dst)
    assert out_files < frag_files / 10

    a = sorted(r["event_id"] for r in spark.read.parquet(src).collect())
    b = sorted(r["event_id"] for r in spark.read.parquet(dst).collect())
    assert a == b


def test_zvalue_matches_reference_interleave(spark):
    """Morton interleave built from shift/and/or must equal a plain
    Python bit-interleave on known buckets."""
    from streamprocessing_with_kafka_spark.sources.lake import ZORDER_BITS, zvalue

    def ref(a, b):
        out = 0
        for j in range(ZORDER_BITS):
            out |= ((a >> j) & 1) << (2 * j)
            out |= ((b >> j) & 1) << (2 * j + 1)
        return out

    cases = [(0, 0), (1, 0), (0, 1), (7, 3), (255, 0), (0, 255), (123, 201)]
    df = spark.createDataFrame(cases, "a long, b long").withColumn(
        "z", zvalue([F.col("a"), F.col("b")])
    )
    for r in df.collect():
        assert r["z"] == ref(r["a"], r["b"]), (r["a"], r["b"])


def test_zorder_prunes_both_dimensions(spark, sf_dir, tmp_path):
    """A ts-sorted layout prunes ts ranges but NOT value ranges (every
    file spans the full value domain); the Z-ordered layout makes files
    hyper-rectangles, so a narrow value predicate skips most of them.
    Measured from the same parquet footer stats the scan's pushdown uses."""
    from streamprocessing_with_kafka_spark.sources.lake import (
        row_group_overlap_fraction,
        write_events_zordered,
    )

    linear, zordered = str(tmp_path / "linear"), str(tmp_path / "zorder")
    e = load_table(spark, sf_dir, "events")
    (
        e.repartitionByRange(8, "ts")
        .sortWithinPartitions("ts")
        .write.parquet(linear)
    )
    write_events_zordered(spark, sf_dir, zordered, n_files=8)
    assert spark.read.parquet(zordered).count() == e.count()

    # narrow value band: the middle 10% of the RANK distribution (rank,
    # not span: quantile bucketing lays out files in rank space, and a
    # span-based band would cover a skew-dependent rank fraction)
    lo, hi = e.stat.approxQuantile("value", [0.45, 0.55], 0.0)

    lin_frac = row_group_overlap_fraction(linear, "value", lo, hi)
    z_frac = row_group_overlap_fraction(zordered, "value", lo, hi)
    # ts-sorted files all overlap the value band; z-order must skip some
    assert lin_frac >= 0.99, lin_frac
    assert z_frac <= 0.75, z_frac

    # and z-order still prunes on ts: a narrow time slice must not touch
    # every file. Off-center band (10-20% rank): a median-centered band
    # straddles the highest ts bit boundary, which every file's half-range
    # legitimately overlaps -- the curve prunes boxes, not boundary bands.
    t0, t1 = (
        e.select(F.unix_timestamp("ts").cast("double").alias("t"))
        .stat.approxQuantile("t", [0.10, 0.20], 0.0)
    )
    import datetime as dt

    t0 = dt.datetime.fromtimestamp(t0, dt.timezone.utc).replace(tzinfo=None)
    t1 = dt.datetime.fromtimestamp(t1, dt.timezone.utc).replace(tzinfo=None)
    zt_frac = row_group_overlap_fraction(zordered, "ts", t0, t1)
    assert zt_frac <= 0.75, zt_frac


def test_read_evolved_unions_schema_versions(spark, tmp_path):
    """Two schema generations in one directory: mergeSchema must surface
    the superset schema with NULLs for the missing column, and a plain
    default read demonstrates why the helper exists (it may drop the
    late column depending on footer sampling)."""
    from streamprocessing_with_kafka_spark.sources.lake import read_evolved

    lake = str(tmp_path / "lake")
    spark.createDataFrame(
        [(1, 10.0)], "id long, value double"
    ).write.mode("append").parquet(lake)
    spark.createDataFrame(
        [(2, 20.0, "eu")], "id long, value double, region string"
    ).write.mode("append").parquet(lake)

    got = read_evolved(spark, lake)
    assert set(got.columns) == {"id", "value", "region"}
    rows = {r.id: r for r in got.collect()}
    assert rows[1].region is None and rows[2].region == "eu"
    assert rows[1].value == 10.0 and rows[2].value == 20.0
