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
