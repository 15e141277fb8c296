"""Parquet lake layout + maintenance: date-partitioned writes, partition-
pruned reads, and small-file compaction.

At 100 TB the table layout IS the query plan: a date-partitioned lake turns
every time-bounded query into a directory prune (zero I/O for excluded
days), and sorting within files gives parquet row-group min/max stats that
prune inside the day. The compactor fixes the operational failure mode of
streaming ingestion -- thousands of tiny files per partition -- which
otherwise drowns the scan in open/footer overhead and breaks split
planning.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from streamprocessing_with_kafka_spark.sources.tables import load_table


def write_events_partitioned(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    """Materialize events as a date-partitioned, user/time-sorted lake.

    `repartition(event_date)` gives one shuffle task per day -> one file
    per partition dir (no small files at write time); `sortWithinPartitions`
    orders rows so row-group stats prune on user_id/ts range predicates.
    """
    e = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    (
        e.repartition("event_date")
        .sortWithinPartitions("user_id", "ts")
        .write.partitionBy("event_date")
        .mode("overwrite")
        .parquet(out_dir)
    )


def read_events_day(spark: SparkSession, lake_dir: str, day: str) -> DataFrame:
    """Day-bounded read; the filter must become a PartitionFilters prune
    (asserted in tests), never a full-lake scan."""
    return spark.read.parquet(lake_dir).filter(F.col("event_date") == day)


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 << 20,
) -> int:
    """Compact a parquet directory into ~target-sized files; returns the
    output file count.

    Sizing reads ONLY filesystem metadata (no data scan). Compaction
    writes to a NEW location and the caller swaps atomically (rename /
    metastore pointer) -- rewriting in place while readers stream the same
    files is how lakes corrupt themselves. Local paths here; on object
    stores the same logic runs against the store's listing API.
    """
    total = 0
    for root, _dirs, files in os.walk(src_dir):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src_dir)
    df.repartition(n_files).write.mode("overwrite").parquet(dst_dir)
    out = 0
    for root, _dirs, files in os.walk(dst_dir):
        out += sum(f.endswith(".parquet") for f in files)
    return out


# ------------------------------------------------------------- Z-ORDER

ZORDER_BITS = 8  # bits per dimension; 2 dims -> 16-bit z-values


def zvalue(cols: list, bits: int = ZORDER_BITS) -> F.Column:
    """Interleave the bits of per-dimension bucket columns into one
    Morton (Z-order) value: bit j of dimension d lands at position
    j * ndim + d. Pure built-in shift/and/or expressions -- the whole
    interleave stays inside whole-stage codegen (no UDF).

    Inputs must already be integer buckets in [0, 2^bits)."""
    ndim = len(cols)
    terms = []
    for d, c in enumerate(cols):
        for j in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(c.cast("long"), j).bitwiseAND(F.lit(1)),
                    j * ndim + d,
                )
            )
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def _quantile_bucket(df: DataFrame, colname: str, bits: int = ZORDER_BITS) -> F.Column:
    """Rank-based bucketing into [0, 2^bits) from approxQuantile
    boundaries (sampled, driver holds 2^bits scalars -- layout config).

    Quantile -- NOT linear min-max -- bucketing is what makes Z-order
    work on skewed data: min-max leaves skewed columns piled into a few
    low buckets whose high-order bits never vary, so the other dimension
    silently dominates the curve and its pruning win evaporates
    (observed: value-overlap fraction 1.0 on the events table). Equal-
    frequency buckets use every bit regardless of distribution -- the
    same reason Delta's OPTIMIZE ZORDER BY range-partitions per column.

    The per-row bucket index is a fold over the boundary array (2^bits
    comparisons, codegen'd) -- fine for a layout job that runs once per
    compaction cycle."""
    n = 1 << bits
    bounds = df.stat.approxQuantile(colname, [i / n for i in range(1, n)], 0.001)
    return F.aggregate(
        F.array(*[F.lit(b) for b in bounds]),
        F.lit(0).cast("long"),
        lambda acc, b: acc + F.when(F.col(colname) >= b, 1).otherwise(0),
    )


def write_events_zordered(
    spark: SparkSession, sf_dir: str, out_dir: str, n_files: int = 8
) -> None:
    """Materialize events Z-ordered on (ts, value): the multi-dimensional
    layout for workloads that range-filter on BOTH time and value.

    A single-key sort gives perfect row-group pruning on that key and
    none on the others (each row group spans the full secondary range).
    Z-order trades a little of each: interleaving quantile-bucket bits
    makes every row group a small hyper-rectangle in (ts, value) rank
    space, so min/max stats prune on either dimension.

    repartitionByRange on the z-value gives each output file a
    contiguous z-range; the within-file sort orders row groups inside
    it. Scale: the only extra costs over a plain rewrite are the
    approxQuantile sample pass and 2^bits comparisons per row."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "_ts_num", F.unix_timestamp("ts").cast("double")
    )
    z = zvalue([_quantile_bucket(e, "_ts_num"), _quantile_bucket(e, "value")])
    (
        e.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", "_ts_num")
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def row_group_overlap_fraction(path_dir: str, column: str, lo, hi) -> float:
    """Fraction of row groups whose [min, max] stats overlap [lo, hi] --
    the I/O a range predicate on `column` cannot skip. Reads parquet
    footers only (the same stats the scan's predicate pushdown uses)."""
    import datetime as _dt

    import pyarrow.parquet as pq

    def _naive(v):
        # parquet timestamp stats come back tz-aware (UTC); session
        # timestamps are naive UTC -- compare in one convention
        if isinstance(v, _dt.datetime) and v.tzinfo is not None:
            return v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v

    lo, hi = _naive(lo), _naive(hi)
    total = overlap = 0
    for root, _dirs, files in os.walk(path_dir):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, f)).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[column]
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                total += 1
                if st is None or st.min is None:
                    overlap += 1  # no stats -> unprunable
                elif not (_naive(st.max) < lo or _naive(st.min) > hi):
                    overlap += 1
    return overlap / max(total, 1)


# ------------------------------------------------- schema evolution

def read_evolved(spark: SparkSession, lake_dir: str) -> DataFrame:
    """Read a lake directory whose files span SCHEMA VERSIONS (a column
    added over time): `mergeSchema` unions the per-file parquet footers
    into one superset schema, with NULLs where an old file lacks a
    column -- the additive-evolution contract a long-lived 100 TB lake
    needs (parquet's default reads ONE random footer, so a query could
    silently lose the new column depending on which file it sampled).

    Cost note: mergeSchema reads every file footer at planning time --
    fine per directory/partition, wasteful lake-wide; production pins
    the merged schema in a catalog and passes it via .schema() instead,
    which this loader accepts as an override for exactly that reason."""
    return spark.read.option("mergeSchema", "true").parquet(lake_dir)
