"""ORC ingestion surface (format widening beside the JSON/CSV twins).

The reference ingests only JSON-over-Kafka (SURVEY.md §2.1); a lake
engine additionally meets ORC-formatted drops from Hive-era producers.
Spark's ORC reader/writer is native JVM (vectorized, predicate pushdown,
column pruning -- the same scan hygiene as parquet), so "support ORC"
is a round-trip contract, not a parser: rows written to ORC must read
back bit-identically, types preserved.

The registered query materializes a deterministic slice of `orders` to
ORC (once per call, overwrite -- idempotent under driver retries) and
reads it back; the DuckDB oracle computes the same slice straight from
the parquet table, so any loss or coercion in the ORC hop fails the
hash check. Avro would follow the same shape but needs the external
spark-avro package, which this environment does not ship.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from streamprocessing_with_kafka_spark.sources.tables import load_table

#: slice kept small (1/9 of orders) so the round-trip write is a
#: negligible part of any bench/correctness run
ORC_KEY_MOD = 9


def _orc_path(sf_dir: str) -> str:
    """Scratch location keyed on the FULL input path (md5), not just its
    basename -- two datasets that happen to share a trailing directory
    name (or concurrent runs over different roots) must not overwrite
    each other's slice while a lazily-returned reader still references
    the files."""
    key = hashlib.md5(sf_dir.rstrip("/").encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), "spark_graft_orc", key, "orders")


def orc_roundtrip_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the deterministic orders slice to ORC, read it back.

    The write is per-(sf_dir) and mode=overwrite: re-running the query
    (driver retries, bench repeats) redoes the small write instead of
    appending duplicates. Timestamps/dates survive ORC natively; the
    decimal-shaped total rides as double exactly as the parquet source
    carries it."""
    path = _orc_path(sf_dir)
    slice_df = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % ORC_KEY_MOD == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )
    )
    slice_df.write.mode("overwrite").orc(path)
    return spark.read.orc(path)


ORC_ROUNDTRIP_SQL = f"""
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
       o_orderpriority
FROM orders
WHERE o_orderkey % {ORC_KEY_MOD} = 0
"""
