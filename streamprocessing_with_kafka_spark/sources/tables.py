"""Parquet table loaders for the driver-generated testdata.

At 100 TB these reads hit a partitioned parquet lake; everything here is a
plain `spark.read.parquet` so Catalyst applies predicate pushdown, column
pruning and partition pruning with no engine code. The only special case is
`events`, whose parquet files carry TIMESTAMP(NANOS) -- Spark cannot read
that physical type, so we read nanos as long (legacy conf) and convert with
integer arithmetic (`div 1000`, never float division: 2^63-scale nanos lose
microsecond precision in a double).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from streamprocessing_with_kafka_spark.session import ensure_runtime_confs

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos -> microsecond timestamp; integer division keeps precision.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
