"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over streamprocessing_with_kafka_spark.plans.registry: every
implemented operator from SURVEY.md §2 is registered there with its Spark
callable and (where SQL-expressible) its DuckDB oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from streamprocessing_with_kafka_spark.plans.registry import registry
from streamprocessing_with_kafka_spark.session import ensure_runtime_confs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's full validate/enrich/route pipeline
    (SURVEY.md §3.2) over the sf0.001 order stream."""
    ensure_runtime_confs(spark)
    q = registry()["flagship_pipeline"]
    return q.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_runtime_confs(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(q.fn) for name, q in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.sql for name, q in registry().items() if q.sql is not None}
