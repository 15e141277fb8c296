"""Single-pass table profiling: per-column row/null/distinct counts and
min/max -- the data-quality primitive a 100 TB curation pipeline runs
before anything else (schema drift, null explosions, cardinality checks).

The reference has no profiling surface (SURVEY.md §2.6 lists its whole
query surface as `SELECT * FROM enriched_orders`); this is north-star
superset surface alongside the text/dedup operators.

Scale design: ALL columns profile in ONE scan. Nulls and min/max are
plain map-side-combinable aggregates; each exact COUNT(DISTINCT col)
adds a branch to the same Expand-based multi-distinct aggregate (Spark
plans n distinct aggregates as one Expand fan-out of n+1 replicas ->
one shuffle), so the table is still read once -- the shuffle carries
per-column deduped values, not rows x columns. For wide tables or
approximate needs, swap countDistinct for approx_count_distinct and the
Expand disappears (HLL partials merge map-side); kept exact here so the
DuckDB oracle matches bit-for-bit.

min/max compute on the NATIVE type and cast to string afterwards --
casting first would compare "10" < "9" lexicographically. Int and string
casts render identically in Spark and DuckDB (doubles would not; the
profiled tables here carry only int/string columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from streamprocessing_with_kafka_spark.sources.tables import load_table


def profile_frame(df: DataFrame) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_value, max_value) per
    column of `df`, computed in one aggregate pass + one unpivot."""
    cols = df.columns
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"_nulls_{c}"),
            F.countDistinct(F.col(c)).alias(f"_dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    wide = df.agg(*aggs)
    # unpivot the single wide row into one row per column; stack() is a
    # driver-free projection (the wide frame is 1 row)
    stack_args = ", ".join(
        f"'{c}', _nulls_{c}, _dist_{c}, _min_{c}, _max_{c}" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_nulls, n_distinct, min_value, max_value)"
        ),
        F.col("_n_rows").alias("n_rows"),
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")


def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile of the documents table (the curation input)."""
    return profile_frame(load_table(spark, sf_dir, "documents"))


def _col_profile_sql(table: str, c: str) -> str:
    return f"""
  SELECT '{c}' AS column, COUNT(*) AS n_rows,
         COUNT(CASE WHEN {c} IS NULL THEN 1 END) AS n_nulls,
         COUNT(DISTINCT {c}) AS n_distinct,
         CAST(MIN({c}) AS VARCHAR) AS min_value,
         CAST(MAX({c}) AS VARCHAR) AS max_value
  FROM {table}"""


PROFILE_DOCUMENTS_SQL = "\n  UNION ALL\n".join(
    _col_profile_sql("documents", c)
    for c in ["doc_id", "text", "lang", "source", "n_chars"]
)
