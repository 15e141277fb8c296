"""Seeded synthetic order generator (SURVEY.md §2.1 S5).

The reference generates 100 random orders with a 3-part product name,
quantity 1-100, price 100-2000 (2dp) and a date in 2000-01-01..now
(reference: src/data/random_orders_generator.py:27-60). Spark's rand(seed)
and DuckDB's random() draw from different PRNGs, so instead of an RNG this
generator derives every field from an explicit LCG over the row index --
pure integer arithmetic that is identical in both engines, making even the
"random" generator DuckDB-oracle-checkable and the fixtures reproducible
bit-for-bit anywhere.

Scale note: `spark.range(n)` is an embarrassingly parallel source;
generation at any size is a narrow map with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

LCG_A = 1103515245
LCG_C = 12345
LCG_M = 2**31

# own word lists (the 3-part-name *shape* follows the reference; words are ours)
ADJECTIVES = ["autonomous", "portable", "modular", "wireless", "compact", "rugged", "smart", "hybrid"]
MATERIALS = ["steel", "carbon", "titanium", "polymer", "aluminum", "ceramic", "graphene", "copper"]
PRODUCTS = ["drone", "sensor", "robot", "actuator", "controller", "gateway", "camera", "battery"]

FIELDS = 8  # channel stride so each field gets an independent LCG stream
DATE_SPAN_DAYS = 9497  # 2000-01-01 .. ~2025-12-31, mirroring the reference span


def _h(i: Column, k: int) -> Column:
    """LCG channel k at row i (non-negative, < 2^31)."""
    return (F.lit(LCG_A) * (i * FIELDS + k) + LCG_C) % F.lit(LCG_M)


def _h_sql(k: int) -> str:
    return f"(({LCG_A} * (i * {FIELDS} + {k}) + {LCG_C}) % {LCG_M})"


def _pick(words: list[str], h: Column) -> Column:
    return F.element_at(F.array(*[F.lit(w) for w in words]), (h % len(words) + 1).cast("int"))


def _pick_sql(words: list[str], h: str) -> str:
    lst = "[" + ", ".join(f"'{w}'" for w in words) + "]"
    return f"({lst})[{h} % {len(words)} + 1]"


def generate_orders(spark: SparkSession, n: int = 100) -> DataFrame:
    i = F.col("id")
    return spark.range(n).select(
        (i + 1).cast("string").alias("order_id"),
        F.concat_ws(
            " ", _pick(ADJECTIVES, _h(i, 1)), _pick(MATERIALS, _h(i, 2)), _pick(PRODUCTS, _h(i, 3))
        ).alias("product_name"),
        (_h(i, 4) % 100 + 1).alias("quantity"),
        F.round((_h(i, 5) % 190001) / F.lit(100.0) + 100.0, 2).alias("price"),
        F.date_format(
            F.date_add(F.lit("2000-01-01").cast("date"), (_h(i, 6) % DATE_SPAN_DAYS).cast("int")),
            "yyyy-MM-dd",
        ).alias("order_date"),
    )


def generator_sql(n: int = 100) -> str:
    return f"""
SELECT
  CAST(i + 1 AS VARCHAR) AS order_id,
  {_pick_sql(ADJECTIVES, _h_sql(1))} || ' ' || {_pick_sql(MATERIALS, _h_sql(2))}
    || ' ' || {_pick_sql(PRODUCTS, _h_sql(3))} AS product_name,
  {_h_sql(4)} % 100 + 1 AS quantity,
  round({_h_sql(5)} % 190001 / CAST(100.0 AS DOUBLE) + 100.0, 2) AS price,
  strftime(DATE '2000-01-01' + CAST({_h_sql(6)} % {DATE_SPAN_DAYS} AS INTEGER), '%Y-%m-%d') AS order_date
FROM range(0, {n}) t(i)
"""
