"""Numeric helpers whose results are bit-identical across engines.

Floating-point summation is order-dependent, and a distributed sum visits
partitions in nondeterministic order -- so any double-sum aggregate would be
irreproducible run-to-run (and vs the DuckDB oracle). `dec_sum` routes the
sum through an exact decimal accumulator and converts back to double at the
end: order-independent, deterministic, and still a single map-side-combinable
JVM aggregate (no perf cliff; decimal sums are codegen'd).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

DEC = "decimal(28,10)"


def dec_sum(col: Column | str) -> Column:
    """Order-independent sum of a double expression via exact decimals."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def dec_sum_sql(expr: str) -> str:
    """DuckDB twin of dec_sum.

    The decimal->double hop goes through VARCHAR: DuckDB's direct
    DECIMAL->DOUBLE cast converts the int128 mantissa first and divides by
    10^scale after (two roundings), while Spark's BigDecimal.doubleValue is
    correctly rounded; the string parse is correctly rounded in both.
    """
    return f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)"


def dec_avg(col: Column | str, count_col: Column) -> Column:
    """avg = decimal-sum / count, divided in double (deterministic)."""
    return dec_sum(col) / count_col.cast("double")


def round_sql(expr: str, n: int) -> str:
    """DuckDB twin of Spark's round() on doubles.

    Spark rounds HALF_UP on the shortest decimal repr of the double
    (BigDecimal.valueOf); DuckDB's native double round disagrees on some
    exact-trailing-5 reprs whose binary value sits just below the half
    (round(0.285, 2): DuckDB 0.28, Spark 0.29). Route through
    VARCHAR -> DECIMAL -> HALF_UP round -> VARCHAR -> DOUBLE: every hop is
    correctly rounded, reproducing Spark bit-for-bit. Non-finite and
    >=1e18 magnitudes pass through unchanged (Spark's round is identity
    there, and they would overflow DECIMAL(38,18))."""
    e = f"({expr})"
    dec = (
        f"CAST(CAST(round(CAST(CAST({e} AS VARCHAR) AS DECIMAL(38,18)), {n}) "
        f"AS VARCHAR) AS DOUBLE)"
    )
    return (
        f"CASE WHEN NOT isfinite({e}) OR abs({e}) >= 1e18 THEN {e} "
        f"ELSE {dec} END"
    )
