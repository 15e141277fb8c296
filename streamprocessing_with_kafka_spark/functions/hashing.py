"""Cross-engine deterministic hashing built on md5.

Spark's xxhash64/hash have no DuckDB counterpart, so every hash the oracle
must reproduce is derived from md5 (identical hex output in both engines).
`md5_long` maps a string to a uniform non-negative 60-bit integer by taking
the first 15 hex chars -- the primitive under MinHash signatures, SimHash
bit mixing, LSH band keys and the deterministic fake multimodal decoder.

Scale note: md5 is ~3x slower than xxhash64 but still JVM-side and
codegen'd; at 100 TB the hash cost is dwarfed by the shuffle it feeds. A
production deployment free of the oracle-parity constraint would swap in
xxhash64 via this one module.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def md5_long(col: Column) -> Column:
    """String -> uniform int in [0, 2^60): first 15 md5 hex chars."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def md5_long_sql(expr: str) -> str:
    """DuckDB twin of md5_long."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def seeded(seed: int, col: Column) -> Column:
    """Seed-prefixed hash input, for independent hash families."""
    return F.concat(F.lit(f"{seed}|"), col)


def seeded_sql(seed: int, expr: str) -> str:
    return f"('{seed}|' || {expr})"
