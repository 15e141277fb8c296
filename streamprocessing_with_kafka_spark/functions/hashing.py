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


# ---------------------------------------------------------------------------
# Universal hash family: derive P independent hashes from ONE md5.
#
# Hashing the seed-prefixed string P times costs P md5 invocations per row
# (the dominant cost of MinHash signatures -- measured 16x md5 ~= 6s per
# million rows locally). Instead we md5 once and expand with a
# Carter-Wegman family over the Mersenne prime 2^61-1:
#
#     h_p = (a_p * hi(h) + b_p * lo(h) + c_p) mod (2^61 - 1)
#
# where hi/lo are the top/bottom 30 bits of the 60-bit md5 value and
# a_p, b_p, c_p are fixed 30-bit constants. Every product is <= 2^60 and the
# 3-term sum < 2^62, so the arithmetic never overflows a signed 64-bit int
# in either engine (Spark ANSI mode and DuckDB both error on overflow) --
# which is what makes the DuckDB oracle reproduce the exact values.
# ---------------------------------------------------------------------------

MERSENNE61 = (1 << 61) - 1
_LO_MASK = (1 << 30) - 1


def _lcg_consts(n: int, seed: int, bits: int = 30) -> list[int]:
    """Deterministic constants < 2^bits (shared by Spark exprs + oracle SQL)."""
    out, x = [], seed
    mask = (1 << bits) - 1
    for _ in range(n):
        x = (6364136223846793005 * x + 1442695040888963407) % (1 << 63)
        out.append((x >> (62 - bits)) & mask or 1)
    return out


def hash_family(n: int) -> list[tuple[int, int, int, int]]:
    """(xor_mask, a, b, c) per permutation.

    The 60-bit xor mask is applied to the base hash BEFORE the hi/lo split:
    without it, every permutation is linear in the same (hi, lo) pair, so
    the argmin shingle of a document coincides across permutations and LSH
    bands collide far too often (measured 30x the candidate pairs). The
    mask scrambles the ordering of the key space per permutation, restoring
    near-independent minima at zero extra hashing cost.
    """
    return list(
        zip(
            _lcg_consts(n, 7, bits=60),
            _lcg_consts(n, 1),
            _lcg_consts(n, 2),
            _lcg_consts(n, 3),
        )
    )


def family_hashes(col: Column, n: int) -> list[Column]:
    """n independent hashes of a string column from a single md5."""
    return family_hashes_from_h(md5_long(col), n)


def family_hash_one(h: Column, p: int, n: int) -> Column:
    """Permutation p of the n-member family, applied to a 60-bit hash
    column. Usable inside higher-order-function lambdas (array transform),
    which is how the streaming twin computes per-row signature mins."""
    m, a, b, c = hash_family(n)[p]
    hm = h.bitwiseXOR(F.lit(m))
    hi = F.shiftright(hm, 30)
    lo = hm.bitwiseAND(F.lit(_LO_MASK))
    return (F.lit(a) * hi + F.lit(b) * lo + F.lit(c)) % F.lit(MERSENNE61)


def family_hashes_from_h(h: Column, n: int) -> list[Column]:
    """n independent hashes from an already-computed 60-bit hash column."""
    return [family_hash_one(h, p, n) for p in range(n)]


def family_hashes_sql(h_expr: str, n: int) -> list[str]:
    """DuckDB twins of family_hashes; h_expr must be the md5_long_sql value."""
    return [
        f"(({a} * (xor({h_expr}, {m}) >> 30) + {b} * (xor({h_expr}, {m}) & {_LO_MASK})"
        f" + {c}) % {MERSENNE61})"
        for m, a, b, c in hash_family(n)
    ]
