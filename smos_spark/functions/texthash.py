"""Portable deterministic hashing shared by dedup/fingerprint/minhash.

`md5_hash64` is bit-identical in Spark and DuckDB (verified):
  Spark : conv(substring(md5(s), 1, 15), 16, 10)::long
  DuckDB: ('0x' || substr(md5(s), 1, 15))::BIGINT
15 hex chars < 2^60 so the value fits signed int64 in both engines —
this is what lets every hash-based operator ship an exact SQL oracle.

For the 100 TB hot path, prefer `fast_hash64` (xxhash64, JVM-native,
~10× cheaper than md5) — same API, no DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: universal-hash modulus. a*h+b stays < 2^63
# for a,b,h < 2^31, so the arithmetic never overflows int64 in either
# engine (DuckDB errors on overflow; Spark silently wraps — both are
# avoided by keeping operands small).
MERSENNE_P = (1 << 31) - 1


def md5_hash64(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_hash64_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def fast_hash64(col: Column) -> Column:
    return F.xxhash64(col)


def universal_hash(h: Column, a: int, b: int) -> Column:
    """(a*h' + b) mod p over h' = h mod p — overflow-safe in both engines."""
    return F.pmod(F.lit(a) * F.pmod(h, F.lit(MERSENNE_P)) + F.lit(b), F.lit(MERSENNE_P))


def universal_hash_sql(h_expr: str, a: int, b: int) -> str:
    p = MERSENNE_P
    return f"(({a} * (({h_expr}) % {p} + {p}) % {p} + {b}) % {p})"


def hash_params(n: int, seed: int = 42) -> list[tuple[int, int]]:
    """n deterministic (a, b) pairs for the universal hash family —
    seeded LCG, no RNG state (reproducible on any executor)."""
    out = []
    x = seed & 0x7FFFFFFF
    for _ in range(n):
        x = (1103515245 * x + 12345) % (1 << 31)
        a = (x % (MERSENNE_P - 1)) + 1
        x = (1103515245 * x + 12345) % (1 << 31)
        b = x % MERSENNE_P
        out.append((a, b))
    return out
