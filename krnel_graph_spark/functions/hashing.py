"""Cross-engine deterministic hashing.

``xxhash64`` is Spark-only; these md5-based helpers compute bit-identical
values in Spark SQL and DuckDB SQL, which lets hash-dependent operators
(MinHash, hash splits, fingerprints) be verified against a DuckDB oracle.

``md5_long(s)`` = first 15 hex chars of md5 as a bigint (60 bits, positive).
Spark:  ``conv(substring(md5(s), 1, 15), 16, 10)`` cast to long.
DuckDB: ``CAST('0x' || substring(md5(s), 1, 15) AS BIGINT)``.

MinHash permutations use universal hashing ``(a·(h mod M) + b) mod P`` with
all intermediates < 2^63 so int64 arithmetic never overflows in either
engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Keep a·M + b < 2^63: M = 1e9, a < 9.2e8.
MOD_INPUT = 1_000_000_000
MERSENNE_P = 2_147_483_647  # 2^31 - 1
_A_STEP = 1_000_003
_B_STEP = 999_331


def md5_long(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    """DuckDB rendering of :func:`md5_long` for oracle queries."""
    return f"CAST(('0x' || substring(md5({expr}), 1, 15)) AS BIGINT)"


def perm_params(i: int) -> tuple[int, int]:
    """Deterministic universal-hash parameters for permutation ``i``."""
    a = (_A_STEP * i + 12_345) % (MOD_INPUT - 1) | 1
    b = (_B_STEP * i + 42) % MERSENNE_P
    return a, b


def permute(h: Column, i: int) -> Column:
    a, b = perm_params(i)
    return (F.lit(a) * (h % F.lit(MOD_INPUT)) + F.lit(b)) % F.lit(MERSENNE_P)


def permute_sql(expr: str, i: int) -> str:
    a, b = perm_params(i)
    return f"(({a} * (({expr}) % {MOD_INPUT}) + {b}) % {MERSENNE_P})"
