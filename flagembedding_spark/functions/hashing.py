"""Cross-engine-stable hashing primitives.

Everything here is defined so the SAME value is computable in Spark SQL,
DuckDB (the driver's oracle engine), and plain Python — which makes hash-based
operators (minhash, simhash, fingerprints) verifiable against an independent
engine instead of rows-only checks.

Base hash: the first 15 hex chars of md5 interpreted as a 60-bit integer.
  Spark : conv(substring(md5(s), 1, 15), 16, 10) :: long
  DuckDB: CAST('0x' || substring(md5(s), 1, 15) AS BIGINT)
  Python: int(hashlib.md5(s).hexdigest()[:15], 16)

MinHash permutations: h_j(x) = (a_j * (base(x) % P) + b_j) % P with
P = 2^31 - 1 and seeded (a_j, b_j) constants < 2^20, so every product stays
< 2^51 — exact in int64/BIGINT arithmetic everywhere.
"""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = (1 << 31) - 1


def md5_prefix_long(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_prefix_long_py(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def md5_prefix_long_sql(expr: str) -> str:
    """DuckDB expression for the same value."""
    return f"CAST('0x' || substring(md5({expr}), 1, 15) AS BIGINT)"


def minhash_params(n_perms: int, seed: int = 1337) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [
        (rng.randrange(1, 1 << 20), rng.randrange(0, 1 << 20))
        for _ in range(n_perms)
    ]


def perm_hash(base: Column, a: int, b: int) -> Column:
    return (F.lit(a) * (base % MERSENNE_P) + F.lit(b)) % MERSENNE_P


def perm_hash_sql(base_expr: str, a: int, b: int) -> str:
    return f"(({a} * ({base_expr} % {MERSENNE_P}) + {b}) % {MERSENNE_P})"
