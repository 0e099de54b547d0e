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


# ---------------------------------------------------------------------------
# Spark-compatible xxhash64 for strings (driver-side twin)
#
# Spark's ``F.xxhash64(string_col)`` is reference XXH64 over the UTF-8 bytes
# with seed 42. Having the same value computable in plain Python lets plan
# construction (e.g. segment bucket pruning, which needs
# pmod(xxhash64(term), n_buckets) for a handful of query terms) run on the
# driver instead of launching a Spark job per query batch.
# Parity is pytest-asserted against F.xxhash64 (test_xxhash64_py_parity).
# ---------------------------------------------------------------------------

_XXP1 = 0x9E3779B185EBCA87
_XXP2 = 0xC2B2AE3D27D4EB4F
_XXP3 = 0x165667B19E3779F9
_XXP4 = 0x85EBCA77C2B2AE63
_XXP5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxhash64_py(s: str | bytes, seed: int = 42) -> int:
    """Reference XXH64 of the UTF-8 bytes, as a SIGNED 64-bit int —
    bit-identical to Spark's ``xxhash64(col)`` for string columns."""
    b = s.encode("utf-8") if isinstance(s, str) else s
    n = len(b)
    i = 0
    if n >= 32:
        v1 = (seed + _XXP1 + _XXP2) & _M64
        v2 = (seed + _XXP2) & _M64
        v3 = seed & _M64
        v4 = (seed - _XXP1) & _M64
        while i + 32 <= n:
            k = int.from_bytes(b[i:i + 8], "little")
            v1 = (_rotl64((v1 + k * _XXP2) & _M64, 31) * _XXP1) & _M64
            k = int.from_bytes(b[i + 8:i + 16], "little")
            v2 = (_rotl64((v2 + k * _XXP2) & _M64, 31) * _XXP1) & _M64
            k = int.from_bytes(b[i + 16:i + 24], "little")
            v3 = (_rotl64((v3 + k * _XXP2) & _M64, 31) * _XXP1) & _M64
            k = int.from_bytes(b[i + 24:i + 32], "little")
            v4 = (_rotl64((v4 + k * _XXP2) & _M64, 31) * _XXP1) & _M64
            i += 32
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl64((v * _XXP2) & _M64, 31) * _XXP1) & _M64
            h = ((h * _XXP1) + _XXP4) & _M64
    else:
        h = (seed + _XXP5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = int.from_bytes(b[i:i + 8], "little")
        h ^= (_rotl64((k * _XXP2) & _M64, 31) * _XXP1) & _M64
        h = ((_rotl64(h, 27) * _XXP1) + _XXP4) & _M64
        i += 8
    if i + 4 <= n:
        k = int.from_bytes(b[i:i + 4], "little")
        h ^= (k * _XXP1) & _M64
        h = ((_rotl64(h, 23) * _XXP2) + _XXP3) & _M64
        i += 4
    while i < n:
        h ^= (b[i] * _XXP5) & _M64
        h = (_rotl64(h, 11) * _XXP1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _XXP2) & _M64
    h ^= h >> 29
    h = (h * _XXP3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def pmod_xxhash64_py(s: str, n: int, seed: int = 42) -> int:
    """Driver-side twin of ``F.pmod(F.xxhash64(col), F.lit(n))``."""
    h = xxhash64_py(s, seed)
    return ((h % n) + n) % n


# ---------------------------------------------------------------------------
# numpy-vectorized xxhash64 FOLD steps (executor-side twin)
#
# Spark's multi-column ``xxhash64(c1, c2, ...)`` folds left to right:
# ``h = 42; for c in cols: h = XXH64.hash<type>(c, seed=h)``. These helpers
# compute one fold step over a whole numpy array at once (seed may be a
# per-element uint64 array), bit-identical to the JVM — which lets a
# hash-derived generator (schemas.distributed_synth_corpus) run as a
# vectorized Arrow kernel instead of an interpreted per-element JVM
# expression. Parity is pytest-asserted against both the scalar twin above
# and F.xxhash64 itself (test_xxhash64_np_fold_parity).
# ---------------------------------------------------------------------------

def _np():
    import numpy as np

    return np


def xxh64_fold_long_np(v, seed):
    """XXH64.hashLong(v, seed): the fold step for a LongType column.
    ``v``: int64 array; ``seed``: uint64 array or scalar. → uint64 array.
    (Wraparound is the hash's arithmetic: numpy only warns about it for
    0-d operands, so scalar inputs go through a 1-element array.)"""
    np = _np()
    U = np.uint64
    v = np.atleast_1d(np.asarray(v))
    k = v.astype(U, copy=True)
    k *= U(_XXP2)
    k = (k << U(31)) | (k >> U(33))
    k *= U(_XXP1)
    h = seed + U((_XXP5 + 8) & _M64)
    h = h ^ k
    h = (h << U(27)) | (h >> U(37))
    h *= U(_XXP1)
    h += U(_XXP4)
    return _xxh64_fmix_np(h)


def xxh64_fold_int_np(v, seed):
    """XXH64.hashInt(v, seed): the fold step for an IntegerType column
    (Java semantics: the int's two's-complement low 32 bits)."""
    np = _np()
    U = np.uint64
    v = np.atleast_1d(np.asarray(v))
    k = (v.astype(np.int64).astype(U) & U(0xFFFFFFFF)) * U(_XXP1)
    h = seed + U((_XXP5 + 4) & _M64)
    h = h ^ k
    h = (h << U(23)) | (h >> U(41))
    h *= U(_XXP2)
    h += U(_XXP3)
    return _xxh64_fmix_np(h)


def xxh64_fold_bytes_np(tag: bytes, seed):
    """XXH64 of a CONSTANT byte string (len < 8) with per-element seeds —
    the fold step for a short string literal column."""
    np = _np()
    U = np.uint64
    n = len(tag)
    if n >= 8:
        raise ValueError("xxh64_fold_bytes_np handles constants < 8 bytes")
    h = seed + U((_XXP5 + n) & _M64)
    i = 0
    if n >= 4:
        k = U((int.from_bytes(tag[:4], "little") * _XXP1) & _M64)
        h = h ^ k
        h = (h << U(23)) | (h >> U(41))
        h *= U(_XXP2)
        h += U(_XXP3)
        i = 4
    for b in tag[i:]:
        h = h ^ U((b * _XXP5) & _M64)
        h = (h << U(11)) | (h >> U(53))
        h *= U(_XXP1)
    return _xxh64_fmix_np(h)


def _xxh64_fmix_np(h):
    np = _np()
    U = np.uint64
    h = h ^ (h >> U(33))
    h *= U(_XXP2)
    h = h ^ (h >> U(29))
    h *= U(_XXP3)
    h = h ^ (h >> U(32))
    return h


def java_abs_np(h):
    """Java ``Math.abs`` on int64 (Long.MIN_VALUE stays negative — numpy
    matches). ``h``: uint64 array → int64 array."""
    np = _np()
    return np.abs(h.view(np.int64) if h.dtype == np.uint64 else h)


def java_mod_np(a, m: int):
    """Java ``%`` (truncated remainder) for an int64 array and a positive
    int divisor — differs from numpy's floor-mod only for negative
    dividends (reachable via abs(Long.MIN_VALUE))."""
    np = _np()
    r = a % m
    neg = a < 0
    if neg.any():
        r = np.where(neg & (r != 0), r - m, r)
    return r
