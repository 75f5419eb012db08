"""Deterministic, engine-portable hashing primitives.

Everything here is computable bit-identically in Spark SQL *and* ANSI-ish SQL
(DuckDB), which is what lets MinHash / SimHash / fingerprint operators be
verified against an external oracle. The base primitive is MD5 (the same hash
the reference uses for identity columns, /root/reference/backend/process/
parsing.py:90-92): we take the first 15 hex digits → a 60-bit non-negative
integer. Spark's murmur `hash()`/`xxhash64()` would be faster but has no
cross-engine twin, so the portable path is MD5; a `fast=True` variant using
xxhash64 exists for production-scale runs where no oracle is needed.

MinHash universal-hash family: h_j(x) = (a_j * (x mod P) + b_j) mod P with
P = 4294967311 (smallest prime > 2^32) and pseudo-random odd a_j, b_j < 2^30
derived from a fixed seed — products stay < 2^62, i.e. safe in BIGINT
arithmetic on both engines (no 128-bit ops needed).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Smallest prime above 2^32; keeps (a*h + b) within int64 for a,b < 2^30.
MINHASH_PRIME = 4294967311
_A_SEED = 0x9E3779B1  # golden-ratio constant, fixed so both engines agree
_B_SEED = 0x85EBCA77


def minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal hash family.

    A tiny LCG keyed by fixed seeds — NOT cryptographic, just stable across
    engines and versions (no dependence on Python's `random` module ordering).
    """
    params = []
    a, b = _A_SEED, _B_SEED
    for _ in range(num_hashes):
        a = (a * 1103515245 + 12345) % (1 << 30)
        b = (b * 1103515245 + 12345) % (1 << 30)
        params.append((a | 1, b))  # odd a → bijective-ish over Z_P
    return params


def stable_hash60(col: Column) -> Column:
    """60-bit stable hash of a string column: first 15 hex chars of MD5.

    DuckDB twin: ``CAST(('0x' || substring(md5(x), 1, 15)) AS BIGINT)``.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def stable_hash60_sql(expr: str) -> str:
    """DuckDB SQL string computing the same value as :func:`stable_hash60`."""
    return f"CAST(('0x' || substring(md5({expr}), 1, 15)) AS BIGINT)"


def fast_hash64(col: Column) -> Column:
    """Production-path 64-bit hash (JVM xxhash64, no oracle twin)."""
    return F.xxhash64(col)


def universal_hash(h: Column, a: int, b: int) -> Column:
    """(a * (h mod P) + b) mod P — one MinHash permutation, int64-safe."""
    return (F.lit(a) * (h % F.lit(MINHASH_PRIME)) + F.lit(b)) % F.lit(MINHASH_PRIME)


def universal_hash_sql(h_expr: str, a: int, b: int) -> str:
    """DuckDB twin of :func:`universal_hash`."""
    return f"(({a} * (({h_expr}) % {MINHASH_PRIME}) + {b}) % {MINHASH_PRIME})"
