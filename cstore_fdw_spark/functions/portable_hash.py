"""Portable cross-engine hashing: identical 64-bit-safe hash values in
Spark SQL and DuckDB SQL.

The hash-signature operators (MinHash/LSH, SimHash, winnowing, seeded
sampling) were rows-only in round 1 because they used ``xxhash64``, whose
value is Spark-specific.  The portable scheme replaces it with arithmetic
on MD5 — bit-identical in every engine — so the driver's DuckDB oracle can
recompute the exact same signatures:

- ``h60(s)``  — first 15 hex chars of ``md5(s)`` as a BIGINT (60 bits,
  always positive, fits int64 in both engines).
  Spark:  ``cast(conv(substring(md5(cast(s as binary)),1,15),16,10) as bigint)``
  DuckDB: ``CAST('0x' || substr(md5(s),1,15) AS BIGINT)``
  (verified byte-for-byte identical, incl. UTF-8 multibyte input).
- ``w32(s,i)`` — the i-th 8-hex-char window as a 32-bit word, for when
  independent words of the same digest are needed (SimHash bit planes,
  MinHash base value).
- MinHash uses classic universal hashing h_i(x) = (a_i·x + b_i) mod p with
  p = 2^31−1 and per-i constants a_i,b_i < p derived (deterministically,
  no RNG state) from MD5 of the index — all products < 2^62, so the
  arithmetic is exact int64 in both engines, no overflow semantics in play.

Everything here returns SQL *strings* (Spark flavor and DuckDB flavor) so
operators can fuse them into single-pass JVM projections and the oracle
generator can emit the textually-parallel DuckDB form.
"""

from __future__ import annotations

import hashlib

#: Mersenne prime 2^31−1: modulus for universal-hash families. Products
#: a·x with a,x < P31 stay below 2^62 — exact in int64 on both engines.
P31 = 2_147_483_647


def spark_h60(expr: str) -> str:
    """60-bit portable hash of a Spark SQL string expression."""
    return (f"cast(conv(substring(md5(cast(({expr}) as binary)), 1, 15),"
            f" 16, 10) as bigint)")


def duck_h60(expr: str) -> str:
    """DuckDB twin of :func:`spark_h60` (same value, bit for bit)."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def spark_w32(expr: str, i: int) -> str:
    """i-th 32-bit word (i in 0..3) of md5 as BIGINT — Spark flavor."""
    return (f"cast(conv(substring(md5(cast(({expr}) as binary)),"
            f" {1 + 8 * i}, 8), 16, 10) as bigint)")


def duck_w32(expr: str, i: int) -> str:
    """i-th 32-bit word (i in 0..3) of md5 as BIGINT — DuckDB flavor."""
    return f"CAST('0x' || substr(md5({expr}), {1 + 8 * i}, 8) AS BIGINT)"


def _const(tag: str, lo: int, hi: int) -> int:
    """Deterministic constant in [lo, hi] from MD5 of the tag (no RNG)."""
    v = int(hashlib.md5(tag.encode()).hexdigest()[:15], 16)
    return lo + v % (hi - lo + 1)


def minhash_coeffs(n: int) -> list[tuple[int, int]]:
    """n universal-hash (a_i, b_i) pairs, a_i in [1, P31−1], b_i in [0, P31−1].

    Fixed for all time (MD5-derived): the same constants are baked into the
    Spark projection and the generated DuckDB oracle.
    """
    return [(_const(f"cstore-minhash-a-{i}", 1, P31 - 1),
             _const(f"cstore-minhash-b-{i}", 0, P31 - 1))
            for i in range(n)]


#: multipliers for the two 31-bit polynomial band-key accumulators; both
#: < 2^20, so every intermediate (acc % P31) * C + v stays < 2^51 —
#: exact int64 arithmetic in both engines.
POLY_C1 = 1_000_003
POLY_C2 = 999_983


def band_key_sql(elems: list[str]) -> str:
    """62-bit band key from signature words by pure integer arithmetic —
    engine-neutral SQL (no hashing, no string rendering): two Horner
    polynomials mod P31 with independent multipliers, packed as
    ``hi * 2^31 + lo``. Collision probability between two distinct band
    slices is ~2^-62, vs the 2^-60 of the md5-based key it replaces,
    while skipping a per-band VARCHAR render + md5 in the hot path.
    ``elems`` are SQL expressions for the slice's signature words (each
    value already < P31)."""
    def poly(c: int) -> str:
        e = f"({elems[0]})"
        for nxt in elems[1:]:
            e = f"((({e}) * {c} + ({nxt})) % {P31})"
        return e
    return f"({poly(POLY_C1)}) * 2147483648 + ({poly(POLY_C2)})"
