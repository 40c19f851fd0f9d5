"""Hashing utilities: the per-row sha256(content) invariant.

The reference content-addresses its filters with sha256 hex digests
(/root/reference/util/__init__.py:106-107 ``hash_str``). The engine
keeps that as a per-row invariant: ``F.sha2(content, 256)`` must equal a
hashlib oracle for every row. ``F.sha2`` is JVM-side and codegen'd — a
narrow map with no shuffle, safe at any scale.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_content_sha(df: DataFrame, col: str = "content", out: str = "content_sha256") -> DataFrame:
    return df.withColumn(out, F.sha2(F.col(col), 256))


def sha256_oracle(s: str | None) -> str | None:
    """Driver/test-side oracle matching F.sha2(col, 256) semantics (NULL -> NULL)."""
    if s is None:
        return None
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


# ------------------------------------------------------------------ XXH64
# Pure-Python reference implementation of the public XXH64 algorithm
# (Yann Collet, BSD — constants and steps from the published spec).
# Verified bit-exact against Spark's F.xxhash64 (seed 42) across empty /
# sub-stripe / multi-stripe inputs; used as the INDEPENDENT oracle for
# xxhash64-based operators that no SQL engine can re-derive.

_M64 = (1 << 64) - 1
_P1, _P2, _P3, _P4, _P5 = (
    11400714785074694791,
    14029467366897019727,
    1609587929392839161,
    9650029242287828579,
    2870177450012600261,
)


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, inp: int) -> int:
    return (_rotl((acc + inp * _P2) & _M64, 31) * _P1) & _M64


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 of ``data`` as a SIGNED 64-bit int, default seed 42 —
    exactly ``F.xxhash64(string_col)`` on the UTF-8 bytes."""
    n, i = len(data), 0
    if n >= 32:
        v1, v2, v3, v4 = (
            (seed + _P1 + _P2) & _M64,
            (seed + _P2) & _M64,
            seed & _M64,
            (seed - _P1) & _M64,
        )
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h
