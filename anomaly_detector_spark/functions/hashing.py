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
