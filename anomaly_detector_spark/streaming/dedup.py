"""Streaming ingestion dedup: the streaming twin of operators/dedup.py
exact_dedup for a live document feed.

A training-data ingestion stream re-delivers documents (at-least-once
sources, crawler revisits, producer retries). The batch engine dedups
with a hash groupBy (operators/dedup.py:28); the streaming analog is
Spark's native ``dropDuplicatesWithinWatermark``: engine-managed
per-key state keyed by the content fingerprint, evicted once the
watermark passes the retention horizon, so state is bounded by (unique
keys within the watermark window), not by stream length — the property
that lets it run forever at ingest scale.

Keying on sha256(content) (not doc_id) mirrors exact_dedup's semantics:
the FIRST arrival of a content wins; later re-arrivals, whatever their
id, are dropped while the key is in state. Spark shuffles on the key
hash — uniform by construction, skew-free for the same reason the
batch uniqueness check is (see checks/uniqueness.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    stream_df: DataFrame,
    content_col: str = "text",
    ts_col: str = "event_ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exact-dedup a document stream on content hash within a watermark.

    Returns the deduplicated stream (original columns plus the
    ``content_sha`` key). Duplicates arriving within ``watermark`` of
    the first copy are dropped by engine state; a copy arriving AFTER
    the key's state was evicted passes through again — the documented
    at-least-once-window contract (batch exact_dedup over the sink
    output remains the exactness backstop, same layering as the
    manifest's at-least-once violation sink, plans/manifest.py).
    """
    keyed = stream_df.withColumn(
        "content_sha", F.sha2(F.coalesce(F.col(content_col), F.lit("")), 256)
    )
    return keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_sha"]
    )
