"""Watermarked event-time windowed stats — T4 in its native streaming form.

The reference drops events older than a fixed horizon before updating
state (/root/reference/algo/operator.py:156-157). The batch engine keeps
that as ``with_staleness_filter``; THIS module is the Structured
Streaming-native expression: an event-time watermark bounds both the
state kept for open windows and the lateness tolerated, and rows older
than the watermark are dropped by the engine itself — the same contract,
enforced by checkpointed stream state instead of a filter constant.

Output (append mode) emits each (window, partition) stats row exactly
once, when the watermark passes the window end — the streaming analog of
the batch per-partition stats check over a time-bucketed table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_stats_stream(
    stream_df: DataFrame,
    ts_col: str = "ts",
    partition_col: str = "lang",
    col: str = "content",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-(event-time window, partition) stats with late-data bounds.

    All aggregates are mergeable (count / sum / min / max / HLL), so the
    state per open window is O(1) and partial aggregation applies — the
    same shuffle discipline as the batch stats check
    (checks/stats.py), just keyed by (window, partition).
    """
    length = F.length(F.col(col))
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col(partition_col))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col(col).isNull().cast("long")).alias("n_null"),
            F.min(length).alias("min_len"),
            F.max(length).alias("max_len"),
            F.approx_count_distinct(F.col(col)).alias("distinct_content"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            F.col(partition_col).cast("string").alias("partition_key"),
            "n_rows",
            "n_null",
            "min_len",
            "max_len",
            "distinct_content",
        )
    )
