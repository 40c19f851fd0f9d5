"""Bucketized interval join: points-in-ranges without a nested-loop join.

The generic "point BETWEEN start AND end" join is a non-equi predicate;
Spark's only native physical strategies for it are BroadcastNestedLoopJoin
(O(|points| x |intervals|) comparisons, broadcast side must fit in memory)
or a cartesian product — both non-starters at 100 TB. The classic
distributed rewrite (used by every warehouse range-join optimizer, e.g.
the published Databricks range-join hint semantics) turns it into an
EQUI-join on coarse time buckets:

* each point maps to exactly ONE bucket: floor(point / width);
* each interval explodes to EVERY bucket it overlaps:
  sequence(floor(start/width), floor(end/width)) — (len/width + 1) rows;
* join on (keys..., bucket), then re-check the exact BETWEEN predicate.

Each (point, interval) pair can meet in at most one bucket (the point's),
so the output needs no dedup. The shuffle is keyed by (keys, bucket) —
time-uniform data spreads evenly, and a hot entity key is further split
by its bucket dimension. Pick ``bucket_width`` near the TYPICAL interval
length: too small multiplies the interval fan-out (len/width rows per
interval), too large inflates the per-bucket candidate cross-product the
exact filter then discards.

Timestamps are bucketed on ``unix_micros`` (exact integer math) — a
double epoch would round near bucket edges and could mis-bucket a
boundary point away from the buckets its interval covers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, dtype: str, width_us: int) -> Column:
    if dtype.startswith("timestamp"):
        # unix_micros rejects TIMESTAMP_NTZ; the cast is UTC-pinned by the
        # session timezone, and both sides of the join cast identically,
        # so bucket alignment never depends on it.
        return F.floor(F.unix_micros(col.cast("timestamp")) / F.lit(width_us))
    # numeric axis: width_us is the raw width (no microsecond scaling)
    return F.floor(col.cast("double") / F.lit(float(width_us))).cast("long")


def bucketized_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    on: list[str] | None = None,
    bucket_width: float = 600.0,
) -> DataFrame:
    """Inner-join every point row to every interval row containing it.

    ``on``: optional equi-keys present on BOTH sides (e.g. the entity id)
    — they join first, so the range check never crosses entities.
    ``bucket_width``: seconds for timestamp axes, plain units for numeric
    axes. Intervals with ``end < start`` are dropped (``sequence`` would
    otherwise DESCEND and bucket them nonsensically); NULL endpoints are
    dropped with them.

    Output: all point columns + all interval columns (join keys once).
    Column names other than ``on`` must be disjoint across the two sides.

    Scale: shuffle carries |points| + |intervals| x (span/width + 1)
    rows, keyed by (on..., bucket) — no nested-loop, no broadcast-size
    ceiling, AQE-splittable skew. The exact BETWEEN re-check runs
    map-side post-join, so correctness never depends on the bucketing.
    """
    on = list(on or [])
    overlap = (set(points.columns) & set(intervals.columns)) - set(on)
    if overlap:
        raise ValueError(f"non-key column names must be disjoint; both sides have {sorted(overlap)}")
    p_type = dict(points.dtypes)[point_col]
    width_us = int(bucket_width * 1_000_000) if p_type.startswith("timestamp") else int(bucket_width)
    pt = points.withColumn("_pb", _bucket(F.col(point_col), p_type, width_us))
    iv = (
        intervals.filter(
            F.col(start_col).isNotNull()
            & F.col(end_col).isNotNull()
            & (F.col(end_col) >= F.col(start_col))
        )
        .withColumn(
            "_pb",
            F.explode(
                F.sequence(
                    _bucket(F.col(start_col), p_type, width_us),
                    _bucket(F.col(end_col), p_type, width_us),
                )
            ),
        )
    )
    joined = pt.join(iv, on=on + ["_pb"], how="inner").filter(
        F.col(point_col).between(F.col(start_col), F.col(end_col))
    )
    return joined.drop("_pb")
