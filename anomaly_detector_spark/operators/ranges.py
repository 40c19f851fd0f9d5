"""Temporal joins: bucketized interval join and as-of join.

Bucketized interval join: points-in-ranges without a nested-loop join.

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

from pyspark.sql import Column, DataFrame, Window
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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None = None,
    right_cols: list[str] | None = None,
    tolerance: float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: each left row picks the right row with the
    greatest ``right.on <= left.on`` within the same ``by`` group
    (inclusive at equality — DuckDB/pandas ``merge_asof`` semantics).
    Unmatched left rows keep NULLs. The reference aligns an incoming
    event against the latest persisted state by exactly this rule
    (/root/reference/algo/operator.py:92-104 sorts the accumulated
    series and acts on the newest row at or before the message time).

    Spark-first design: NOT a join. Both sides are union-tagged
    (right=0, left=1) and a single per-key window carries the last
    non-null right payload forward — one shuffle keyed by ``by``, one
    within-key sort, no non-equi join, no broadcast ceiling. This is
    the merge-join formulation every as-of engine lowers to; Spark's
    own range-join strategies (BNLJ/cartesian) are non-starters at
    100 TB. Skew bound = the largest single ``by`` group (same bound as
    any per-entity window); with ``by=[]`` everything lands in ONE task
    — refuse to do that silently.

    ``right_cols``: payload columns carried from right (default: all
    except ``by``/``on``); names must not collide with left columns.
    The matched right timestamp is emitted as ``f"{on}{suffix}"``.
    If right has several rows at one (by, on) point, the greatest
    payload struct wins (deterministic lexicographic tiebreak).
    ``tolerance``: seconds for timestamp axes / plain units for numeric
    axes; a match farther back than this is nulled (the match is NOT
    replaced by an earlier in-tolerance row — merge_asof semantics).
    """
    by = list(by or [])
    if not by:
        raise ValueError(
            "asof_join with by=[] funnels every row through one task; "
            "add a partitioning key (or bucket the time axis and use "
            "bucketized_interval_join)"
        )
    rvals = right_cols or [c for c in right.columns if c not in by + [on]]
    overlap = set(left.columns) & set(rvals)
    if overlap:
        raise ValueError(f"right payload columns collide with left: {sorted(overlap)}")
    matched_on = f"{on}{suffix}"

    r2 = right.select(
        *by,
        F.col(on).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(F.col(on).alias(matched_on), *[F.col(c) for c in rvals]).alias("_rv"),
    )
    rv_type = r2.schema["_rv"].dataType
    left_dtypes = dict(left.dtypes)
    lcols = [c for c in left.columns if c not in by]
    l2 = left.select(
        *by,
        F.col(on).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rv_type).alias("_rv"),
        *lcols,
    )
    r2 = r2.select(
        *by, "_t", "_side", "_rv",
        *[F.lit(None).cast(left_dtypes[c]).alias(c) for c in lcols],
    )
    # right rows sort BEFORE left rows at the same instant (side 0 < 1)
    # => equality is an inclusive match; among duplicate right instants
    # the greatest payload struct is last and wins the carry.
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.col("_rv").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l2.unionByName(r2)
        .withColumn("_m", F.last("_rv", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    valid = F.col("_m").isNotNull()
    if tolerance is not None:
        if left_dtypes[on].startswith("timestamp"):
            gap = (
                F.unix_micros(F.col("_t").cast("timestamp"))
                - F.unix_micros(F.col("_m")[matched_on].cast("timestamp"))
            ) / F.lit(1_000_000.0)
        else:
            gap = F.col("_t").cast("double") - F.col("_m")[matched_on].cast("double")
        valid = valid & (gap <= F.lit(float(tolerance)))
    m = F.when(valid, F.col("_m"))
    return carried.select(
        *by,
        *[F.col(c) for c in lcols],
        m[matched_on].alias(matched_on),
        *[m[c].alias(c) for c in rvals],
    )
