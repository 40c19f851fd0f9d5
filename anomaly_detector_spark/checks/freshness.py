"""Freshness check: per-partition event-time staleness verdicts.

The reference gates on staleness row by row — events older than 250
days are dropped before the kernel sees them
(/root/reference/algo/operator.py:156-157, the engine's P5/T4 filter).
The monitoring-side dual is a PARTITION verdict: "has this partition
produced data recently?" — the dbt-source-freshness / Monte-Carlo
staleness gate. A partition whose newest row is older than ``max_age``
seconds FAILs; there is no row-level culprit (the defect is the rows
that DON'T exist), so the check is verdict-only.

``as_of`` anchors "now":

* ``None``      — wall clock (``current_timestamp``), the production
  scheduler mode;
* ``"max"``     — the table's own global max event time, derived IN-PLAN
  (1-row aggregate broadcast back, no driver action): flags partitions
  lagging behind the freshest one — deterministic, replayable, and the
  right semantics for backfills where wall-clock freshness is
  meaningless;
* a timestamp literal — explicit replay anchor.

Scale shape: one partial-aggregated groupBy(partition) over (partition,
ts) — two pruned columns; the "max" anchor re-aggregates the tiny
per-partition frame, never the table. No shuffle wider than
O(partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .base import CheckResult, CheckSpec, empty_violations, verdict_frame


def partition_freshness(
    df: DataFrame,
    partition_col: str,
    ts_col: str,
    as_of: str | None = "max",
) -> DataFrame:
    """(partition_col, n_rows, max_ts, as_of_ts, age_seconds) per partition."""
    per = df.groupBy(partition_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.max(F.col(ts_col).cast("timestamp")).alias("max_ts"),
    )
    if as_of is None:
        anchor = F.current_timestamp()
    elif as_of == "max":
        g = per.agg(F.max("max_ts").alias("_g"))
        per = per.crossJoin(F.broadcast(g))
        anchor = F.col("_g")
    else:
        anchor = F.lit(as_of).cast("timestamp")
    out = per.withColumn("as_of_ts", anchor).withColumn(
        "age_seconds",
        (F.unix_timestamp("as_of_ts") - F.unix_timestamp("max_ts")).cast("long"),
    )
    return out.drop("_g") if as_of == "max" else out


_SLOT_SECONDS = {"minute": 60, "hour": 3600, "day": 86400, "week": 604800}


def slot_coverage(
    df: DataFrame,
    partition_col: str,
    ts_col: str = "ts",
    granularity: str = "hour",
    span: str = "self",
) -> DataFrame:
    """Calendar COMPLETENESS per partition: freshness asks "is the
    newest row recent", this asks "did every expected time slot arrive"
    — the dead-feed-for-an-afternoon defect freshness is blind to (the
    newest row can be fresh while six hours in the middle are missing).

    A slot is ``date_trunc(granularity, ts)``. Expected slots span
    ``span``: ``"self"`` = the partition's own [first, last] slot (late
    starters are not penalized); ``"global"`` = the table-wide span
    (flags partitions that started late / died early); ``(lo, hi)`` =
    an explicit declared window, e.g. the scheduler's backfill range.

    Returns per partition: (partition_key, n_rows, n_slots_observed,
    n_slots_expected, n_missing, coverage, max_gap) — max_gap is the
    longest run of CONSECUTIVE missing slots, from a lag window over
    observed slots only.

    Scale shape: ONE map-side-combined groupBy collapses the table to
    O(partitions x slots) rows; everything after — span aggregate,
    expected-count arithmetic, the max-gap window — runs on that tiny
    frame. The expected count is ARITHMETIC ((last-first)/width + 1;
    granularities are fixed-width in the engine's UTC session, so no
    sequence() array is ever materialized — a 10-year minute-grain
    span costs the same as a day. Missing-slot IDENTITY (which hours)
    is deliberately a separate triage helper, missing_slots(), whose
    explode is proportional to the span.
    """
    if granularity not in _SLOT_SECONDS:
        raise ValueError(
            f"granularity {granularity!r} not fixed-width; use one of "
            f"{sorted(_SLOT_SECONDS)}"
        )
    w = _SLOT_SECONDS[granularity]
    slot = F.date_trunc(granularity, F.col(ts_col).cast("timestamp"))
    slots = df.groupBy(
        F.col(partition_col).cast("string").alias("partition_key"),
        slot.alias("slot"),
    ).agg(F.count(F.lit(1)).alias("_n"))

    from pyspark.sql import Window

    prev = F.lag("slot").over(
        Window.partitionBy("partition_key").orderBy("slot")
    )
    gap = (F.unix_timestamp("slot") - F.unix_timestamp(prev)) / w - 1
    per = (
        slots.withColumn("_gap", F.coalesce(gap, F.lit(0.0)))
        .groupBy("partition_key")
        .agg(
            F.sum("_n").alias("n_rows"),
            F.count(F.lit(1)).alias("n_slots_observed"),
            F.min("slot").alias("first_obs"),
            F.max("slot").alias("last_obs"),
            F.max("_gap").alias("_interior_gap"),
        )
        .withColumn("first_slot", F.col("first_obs"))
        .withColumn("last_slot", F.col("last_obs"))
    )
    if span == "global":
        g = per.agg(
            F.min("first_obs").alias("_lo"), F.max("last_obs").alias("_hi")
        )
        per = (
            per.crossJoin(F.broadcast(g))
            .withColumn("first_slot", F.col("_lo"))
            .withColumn("last_slot", F.col("_hi"))
            .drop("_lo", "_hi")
        )
    elif span != "self":
        lo, hi = span
        per = per.withColumn(
            "first_slot", F.date_trunc(granularity, F.lit(lo).cast("timestamp"))
        ).withColumn(
            "last_slot", F.date_trunc(granularity, F.lit(hi).cast("timestamp"))
        )
    # a widened span adds missing runs BEFORE the first observed slot
    # and AFTER the last — the interior lag window can't see those
    lead = (F.unix_timestamp("first_obs") - F.unix_timestamp("first_slot")) / w
    trail = (F.unix_timestamp("last_slot") - F.unix_timestamp("last_obs")) / w
    expected = (
        (F.unix_timestamp("last_slot") - F.unix_timestamp("first_slot")) / w + 1
    ).cast("long")
    out = (
        per.withColumn("n_slots_expected", expected)
        .withColumn(
            "n_missing", F.col("n_slots_expected") - F.col("n_slots_observed")
        )
        .withColumn(
            "max_gap",
            F.greatest(F.col("_interior_gap"), lead, trail).cast("long"),
        )
    )
    # an explicit span can CLIP observed slots outside it; coverage is
    # still observed/expected (over-coverage > 1 means data outside the
    # declared window — surfaced, not hidden)
    return out.select(
        "partition_key",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_slots_observed").cast("long").alias("n_slots_observed"),
        "n_slots_expected",
        "n_missing",
        F.round(F.col("n_slots_observed") / F.col("n_slots_expected"), 6).alias(
            "coverage"
        ),
        "max_gap",
    )


def missing_slots(
    df: DataFrame,
    partition_col: str,
    ts_col: str = "ts",
    granularity: str = "hour",
    span: str = "self",
) -> DataFrame:
    """Triage twin of slot_coverage: the IDENTITY of every missing slot
    (partition_key, slot). Explodes sequence(first, last) per partition
    — cost proportional to the span (one array per partition on the
    already-collapsed frame); run it on the partitions the check FAILed,
    not the whole table."""
    if granularity not in _SLOT_SECONDS:
        raise ValueError(f"granularity {granularity!r} not fixed-width")
    slot = F.date_trunc(granularity, F.col(ts_col).cast("timestamp"))
    observed = df.select(
        F.col(partition_col).cast("string").alias("partition_key"),
        slot.alias("slot"),
    ).distinct()
    per = observed.groupBy("partition_key").agg(
        F.min("slot").alias("first_slot"), F.max("slot").alias("last_slot")
    )
    if span == "global":
        g = per.agg(F.min("first_slot").alias("_lo"), F.max("last_slot").alias("_hi"))
        per = (
            per.crossJoin(F.broadcast(g))
            .withColumn("first_slot", F.col("_lo"))
            .withColumn("last_slot", F.col("_hi"))
            .drop("_lo", "_hi")
        )
    elif span != "self":
        lo, hi = span
        per = per.withColumn(
            "first_slot", F.date_trunc(granularity, F.lit(lo).cast("timestamp"))
        ).withColumn(
            "last_slot", F.date_trunc(granularity, F.lit(hi).cast("timestamp"))
        )
    expected = per.select(
        "partition_key",
        F.explode(
            F.expr(f"sequence(first_slot, last_slot, interval 1 {granularity})")
        ).alias("slot"),
    )
    # null-safe: a NULL partition's observed slots must cancel its own
    # expected rows, or every one of its slots reports missing.
    from .base import null_safe_join

    return null_safe_join(expected, observed, ["partition_key", "slot"], "left_anti")


def run_coverage(df: DataFrame, spec: CheckSpec) -> CheckResult:
    """Declarable slot-coverage check: FAIL when a partition's slot
    coverage drops below ``min_coverage`` or its longest consecutive
    missing run exceeds ``max_gap``. config: ``ts_col`` (required),
    ``granularity`` (default "hour"), ``span`` ("self" | "global" |
    [lo, hi], default "self"), ``min_coverage`` (default 1.0 — any
    missing slot fails), ``max_gap`` (optional, slots). Verdict-only
    like freshness (the defect is rows that DON'T exist); feed FAILed
    partitions to missing_slots() for the hour-level identity."""
    part = spec.partition_col
    span = spec.config.get("span", "self")
    if isinstance(span, list):
        span = tuple(span)
    per = slot_coverage(
        df,
        part,
        ts_col=spec.config["ts_col"],
        granularity=spec.config.get("granularity", "hour"),
        span=span,
    )
    min_cov = float(spec.config.get("min_coverage", 1.0))
    max_gap = spec.config.get("max_gap")
    fail = F.col("coverage") < F.lit(min_cov)
    if max_gap is not None:
        fail = fail | (F.col("max_gap") > int(max_gap))
    verdicts = verdict_frame(
        per,
        spec.id,
        "partition_key",
        fail_when=fail,
        skip_when=F.col("n_rows") < spec.min_rows,
        metric_cols=[
            "n_rows", "n_slots_observed", "n_slots_expected",
            "n_missing", "coverage", "max_gap",
        ],
    )
    return CheckResult(violations=empty_violations(df), verdicts=verdicts, metrics=per)


def run_freshness(df: DataFrame, spec: CheckSpec) -> CheckResult:
    """CheckResult envelope: FAIL when a partition's newest event is older
    than ``max_age_seconds`` relative to the anchor. config: ``ts_col``
    (required), ``max_age_seconds`` (default 86400), ``as_of`` (see
    module docstring; default "max" for determinism)."""
    part = spec.partition_col
    ts_col = spec.config["ts_col"]
    max_age = int(spec.config.get("max_age_seconds", 86400))
    as_of = spec.config.get("as_of", "max")
    per = partition_freshness(df, part, ts_col, as_of)
    verdicts = verdict_frame(
        per,
        spec.id,
        part,
        fail_when=F.col("age_seconds") > max_age,
        skip_when=F.col("n_rows") < spec.min_rows,
        metric_cols=["n_rows", "age_seconds"],
    )
    return CheckResult(violations=empty_violations(df), verdicts=verdicts, metrics=per)
