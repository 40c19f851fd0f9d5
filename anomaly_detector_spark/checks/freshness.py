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
