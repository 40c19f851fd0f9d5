"""Per-key sequence checks over ordered telemetry: monotonicity,
reading gaps, and flatlines.

The three canonical sensor pathologies in the reference's own domain
(per-device metering series, /root/reference/algo/load_device.py and
operator.py consume a datetime-indexed value series per device):

* a cumulative counter that DECREASES (meter reset / replay);
* a reporting GAP larger than the expected cadence (dropped readings —
  the batch-side dual of the streaming staleness guard, T4);
* a FLATLINE — the same value repeated >= min_run consecutive readings
  (stuck sensor; a healthy noisy signal never holds a value that long).

Scale shape: all three checks derive from ONE window pass per key
(lag(value) + lag(ts) over the SAME (key, order) window spec — Spark
plans one Exchange + one Sort + one Window for all the lag columns),
keyed by device, so the sort is bounded by the largest single device's
history, never the table. Flatline run lengths use the gaps-and-islands
change-point cumsum over the same window (still the same spec), then
collapse to one row per run via a map-side-combined groupBy — run
evidence is aggregated (key, run length, value), never row identity.
Verdicts attribute counts to ``partition_col`` like every other check;
violations stay empty (the aggregated-check precedent of freshness/
contract/reconcile) with per-partition counts in ``metrics``.

NULL handling: a NULL value never flags monotonicity (no comparable
pair) and breaks a flatline run (NULL != NULL); the first reading of a
key flags nothing (no lag).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .base import CheckResult, CheckSpec, empty_violations, verdict_frame


def sequence_flags(
    df: DataFrame,
    key: str,
    order: str,
    value: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """The shared one-window-pass frame: each row plus ``_prev_v``,
    ``_gap_s`` (seconds since the key's previous reading) and ``_run``
    (change-point run id within the key, for flatline grouping).
    ``tiebreak`` pins a total order under equal ``order`` values (a
    distributed table has no arrival order — the W4 lesson)."""
    sort_cols = [order] + ([tiebreak] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*sort_cols)
    prev_v = F.lag(F.col(value)).over(w)
    prev_ts = F.lag(F.col(order)).over(w)
    changed = (
        prev_v.isNull() | F.col(value).isNull() | (F.col(value) != prev_v)
    ).cast("long")
    return df.select(
        F.col(key).alias("_key"),
        F.col(order).alias("_ord"),
        F.col(value).alias("_v"),
        prev_v.alias("_prev_v"),
        # TIMESTAMP_NTZ won't cast straight to double (ANSI); the
        # intermediate TIMESTAMP cast is a no-op for ordinary timestamps
        # (session tz is pinned UTC) and keeps fractional seconds
        (
            F.col(order).cast("timestamp").cast("double")
            - prev_ts.cast("timestamp").cast("double")
        ).alias("_gap_s"),
        F.sum(changed).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("_run"),
        "*",
    )


def run_monotonic(df: DataFrame, spec: CheckSpec) -> CheckResult:
    """config: ``key``, ``order``, ``value``, ``max_decreases`` (default
    0). A decrease is value < previous value within the key."""
    key = spec.config["key"]
    order = spec.config["order"]
    value = spec.config["value"]
    max_dec = int(spec.config.get("max_decreases", 0))
    part = spec.partition_col

    flags = sequence_flags(df, key, order, value, spec.config.get("tiebreak"))
    per_part = flags.groupBy(F.col(part).alias(part)).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("_v") < F.col("_prev_v")).cast("long")).alias("n_decreases"),
    )
    verdicts = verdict_frame(
        per_part,
        spec.id,
        part,
        fail_when=F.col("n_decreases") > max_dec,
        skip_when=F.col("n_rows") < spec.min_rows,
        metric_cols=["n_rows", "n_decreases"],
    )
    return CheckResult(violations=empty_violations(df), verdicts=verdicts, metrics=per_part)


def run_gaps(df: DataFrame, spec: CheckSpec) -> CheckResult:
    """config: ``key``, ``order`` (timestamp), ``max_gap_s``, and
    ``max_gaps`` (default 0). A gap is a key-consecutive pair more than
    ``max_gap_s`` seconds apart."""
    key = spec.config["key"]
    order = spec.config["order"]
    max_gap_s = float(spec.config["max_gap_s"])
    max_gaps = int(spec.config.get("max_gaps", 0))
    part = spec.partition_col

    # value column is irrelevant for gaps; reuse order as a placeholder
    flags = sequence_flags(df, key, order, order, spec.config.get("tiebreak"))
    per_part = flags.groupBy(F.col(part).alias(part)).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("_gap_s") > max_gap_s).cast("long")).alias("n_gaps"),
        F.max("_gap_s").alias("max_gap_s"),
    )
    verdicts = verdict_frame(
        per_part,
        spec.id,
        part,
        fail_when=F.col("n_gaps") > max_gaps,
        skip_when=F.col("n_rows") < spec.min_rows,
        metric_cols=["n_rows", "n_gaps", "max_gap_s"],
    )
    return CheckResult(violations=empty_violations(df), verdicts=verdicts, metrics=per_part)


def flatline_runs(
    df: DataFrame,
    key: str,
    order: str,
    value: str,
    min_run: int = 3,
    tiebreak: str | None = None,
) -> DataFrame:
    """Stuck-sensor runs: (key, value, run_len, run_start, run_end) for
    every maximal run of >= min_run identical consecutive readings —
    the aggregated inspection frame (one groupBy over the window pass,
    no row identity). NULL values never form a run."""
    flags = sequence_flags(df, key, order, value, tiebreak)
    return (
        flags.filter(F.col("_v").isNotNull())
        .groupBy(
            F.col("_key").alias(key),
            F.col("_run").alias("_run"),
            F.col("_v").alias(value),
        )
        .agg(
            F.count(F.lit(1)).alias("run_len"),
            F.min("_ord").alias("run_start"),
            F.max("_ord").alias("run_end"),
        )
        .filter(F.col("run_len") >= min_run)
        .drop("_run")
    )


def run_flatline(df: DataFrame, spec: CheckSpec) -> CheckResult:
    """config: ``key``, ``order``, ``value``, ``min_run`` (default 3),
    ``max_runs`` (default 0). Counts stuck runs per partition (a run is
    attributed to the partition of its key's rows; partition_col must be
    constant per key — e.g. the key itself or a device attribute).

    ``n_rows`` here counts NON-NULL readings (NULL values can't form
    runs and are filtered before the run collapse), so the SKIPPED
    guard is against comparable readings — unlike run_monotonic/
    run_gaps, whose n_rows counts every row."""
    key = spec.config["key"]
    order = spec.config["order"]
    value = spec.config["value"]
    min_run = int(spec.config.get("min_run", 3))
    max_runs = int(spec.config.get("max_runs", 0))
    part = spec.partition_col

    flags = sequence_flags(df, key, order, value, spec.config.get("tiebreak"))
    runs = (
        flags.filter(F.col("_v").isNotNull())
        .groupBy(F.col(part).alias(part), "_key", "_run", "_v")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    per_part = runs.groupBy(part).agg(
        F.sum("run_len").alias("n_rows"),
        F.sum((F.col("run_len") >= min_run).cast("long")).alias("n_stuck_runs"),
        F.max("run_len").alias("max_run_len"),
    )
    verdicts = verdict_frame(
        per_part,
        spec.id,
        part,
        fail_when=F.col("n_stuck_runs") > max_runs,
        skip_when=F.col("n_rows") < spec.min_rows,
        metric_cols=["n_rows", "n_stuck_runs", "max_run_len"],
    )
    return CheckResult(violations=empty_violations(df), verdicts=verdicts, metrics=per_part)


def sequence_profile(
    df: DataFrame,
    key: str,
    order: str,
    value: str,
    part: str,
    flat_value: str | None = None,
    max_gap_s: float = 100_000.0,
    min_run: int = 3,
    tiebreak: str | None = None,
) -> DataFrame:
    """All three sequence pathologies in ONE window pass — the fused
    form the composed checks would otherwise triple-scan for (the plan
    audit showed run_monotonic + run_gaps + run_flatline joined = 3
    source scans; this is 1 scan, 1 keyed exchange, 2 map-side-combined
    aggregations).

    ``flat_value`` monitors a different column for flatlines (a binned
    copy of a noisy float — raw doubles never repeat); decreases are
    judged on ``value``. Every row lands in exactly one run group (a
    NULL flat_value is its own singleton run — never >= min_run), so
    the run collapse carries the row-level decrease/gap counts with it
    and per-partition totals come off the tiny runs frame.

    Returns one row per ``part``: (n_rows, n_decreases, n_gaps,
    max_gap_s, n_stuck_runs, max_run_len).
    """
    fv = flat_value or value
    sort_cols = [order] + ([tiebreak] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*sort_cols)
    prev_v = F.lag(F.col(value)).over(w)
    prev_ts = F.lag(F.col(order)).over(w)
    prev_fv = F.lag(F.col(fv)).over(w)
    changed = (
        prev_fv.isNull() | F.col(fv).isNull() | (F.col(fv) != prev_fv)
    ).cast("long")
    base = df.select(
        F.col(part).alias("_part"),
        F.col(key).alias("_key"),
        F.col(fv).alias("_fv"),
        (F.col(value) < prev_v).cast("long").alias("_dec"),
        (
            F.col(order).cast("timestamp").cast("double")
            - prev_ts.cast("timestamp").cast("double")
        ).alias("_gap_s"),
        F.sum(changed).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("_run"),
    )
    runs = base.groupBy("_part", "_key", "_run", "_fv").agg(
        F.count(F.lit(1)).alias("_len"),
        F.sum(F.coalesce(F.col("_dec"), F.lit(0))).alias("_n_dec"),
        F.sum((F.col("_gap_s") > max_gap_s).cast("long")).alias("_n_gaps"),
        F.max("_gap_s").alias("_max_gap"),
    )
    return runs.groupBy(F.col("_part").alias(part)).agg(
        F.sum("_len").alias("n_rows"),
        F.sum("_n_dec").alias("n_decreases"),
        F.sum("_n_gaps").alias("n_gaps"),
        F.max("_max_gap").alias("max_gap_s"),
        F.sum(
            ((F.col("_len") >= min_run) & F.col("_fv").isNotNull()).cast("long")
        ).alias("n_stuck_runs"),
        F.max(F.when(F.col("_fv").isNotNull(), F.col("_len"))).alias("max_run_len"),
    )
