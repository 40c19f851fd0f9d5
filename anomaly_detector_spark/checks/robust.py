"""Robust-statistics checks: MAD outlier exposure and Benford
first-digit drift.

Round-4 widening of the K-family (the reference flags outliers with
z-score/IQR per device, /root/reference/algo/cont_device.py:90-108;
SURVEY.md §2.8 K3/K4). Both members here are the ROBUST siblings:

* ``run_mad_outliers`` — modified z-score |x - median| / (1.4826 * MAD)
  per partition; immune to the very outliers it hunts (a mean/stddev
  z-score lets one 10^9-length file inflate sigma until nothing flags).
* ``run_benford`` — first-significant-digit distribution of a numeric
  column vs Benford's law, scored by chi-square; a classic
  fabricated/synthetic-segment detector for financial-ish columns.

Scale shape: MAD needs the partition median FIRST, so it is two
map-side-combined aggregates with a broadcast-joined median in between
— the value column rides each scan once and never carries a sort.
Benford is one aggregate over a derived digit column. Exact percentile
is used (ObjectHashAggregate buffers per group) so the check is
SQL-oracle-able; at extreme scale swap config["approx"]=True for the
percentile_approx sketch, same plan shape.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .base import CheckResult, CheckSpec, empty_violations, verdict_frame

MAD_K = 1.4826  # consistency constant: MAD * 1.4826 estimates sigma for normal data


def mad_profile(
    df: DataFrame,
    partition_col: str,
    col: str = "content",
    use_length: bool = True,
    threshold: float = 3.5,
    approx: bool = False,
    materialize: bool = True,
) -> DataFrame:
    """Per-partition robust-outlier profile: (partition_key, n_rows,
    med, mad, n_outliers, outlier_rate) where an outlier has modified
    z-score |x - med| / (MAD_K * mad) > ``threshold`` (Iglewicz-Hoaglin
    3.5 default). An all-constant partition (mad = 0) flags any value
    different from the median — the robust reading of "no variation
    means any variation is news".

    Three value-column scans by necessity (median -> MAD -> outlier
    count, each gating the next), the exact-MAD algorithmic minimum;
    ``materialize`` (default True) eagerly localCheckpoints the tiny
    O(partitions) median/MAD frames so the two downstream branches
    broadcast the SAME computed rows instead of re-running the
    percentile aggregates — without it the lazy plan scans the input a
    4th time for the duplicated median aggregate."""
    v = (F.length(F.col(col)) if use_length else F.col(col)).cast("double")
    slim = df.select(
        F.col(partition_col).cast("string").alias("partition_key"), v.alias("_v")
    ).filter(F.col("_v").isNotNull())

    def pct(expr: str, q: float) -> F.Column:
        if approx:
            return F.percentile_approx(F.expr(expr), q)
        return F.expr(f"percentile({expr}, {q})")

    med = slim.groupBy("partition_key").agg(pct("_v", 0.5).alias("med"))
    if materialize:
        med = med.localCheckpoint(eager=True)
    dev = slim.join(F.broadcast(med), "partition_key").withColumn(
        "_absdev", F.abs(F.col("_v") - F.col("med"))
    )
    mad = dev.groupBy("partition_key").agg(
        pct("_absdev", 0.5).alias("mad"), F.first("med").alias("med")
    )
    if materialize:
        mad = mad.localCheckpoint(eager=True)
    scored = dev.join(
        F.broadcast(mad.select("partition_key", "mad")), "partition_key"
    ).withColumn(
        "_is_out",
        F.when(
            F.col("mad") > 0,
            (F.col("_absdev") / (F.lit(MAD_K) * F.col("mad"))) > F.lit(threshold),
        ).otherwise(F.col("_absdev") > 0),
    )
    agg = scored.groupBy("partition_key").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("_is_out").cast("long")).alias("n_outliers"),
    )
    return (
        agg.join(mad, "partition_key")
        .select(
            "partition_key",
            "n_rows",
            F.round("med", 4).alias("med"),
            F.round("mad", 4).alias("mad"),
            "n_outliers",
            F.round(F.col("n_outliers") / F.col("n_rows"), 6).alias("outlier_rate"),
        )
    )


def run_mad_outliers(df: DataFrame, spec: CheckSpec) -> CheckResult:
    """Declarable MAD-outlier check: FAIL partitions whose robust outlier
    rate exceeds ``max_outlier_rate`` (default 0.01).

    config: ``column`` ('content'), ``use_length`` (True), ``threshold``
    (3.5), ``approx`` (False), ``max_outlier_rate`` (0.01)."""
    c = spec.config
    prof = mad_profile(
        df,
        spec.partition_col,
        col=c.get("column", "content"),
        use_length=bool(c.get("use_length", True)),
        threshold=float(c.get("threshold", 3.5)),
        approx=bool(c.get("approx", False)),
    )
    verdicts = verdict_frame(
        prof.withColumnRenamed("partition_key", spec.partition_col),
        spec.id,
        spec.partition_col,
        fail_when=F.col("outlier_rate") > F.lit(float(c.get("max_outlier_rate", 0.01))),
        skip_when=F.col("n_rows") < spec.min_rows,
        metric_cols=["n_rows", "med", "mad", "n_outliers", "outlier_rate"],
    )
    return CheckResult(violations=empty_violations(df), verdicts=verdicts, metrics=prof)


# Benford expected first-digit probabilities log10(1 + 1/d), d = 1..9
BENFORD_P = [math.log10(1 + 1 / d) for d in range(1, 10)]


def benford_profile(
    df: DataFrame, partition_col: str, col: str, use_length: bool = False
) -> DataFrame:
    """Per-partition Benford first-digit profile of a numeric column:
    (partition_key, n_rows, d1..d9 observed fractions, chi2) where chi2
    is the chi-square statistic of observed digit counts vs Benford's
    expectation (8 degrees of freedom; > ~20 is p < 0.01).

    Zero/NULL values carry no first significant digit and are excluded.
    One derived-column aggregate: the first significant digit of |x| is
    floor(|x| / 10^floor(log10(|x|))) — pure JVM arithmetic, no UDF.
    ``use_length=True`` profiles length(col) instead (string columns:
    content sizes are the classic wide-ranging positive measure)."""
    base = F.length(F.col(col)) if use_length else F.col(col)
    x = F.abs(base.cast("double"))
    digit = F.floor(x / F.pow(F.lit(10.0), F.floor(F.log10(x)))).cast("int")
    slim = (
        df.filter(F.col(col).isNotNull())
        .select(
            F.col(partition_col).cast("string").alias("partition_key"),
            digit.alias("_d"),
        )
        .filter((F.col("_d") >= 1) & (F.col("_d") <= 9))
    )
    counts = [
        F.sum((F.col("_d") == d).cast("long")).alias(f"c{d}") for d in range(1, 10)
    ]
    agg = slim.groupBy("partition_key").agg(F.count(F.lit(1)).alias("n_rows"), *counts)
    chi2 = sum(
        (
            (F.col(f"c{d}") - F.col("n_rows") * F.lit(BENFORD_P[d - 1])) ** 2
            / (F.col("n_rows") * F.lit(BENFORD_P[d - 1]))
        )
        for d in range(1, 10)
    )
    return agg.select(
        "partition_key",
        "n_rows",
        *[
            F.round(F.col(f"c{d}") / F.col("n_rows"), 6).alias(f"d{d}")
            for d in range(1, 10)
        ],
        F.round(chi2, 4).alias("chi2"),
    )


def run_benford(df: DataFrame, spec: CheckSpec) -> CheckResult:
    """Declarable Benford drift check: FAIL partitions whose first-digit
    chi-square exceeds ``max_chi2`` (default 20.09 — the 8-df p=0.01
    critical value). Only meaningful for naturally wide-ranging positive
    columns (amounts, sizes, durations); the caller picks the column.

    config: ``column`` (required), ``use_length`` (False — True profiles
    length(column), for string columns), ``max_chi2`` (20.09)."""
    c = spec.config
    prof = benford_profile(
        df, spec.partition_col, c["column"], use_length=bool(c.get("use_length", False))
    )
    verdicts = verdict_frame(
        prof.withColumnRenamed("partition_key", spec.partition_col),
        spec.id,
        spec.partition_col,
        fail_when=F.col("chi2") > F.lit(float(c.get("max_chi2", 20.09))),
        skip_when=F.col("n_rows") < spec.min_rows,
        metric_cols=["n_rows", "chi2"],
    )
    return CheckResult(violations=empty_violations(df), verdicts=verdicts, metrics=prof)
