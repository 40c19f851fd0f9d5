"""Per-partition / per-column statistics check.

One single-pass ``groupBy(partition).agg(...)`` computes every stat —
Spark's partial+final hash aggregation makes this map-side-combining and
shuffle-light; at 10^12 rows the shuffle carries only one row per
(partition, agg) pair. Distinct counts use HyperLogLog
(``approx_count_distinct``) by default with an exact option for oracle
tests; quantiles use ``percentile_approx`` (mergeable sketch) with an
exact option.

Reference semantics re-expressed (SURVEY.md §2.4): A1/A2 min-max, A3
mean, A4 median (kept as the p50 stat and reused as the drift median
gate), A5 count/length aggregates, P6 null-rate. The reference computes
these per device over an in-memory pandas Series
(/root/reference/algo/cont_device.py:90-105); here each partition's
stats come out of one distributed aggregate.

Verdict: FAIL when the null-rate exceeds ``max_null_rate``; SKIPPED when
the partition has fewer than ``min_rows`` rows (warm-up analog,
/root/reference/algo/operator.py:164-170).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .base import CheckResult, CheckSpec, as_violations, verdict_frame


def stats_exprs(col: str = "content", approx: bool = True) -> list[F.Column]:
    length = F.length(F.col(col))
    distinct = (
        F.approx_count_distinct(F.col(col)).alias("distinct_content")
        if approx
        else F.count_distinct(F.col(col)).alias("distinct_content")
    )
    p50 = (
        F.percentile_approx(length, 0.5).alias("p50_len")
        if approx
        else F.expr(f"percentile(length({col}), 0.5)").alias("p50_len")
    )
    p99 = (
        F.percentile_approx(length, 0.99).alias("p99_len")
        if approx
        else F.expr(f"percentile(length({col}), 0.99)").alias("p99_len")
    )
    return [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(col).isNull().cast("long")).alias("n_null"),
        F.avg(F.col(col).isNull().cast("double")).alias("null_rate"),
        F.min(length).alias("min_len"),
        F.max(length).alias("max_len"),
        F.round(F.avg(length), 4).alias("avg_len"),
        p50,
        p99,
        distinct,
    ]


def hll_sketches(df: DataFrame, partition_col: str, col: str = "content", lgk: int = 12) -> DataFrame:
    """Per-partition HyperLogLog sketches (Datasketches HLL, mergeable).

    ``approx_count_distinct`` answers "distinct within this run"; the
    SKETCH answers the incremental question — store one binary sketch per
    partition next to the manifest, then union sketches across runs /
    partitions for a global distinct estimate WITHOUT rescanning history.
    That mergeability is what makes distinct counts tractable at 10^12
    rows with incremental resume (SURVEY §2.4 A8 at scale).
    """
    return df.groupBy(F.col(partition_col).cast("string").alias("partition_key")).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lgk)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def hll_union_estimate(sketches: DataFrame) -> DataFrame:
    """Union per-partition sketches into one global distinct estimate.

    Input: any frame with a ``sketch`` binary column (e.g. the union of
    several runs' hll_sketches outputs). One tiny aggregate — the
    sketches are KB-sized regardless of data volume.
    """
    return sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"))).alias("distinct_estimate"),
        F.sum("n_rows").alias("n_rows"),
    )


def run_stats(df: DataFrame, spec: CheckSpec) -> CheckResult:
    part = spec.partition_col
    col = spec.config.get("column", "content")
    approx = spec.config.get("approx", True)
    max_null_rate = spec.config.get("max_null_rate", 0.02)
    cid = spec.id

    per_part = df.groupBy(part).agg(*stats_exprs(col, approx=approx))

    verdicts = verdict_frame(
        per_part,
        cid,
        part,
        fail_when=F.col("null_rate") > max_null_rate,
        skip_when=F.col("n_rows") < spec.min_rows,
        metric_cols=["n_rows", "n_null", "null_rate", "min_len", "max_len", "avg_len", "p50_len", "p99_len", "distinct_content"],
    )

    # Violations: the individual NULL-content rows (the reference drops
    # them silently via dropna, algo/preprocessing.py:8 — we report them).
    violations = as_violations(
        df.filter(F.col(col).isNull()),
        cid,
        observed=F.lit("content IS NULL"),
        expected=F.lit("content NOT NULL"),
        partition_key=F.col(part),
    )
    return CheckResult(violations=violations, verdicts=verdicts, metrics=per_part)
