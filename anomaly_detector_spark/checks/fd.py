"""Functional-dependency check: declared ``lhs`` columns must determine
``rhs`` (path extension -> lang, repo -> default branch, order -> customer).

The uniqueness check's generalization: uniqueness is the FD
key -> ENTIRE ROW (/root/reference/algo/operator.py:92 keeps first per
duplicated key); here any declared dependency is validated without
comparing rows pairwise — a key is violating iff it maps to more than
one distinct rhs value anywhere in the table.

Scale shape: ONE scan collapses the table to distinct
(lhs, partition, rhs) cells with row counts — map-side combined, the
shuffle carries one row per distinct cell, never raw rows. Everything
else derives from that cell frame: the per-key distinct-rhs counts
(a second aggregation of the already-tiny frame), the violating key
set, and the per-partition violating-row fractions (cells joined back
to violating keys — both sides O(cells), the source is never re-joined).
Like fused uniqueness, evidence is regenerated from counts, not row
identity. NULL rhs counts as a value ({x, NULL} is a conflict); NULL
lhs keys group together (groupBy null-safe grouping) and the key join
back is null-safe (eqNullSafe per lhs column).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .base import CheckResult, CheckSpec, empty_violations, verdict_frame


def fd_violating_keys(df: DataFrame, lhs: list[str], rhs: str) -> DataFrame:
    """Keys breaking lhs -> rhs: (*lhs, n_rhs, n_rows) with n_rhs > 1 —
    the inspection frame behind run_fd's verdicts (one row per violating
    key, already aggregated; join it back on lhs to pull examples)."""
    cells = df.groupBy(*lhs, F.col(rhs).alias("_rhs")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    per_key = cells.groupBy(*lhs).agg(
        F.count(F.lit(1)).alias("n_rhs"), F.sum("_n").alias("n_rows")
    )
    return per_key.filter(F.col("n_rhs") > 1)


def run_fd(df: DataFrame, spec: CheckSpec) -> CheckResult:
    """CheckSpec config: ``lhs`` (list of determinant columns), ``rhs``
    (the determined column), ``max_violating_frac`` (default 0.0 —
    any row under a violating key fails its partition).

    Per-partition verdict: the fraction of the partition's rows whose
    lhs key maps to >1 distinct rhs GLOBALLY (a repo spanning two langs
    taints its rows in both partitions — dependency violations are
    table-level facts, partition verdicts are their attribution)."""
    lhs = list(spec.config["lhs"])
    rhs = spec.config["rhs"]
    max_frac = float(spec.config.get("max_violating_frac", 0.0))
    part = spec.partition_col

    cells = df.groupBy(
        *lhs, F.col(part).alias("_part"), F.col(rhs).alias("_rhs")
    ).agg(F.count(F.lit(1)).alias("_n"))
    # the cell frame feeds TWO aggregates (per-key distinct-rhs and the
    # per-partition attribution join) — without materialization each
    # branch re-runs the aggregate and the SOURCE is scanned twice
    # (confirmed in the plan audit). The frame is O(distinct cells)
    # narrow rows; one localCheckpoint beats a second 100-TB scan.
    # config {"materialize": False} keeps the pure plan for tiny inputs.
    if spec.config.get("materialize", True):
        cells = cells.localCheckpoint()

    # distinct rhs per key: dedup the cell frame over partitions first —
    # O(cells) rows both stages, never the source
    viol = (
        cells.select(*lhs, "_rhs")
        .distinct()
        .groupBy(*lhs)
        .agg(F.count(F.lit(1)).alias("_n_rhs"))
        .filter(F.col("_n_rhs") > 1)
        .select(*[F.col(c).alias(f"_v_{c}") for c in lhs])
        .withColumn("_bad", F.lit(1))
    )
    cond = reduce(
        lambda a, b: a & b,
        [cells[c].eqNullSafe(viol[f"_v_{c}"]) for c in lhs],
    )
    per_part = (
        cells.join(viol, cond, "left")
        .groupBy(F.col("_part").alias(part))
        .agg(
            F.sum("_n").alias("n_rows"),
            F.sum(F.when(F.col("_bad").isNotNull(), F.col("_n")).otherwise(0)).alias(
                "n_fd_bad_rows"
            ),
        )
    )
    verdicts = verdict_frame(
        per_part,
        spec.id,
        part,
        fail_when=F.col("n_fd_bad_rows") > F.col("n_rows") * F.lit(max_frac),
        skip_when=F.col("n_rows") < spec.min_rows,
        metric_cols=["n_rows", "n_fd_bad_rows"],
    )
    return CheckResult(
        violations=empty_violations(df), verdicts=verdicts, metrics=per_part
    )
