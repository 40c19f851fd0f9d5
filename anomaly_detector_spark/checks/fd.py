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


def key_cardinality_violations(
    df: DataFrame, key_cols: list[str], min_count: int = 1, max_count: int | None = None
) -> DataFrame:
    """Keys whose GLOBAL row count falls outside [min_count, max_count]:
    (*key_cols, n_rows) — the inspection frame behind
    run_key_cardinality. Scale shape identical to fd_violating_keys:
    one map-side-combined collapse to per-key counts."""
    per_key = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    cond = F.col("n_rows") < int(min_count)
    if max_count is not None:
        cond = cond | (F.col("n_rows") > int(max_count))
    return per_key.filter(cond)


def run_key_cardinality(df: DataFrame, spec: CheckSpec) -> CheckResult:
    """Relationship-cardinality check: every ``key`` must hold between
    ``min_count`` and ``max_count`` rows (an order has 1-7 lineitems, a
    device posts at most one reading per minute...). The FD check's
    count-band cousin; uniqueness is the special case max_count=1.

    Config: ``key`` (list), ``min_count`` (default 1), ``max_count``
    (default None = unbounded), ``max_violating_frac`` (default 0.0).
    Counts are GLOBAL per key (a key straddling partitions sums before
    the band test); partition verdicts attribute the violating rows,
    exactly the fd rule. A key with ZERO rows is invisible here —
    missing-parent detection is referential's job, not a count band's.

    Scale shape: the fd cell frame without the rhs column — one scan to
    O(distinct key x partition) counted cells (map-side combined), both
    downstream aggregates run on that frame, the source is never
    re-joined; same localCheckpoint materialization rule."""
    from functools import reduce as _reduce

    keys = list(spec.config["key"])
    lo = int(spec.config.get("min_count", 1))
    hi = spec.config.get("max_count")
    max_frac = float(spec.config.get("max_violating_frac", 0.0))
    part = spec.partition_col

    cells = df.groupBy(*keys, F.col(part).alias("_part")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    if spec.config.get("materialize", True):
        cells = cells.localCheckpoint()

    band = F.col("_tot") < lo
    if hi is not None:
        band = band | (F.col("_tot") > int(hi))
    viol = (
        cells.groupBy(*keys)
        .agg(F.sum("_n").alias("_tot"))
        .filter(band)
        .select(*[F.col(c).alias(f"_v_{c}") for c in keys])
        .withColumn("_bad", F.lit(1))
    )
    cond = _reduce(
        lambda a, b: a & b,
        [cells[c].eqNullSafe(viol[f"_v_{c}"]) for c in keys],
    )
    per_part = (
        cells.join(viol, cond, "left")
        .groupBy(F.col("_part").alias(part))
        .agg(
            F.sum("_n").alias("n_rows"),
            F.sum(F.when(F.col("_bad").isNotNull(), F.col("_n")).otherwise(0)).alias(
                "n_card_bad_rows"
            ),
        )
    )
    verdicts = verdict_frame(
        per_part,
        spec.id,
        part,
        fail_when=F.col("n_card_bad_rows") > F.col("n_rows") * F.lit(max_frac),
        skip_when=F.col("n_rows") < spec.min_rows,
        metric_cols=["n_rows", "n_card_bad_rows"],
    )
    return CheckResult(
        violations=empty_violations(df), verdicts=verdicts, metrics=per_part
    )


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
