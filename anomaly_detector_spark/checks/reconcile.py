"""Cross-table aggregate reconciliation check.

Does a derived / replicated / rolled-up table still add up to its source
of truth? The validation-engine dual of the referential check:
referential pins KEY containment across tables
(checks/referential.py), reconciliation pins MEASURE parity — per
group, an aggregate computed on the left table must equal the same
aggregate on the right table within a tolerance. The reference has no
analog (its world is one stream per device); this is the classic
warehouse fact-vs-rollup audit.

Semantics per group (``spec.partition_col`` on BOTH sides):

* both sides aggregate ``measure`` (sum | count | min | max);
* the two aggregated frames full-outer join NULL-SAFELY on the group
  key — a NULL group reconciles like any other (the count-drift NULL
  lesson: a plain equality join would split one NULL group into two
  spurious verdict rows);
* FAIL when either side is missing the group, or
  |lhs - rhs| > tol_abs + tol_rel * |rhs|; SKIPPED under the
  ``min_rows`` warm-up guard (left-side row count).

Scale: each side partial-aggregates map-side before its single shuffle,
so the join input is O(groups) rows regardless of table size — the raw
tables never meet and the wide columns never ride a shuffle. Pass exact
DECIMAL measure columns for engine- and partitioning-invariant verdicts:
a double sum's order-dependent last-ulp wobble could flip a borderline
tolerance, a decimal sum cannot (the tolerance compare itself promotes
to double, exact for decimals below 2^53 scaled units).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .base import CheckResult, CheckSpec, empty_violations, verdict_frame

_AGGS = ("sum", "count", "min", "max", "avg")


def run_reconcile(df: DataFrame, spec: CheckSpec) -> CheckResult:
    """Config: ``other_df`` (right-side DataFrame, runtime state — excluded
    from the check id like referential's dim_df), ``measure`` (column on
    both sides; ``other_measure`` overrides the right-side name),
    ``agg`` ('sum' default), ``tol_abs`` / ``tol_rel`` (both default 0 =
    exact parity)."""
    other: DataFrame = spec.config["other_df"]
    agg = spec.config.get("agg", "sum")
    # other_agg lets the two sides aggregate differently — the canonical
    # use is auditing a COUNT of detail rows against a SUM of pre-counted
    # rollup rows (e.g. manifest n_violations vs the violations sink)
    other_agg = spec.config.get("other_agg", agg)
    for a in (agg, other_agg):
        if a not in _AGGS:
            raise ValueError(f"agg must be one of {_AGGS}, got {a!r}")
    measure = spec.config.get("measure")
    if measure is None and agg != "count":
        raise ValueError(f"agg={agg!r} requires a 'measure' column")
    other_measure = spec.config.get("other_measure", measure)
    if other_measure is None and other_agg != "count":
        raise ValueError(f"other_agg={other_agg!r} requires a measure column")
    tol_abs = float(spec.config.get("tol_abs", 0.0))
    tol_rel = float(spec.config.get("tol_rel", 0.0))
    pcol = spec.partition_col

    def side(d: DataFrame, a: str, m: str | None, val: str, n: str) -> DataFrame:
        e = F.count(F.lit(1)) if a == "count" else getattr(F, a)(F.col(m))
        return d.groupBy(F.col(pcol).cast("string").alias("partition_key")).agg(
            e.alias(val), F.count(F.lit(1)).alias(n)
        )

    lhs = side(df, agg, measure, "_lhs", "_n_lhs")
    rhs = side(other, other_agg, other_measure, "_rhs", "_n_rhs")
    joined = lhs.join(
        rhs, lhs["partition_key"].eqNullSafe(rhs["partition_key"]), "full_outer"
    ).select(
        F.coalesce(lhs["partition_key"], rhs["partition_key"]).alias("partition_key"),
        lhs["_lhs"].alias("_lhs"),
        rhs["_rhs"].alias("_rhs"),
        F.coalesce(lhs["_n_lhs"], F.lit(0)).alias("n_lhs"),
        F.coalesce(rhs["_n_rhs"], F.lit(0)).alias("n_rhs"),
    )
    # the diff stays in the measure's native type (exact for decimals);
    # only the metric-map projection casts to double
    bad = (
        F.col("_lhs").isNull()
        | F.col("_rhs").isNull()
        | (
            F.abs(F.col("_lhs") - F.col("_rhs"))
            > F.lit(tol_abs) + F.lit(tol_rel) * F.abs(F.col("_rhs"))
        )
    )
    per = joined.select(
        "partition_key",
        F.col("_lhs").cast("double").alias("lhs"),
        F.col("_rhs").cast("double").alias("rhs"),
        (F.col("_lhs") - F.col("_rhs")).cast("double").alias("diff"),
        F.col("n_lhs").cast("double").alias("n_lhs"),
        F.col("n_rhs").cast("double").alias("n_rhs"),
        bad.alias("_bad"),
    )
    verdicts = verdict_frame(
        per,
        spec.id,
        "partition_key",
        fail_when=F.col("_bad"),
        # warm-up guard applies only to groups the left side HAS; a group
        # missing from the left entirely (n_lhs=0) must FAIL, not skip
        skip_when=(F.col("n_lhs") > 0) & (F.col("n_lhs") < spec.min_rows),
        metric_cols=["lhs", "rhs", "diff", "n_lhs", "n_rhs"],
    )
    return CheckResult(violations=empty_violations(df), verdicts=verdicts)
