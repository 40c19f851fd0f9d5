"""Referential check: lang must exist in the allowed-language dimension.

The reference routes each message by matching its identifiers against
the configured filter set (/root/reference/util/__init__.py:61-95 with
util/op_base.py:63); unmatched messages are silently ignored. Reframed
as a real relational operation: rows whose ``lang`` is absent from the
dimension are violations.

Scale design: the dimension is tiny → an explicit ``F.broadcast``
anti-join. Zero shuffle of the fact table; the plan is a map-side
BroadcastHashJoin (LeftAnti) inside one WholeStageCodegen span, so this
check costs one scan at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import allowed_langs_df
from .base import CheckResult, CheckSpec, as_violations, verdict_frame


def unknown_lang_rows(df: DataFrame, dim: DataFrame) -> DataFrame:
    """Rows whose lang has no match in dim (NULL lang is also a violation)."""
    return df.join(F.broadcast(dim.select("lang")), on="lang", how="left_anti")


def run_referential(df: DataFrame, spec: CheckSpec) -> CheckResult:
    part = spec.partition_col
    cid = spec.id
    dim = spec.config.get("dim_df") or allowed_langs_df(df.sparkSession)

    bad = unknown_lang_rows(df, dim)
    violations = as_violations(
        bad,
        cid,
        observed=F.concat(F.lit("lang="), F.coalesce(F.col("lang"), F.lit("NULL"))),
        expected=F.lit("lang IN allowed_langs"),
        partition_key=F.col(part),
    )

    # Per-partition verdict via one aggregate over a broadcast semi-join flag.
    flagged = df.join(
        F.broadcast(dim.select("lang").withColumn("_ok", F.lit(1))), on="lang", how="left"
    )
    per_part = flagged.groupBy(part).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("_ok").isNull(), 1).otherwise(0)).alias("n_unknown"),
    )
    verdicts = verdict_frame(
        per_part,
        cid,
        part,
        fail_when=F.col("n_unknown") > 0,
        skip_when=F.col("n_rows") < spec.min_rows,
        metric_cols=["n_rows", "n_unknown"],
    )
    return CheckResult(violations=violations, verdicts=verdicts, metrics=per_part)
