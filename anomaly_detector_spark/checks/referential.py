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


def fk_missing_keys(
    fact: DataFrame,
    fk: str,
    dim: DataFrame,
    ref: str,
) -> DataFrame:
    """Foreign-key values in ``fact`` with no match in ``dim``, with how
    many fact rows carry each — the referential check's scale path for
    dimensions too large to broadcast (a 10^9-key entity table, not a
    5-row lang dim).

    Both join inputs are PRE-AGGREGATED to distinct keys before they
    meet: the fact side collapses to one (fk, n_rows) row per distinct
    value (map-side combined — the shuffle carries |distinct fk| rows,
    never fact rows), and the dim side ships only its key column
    (column-pruned to the scan). The anti-join is then |distinct fk| vs
    |dim| keys — a key-keyed shuffle join of two already-small frames,
    with AQE free to pick broadcast at runtime if either side turns out
    tiny. NULL fk is a violation (it matches nothing), kept by the
    anti-join since NULL never equals a dim key.
    """
    fkeys = fact.groupBy(F.col(fk).alias("fk_value")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    return fkeys.join(
        dim.select(F.col(ref).alias("fk_value")), on="fk_value", how="left_anti"
    )


def orphan_dim_keys(
    dim: DataFrame,
    ref: str,
    fact: DataFrame,
    fk: str,
) -> DataFrame:
    """The reverse direction: ``dim`` keys no fact row references —
    dead entities (customers who never ordered, langs no file uses).
    Not a violation of integrity, but the coverage metric a dimension
    owner audits; same aggregated-before-join shape as fk_missing_keys
    (the fact side collapses to distinct fk values first, so the
    anti-join never sees a fact row)."""
    refd = fact.select(F.col(fk).alias(ref)).distinct()
    return dim.join(refd, on=ref, how="left_anti")


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
