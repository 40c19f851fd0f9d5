"""Check framework: specs, content-addressed ids, and result envelopes.

A check is a pure function ``DataFrame -> CheckResult`` where the result
carries three DataFrames:

* ``violations`` — one row per offending file:
  (repo, path, commit, check_id, observed, expected)
* ``verdicts``   — one row per (partition_key, check_id):
  verdict in PASS | FAIL | SKIPPED, plus a metrics map
* ``metrics``    — optional wide per-partition stats (check-specific)

The check_id is a sha256 over the canonical (sorted) representation of
the check's configuration — the same content-addressing idea the
reference uses for its filters (/root/reference/util/__init__.py:106-139
hash_str/hash_list/hash_dict + gen_filter), so two deployments with the
same config produce the same ids and manifest rows are stable across
runs.

Verdict semantics mirror the reference's operator states: SKIPPED is the
warm-up / minimum-rows guard (analog of the 1-day buffer at
/root/reference/algo/operator.py:164-170).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VIOLATION_COLS = ["repo", "path", "commit", "partition_key", "check_id", "observed", "expected"]
PASS, FAIL, SKIPPED = "PASS", "FAIL", "SKIPPED"


def _canonical(obj: Any) -> str:
    return json.dumps(obj, sort_keys=True, separators=(",", ":"), default=str)


def check_id(name: str, config: dict[str, Any] | None = None) -> str:
    """Content-addressed check id: sha256 of the canonical config."""
    return hashlib.sha256(_canonical({"name": name, "config": config or {}}).encode()).hexdigest()


@dataclass
class CheckResult:
    violations: DataFrame
    verdicts: DataFrame
    metrics: DataFrame | None = None
    # cached intermediate frames (e.g. drift histograms) — the suite
    # runner unpersists them once outputs are materialized, so repeated
    # invocations (streaming micro-batches, bench loops) don't leak
    # executor storage memory for the session lifetime.
    caches: list[DataFrame] = field(default_factory=list)
    # The drift check's cached pre-aggregated histogram (partition_key,
    # bucket, n) — exposed so run_with_manifest can persist the run's
    # pooled histogram for rolling baselines WITHOUT a second scan of
    # the input (the frame is already cached for the scoring plan).
    hist: DataFrame | None = None
    # When several checks' verdicts come off ONE shared plan (the fused
    # row-check family: stats + referential + rules over a single
    # aggregate), every member carries the SAME combined frame here and
    # `verdicts` is a filtered view of it. Suite-level consumers must
    # union the shared frame once (dedup by object identity) instead of
    # unioning the views — measured (Spark 4.1, AQE on): a union of the
    # filtered views re-executed the shared aggregate once per branch;
    # exchange reuse did not collapse them.
    shared_verdicts: DataFrame | None = None


@dataclass
class CheckSpec:
    """A named, configured check. ``fn(df, spec) -> CheckResult``."""

    name: str
    fn: Callable[[DataFrame, "CheckSpec"], CheckResult]
    config: dict[str, Any] = field(default_factory=dict)
    partition_col: str = "lang"
    min_rows: int = 1

    @property
    def id(self) -> str:
        # DataFrame-valued config (e.g. an injected frozen baseline_df or
        # dim_df) is runtime state, not configuration — excluding it keeps
        # the check id stable whether a baseline is injected or not, so
        # manifest rows written with and without T2 baseline injection
        # refer to the same check.
        cfg = {k: v for k, v in self.config.items() if not isinstance(v, DataFrame)}
        return check_id(
            self.name,
            {**cfg, "partition_col": self.partition_col, "min_rows": self.min_rows},
        )

    def run(self, df: DataFrame) -> CheckResult:
        return self.fn(df, self)


def empty_violations(df: DataFrame) -> DataFrame:
    """An empty violations frame with the canonical schema."""
    spark = df.sparkSession
    return spark.createDataFrame(
        [],
        "repo string, path string, commit string, partition_key string, "
        "check_id string, observed string, expected string",
    )


def as_violations(
    df: DataFrame,
    cid: str,
    observed: F.Column,
    expected: F.Column,
    partition_key: F.Column,
) -> DataFrame:
    """Project offending rows onto the canonical violation envelope.

    ``partition_key`` is carried at emission time so downstream
    per-partition accounting (manifest n_violations) is a plain groupBy —
    never a join back to the source table to recover the key.
    """
    return df.select(
        F.col("repo"),
        F.col("path"),
        F.col("commit"),
        partition_key.cast("string").alias("partition_key"),
        F.lit(cid).alias("check_id"),
        observed.cast("string").alias("observed"),
        expected.cast("string").alias("expected"),
    )


def null_safe_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Equi-join that treats NULL keys as EQUAL (SQL ``<=>``).

    A NULL table-partition is a legitimate group everywhere this engine
    aggregates (groupBy folds NULLs into one group), so every join back
    on the group key must match it too — a plain ``=`` join silently
    drops or zeroes NULL partitions (the count_drift bug class from the
    round-2 advice; the same latent defect existed in the bloom probe,
    KMV set algebra, drift grid, slot coverage, top-k bounds, and three
    manifest accounting joins before they were moved onto this helper).

    The right side's key columns are renamed away before the join, so
    the output carries exactly the left frame's key columns (coalesced
    with the right's for outer joins where the right side can be the
    only one holding the key) plus both sides' payload columns.
    EqualNullSafe is an equi-predicate: broadcast-hash / shuffled-hash
    strategies still apply — no nested-loop demotion.
    """
    renamed = right
    for k in keys:
        renamed = renamed.withColumnRenamed(k, f"_nsj_{k}")
    if broadcast_right:
        renamed = F.broadcast(renamed)
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"_nsj_{k}"))
        cond = c if cond is None else cond & c
    joined = left.join(renamed, cond, how)
    if how in ("left_semi", "semi", "left_anti", "anti"):
        return joined
    if how in ("full", "full_outer", "fullouter", "outer",
               "right", "right_outer", "rightouter"):
        for k in keys:
            joined = joined.withColumn(k, F.coalesce(F.col(k), F.col(f"_nsj_{k}")))
    return joined.drop(*[f"_nsj_{k}" for k in keys])


def verdict_frame(
    per_partition: DataFrame,
    cid: str,
    partition_col: str,
    fail_when: F.Column,
    skip_when: F.Column | None = None,
    metric_cols: list[str] | None = None,
) -> DataFrame:
    """Collapse per-partition stats into the verdict envelope.

    One row per partition value, verdict = SKIPPED if skip_when,
    else FAIL if fail_when, else PASS. ``metric_cols`` become a
    map<string,double> column.
    """
    v = F.when(fail_when, F.lit(FAIL)).otherwise(F.lit(PASS))
    if skip_when is not None:
        v = F.when(skip_when, F.lit(SKIPPED)).otherwise(v)
    metrics = F.create_map(
        *[x for c in (metric_cols or []) for x in (F.lit(c), F.col(c).cast("double"))]
    )
    return per_partition.select(
        F.col(partition_col).cast("string").alias("partition_key"),
        F.lit(cid).alias("check_id"),
        v.alias("verdict"),
        metrics.alias("metrics"),
    )
