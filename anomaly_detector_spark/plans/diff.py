"""Run-over-run violation diffing: new / resolved / persisting.

The reference emits a fresh anomaly verdict per message and keeps no
memory of what it already reported (/root/reference/util/op_base.py:86-97
— every output message stands alone); an operator that fires today AND
fired yesterday notifies twice. A validation engine wants the delta: of
this run's violations, which are NEW (regressions to page on), which
prior ones are RESOLVED (fixes to confirm), and which PERSIST (known
debt). This module computes that classification between any two
violation frames — typically two run_ids of the same violations sink,
which run_with_manifest stamps with run_id/suite_id for exactly this.

Scale shape: one shuffle total. Instead of a full-outer join (two
shuffled sides + join), both sides union with presence tags and a single
groupBy over the violation identity aggregates the counts — map-side
combined, so the shuffle carries one row per (identity, side-tag batch)
per map task. Violation identity is (repo, path, commit, partition_key,
check_id): `observed` is deliberately excluded so a violation whose
observed value drifts (e.g. a growing dup count) persists rather than
re-paging as new+resolved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IDENTITY = ["repo", "path", "commit", "partition_key", "check_id"]

NEW, RESOLVED, PERSISTING = "new", "resolved", "persisting"


def violations_diff(
    cur: DataFrame, prev: DataFrame, identity: list[str] | None = None
) -> DataFrame:
    """One row per violation identity seen in either frame:
    (identity..., n_cur, n_prev, status). n_* count the envelope rows on
    each side (a key duplicated n times emits n-1 uniqueness violations,
    so the counts carry magnitude — a status of `persisting` with
    n_cur > n_prev is a worsening violation)."""
    identity = identity or IDENTITY
    a = cur.select(*identity).withColumn("_c", F.lit(1)).withColumn("_p", F.lit(0))
    b = prev.select(*identity).withColumn("_c", F.lit(0)).withColumn("_p", F.lit(1))
    g = (
        a.unionByName(b)
        .groupBy(*identity)
        .agg(
            F.sum("_c").cast("long").alias("n_cur"),
            F.sum("_p").cast("long").alias("n_prev"),
        )
    )
    status = (
        F.when((F.col("n_cur") > 0) & (F.col("n_prev") > 0), F.lit(PERSISTING))
        .when(F.col("n_cur") > 0, F.lit(NEW))
        .otherwise(F.lit(RESOLVED))
    )
    return g.withColumn("status", status)


def violations_diff_runs(
    sink: DataFrame, cur_run: str, prev_run: str, identity: list[str] | None = None
) -> DataFrame:
    """Diff two run_ids of a stamped violations sink (plans/manifest.py
    writes run_id/suite_id on every row). Both filters prune on the same
    scan; partition the sink by run_id for pruning at scale."""
    return violations_diff(
        sink.where(F.col("run_id") == cur_run),
        sink.where(F.col("run_id") == prev_run),
        identity,
    )


ADDED, REMOVED, CHANGED, UNCHANGED = "added", "removed", "changed", "unchanged"


def snapshot_diff(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """CDC-style diff of two table snapshots by key: one row per key seen
    in either snapshot, status in added | removed | changed | unchanged,
    plus each side's row count.

    Rows are reduced to ``xxhash64`` of the compared columns BEFORE any
    shuffle — wide columns (content) never ride an exchange — and both
    sides union with side tags into ONE map-side-combined groupBy (the
    violations_diff shape), so the whole diff is a single shuffle of
    (keys, hash) rows. Per key, each side aggregates to a MULTISET
    fingerprint (row count + exact decimal sum of row hashes), which
    makes duplicate keys first-class: a key is `unchanged` only when both
    sides hold the same multiset of row contents (same count, same hash
    sum — hash-collision caveat as for every hash-based dedup here).
    NULL key columns group like any other value.

    The status semantics are the snapshot dual of violations_diff:
    added ~ new, removed ~ resolved, changed/unchanged split persisting
    by content equality.
    """
    compare_cols = compare_cols or [c for c in left.columns if c not in keys]
    h = F.xxhash64(F.struct(*[F.col(c) for c in compare_cols])).cast("decimal(38,0)")

    def prep(d: DataFrame, lt: int, rt: int) -> DataFrame:
        return d.select(
            *keys,
            (h * lt).alias("_hl"),
            (h * rt).alias("_hr"),
            F.lit(lt).alias("_nl"),
            F.lit(rt).alias("_nr"),
        )

    g = (
        prep(left, 1, 0)
        .unionByName(prep(right, 0, 1))
        .groupBy(*keys)
        .agg(
            F.sum("_nl").cast("long").alias("n_left"),
            F.sum("_nr").cast("long").alias("n_right"),
            F.sum("_hl").alias("_sl"),
            F.sum("_hr").alias("_sr"),
        )
    )
    status = (
        F.when(F.col("n_right") == 0, F.lit(REMOVED))
        .when(F.col("n_left") == 0, F.lit(ADDED))
        .when(
            (F.col("n_left") == F.col("n_right"))
            & F.col("_sl").eqNullSafe(F.col("_sr")),
            F.lit(UNCHANGED),
        )
        .otherwise(F.lit(CHANGED))
    )
    return g.withColumn("status", status).drop("_sl", "_sr")
