"""Uniqueness check on (repo, path, commit) with skew-safe two-phase counting.

Semantics: the reference deduplicates its per-device history keeping the
FIRST row for a duplicated index (/root/reference/algo/operator.py:92
``series[~series.index.duplicated(keep='first')]``). Reframed: every
(repo, path, commit) key must appear exactly once; extra occurrences are
violations, with one deterministic survivor per key exempted.

Survivor attribution (which PARTITION the exempt row is counted under)
is pinned to the key's minimal-``xxhash64(partition)`` partition; the
order expression only breaks ties WITHIN that partition. This makes
per-partition violation counts partitioning-invariant AND lets the fused
aggregation-only plan reproduce them with a numeric ``min()`` (a string
min would demote the hash aggregate to sort-based). Note this is a
different (coarser) pin than ``dedup_keep_first``, which orders by
``order_col`` alone — the check's exempt survivor may therefore sit in a
different partition than the row dedup_keep_first would keep; the two
answer different questions (accounting vs row selection).

Scale design (SURVEY.md §4.3): a naive ``groupBy(repo,path,commit)``
hash-aggregates with map-side partial counts, which Spark already
handles well even under repo skew because the *composite* key is high
cardinality. The salted two-phase path exists for the pathological case
of a single hot (repo,path,commit) key (mega-repo with one file shape):
phase 1 counts per (key, salt), phase 2 sums per key — both partial
aggregates, bounded-size shuffle. ``dedup_keep_first`` provides the
survivor-selection operator used by pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .base import CheckResult, CheckSpec, as_violations, verdict_frame

KEY = ["repo", "path", "commit"]


def duplicate_counts(df: DataFrame, key: list[str] = KEY, salt_buckets: int = 0) -> DataFrame:
    """count per key, optionally via salted two-phase aggregation."""
    if salt_buckets <= 1:
        return df.groupBy(*key).agg(F.count(F.lit(1)).alias("n"))
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(*[F.col(c) for c in key], F.monotonically_increasing_id()), F.lit(salt_buckets)))
    partial = salted.groupBy(*key, "_salt").agg(F.count(F.lit(1)).alias("_pn"))
    return partial.groupBy(*key).agg(F.sum("_pn").alias("n"))


def dedup_keep_first(df: DataFrame, key: list[str] = KEY, order_col: str = "content") -> DataFrame:
    """Deterministic keep-first dedup: survivor = min(order_col) per key.

    The reference's keep='first' depends on arrival order; in a
    distributed table there is no arrival order, so we pin a total order
    (order_col, e.g. content or an ingest timestamp) to make the
    survivor invariant under partitioning — required for the
    two-parallelism determinism gate (SURVEY.md §7 hard part 4).
    """
    w = Window.partitionBy(*[F.col(c) for c in key]).orderBy(F.col(order_col).asc_nulls_last())
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def run_commit_bloat(df: DataFrame, spec: CheckSpec) -> CheckResult:
    """Snapshot-bloat check: the SAME (repo, path) carrying byte-equal
    content under MULTIPLE commits. Key-uniqueness can't see it (the
    commits differ, so the keys differ) and vendored-content won't
    either (same repo) — yet a file unchanged across k snapshots lands
    k times in a training corpus, multiplying its weight for free.

    Same slim single-exchange shape as run_uniqueness: one window over
    (repo, path, xxhash64(content)) — the composite is high-cardinality
    so the exchange is skew-immune, and content itself never rides the
    shuffle (hashed map-side). The minimal-commit row per group is the
    exempt survivor (deterministic, binary collation); every other
    occurrence is a violation attributed to its own carried partition
    value. NULL content rows are excluded (completeness's concern).

    config: ``column`` ('content'). Violations + per-partition verdicts
    with n_bloat_rows metrics; FAIL when any bloat row exists.
    """
    part = spec.partition_col
    col = spec.config.get("column", "content")
    cid = spec.id

    wkey = Window.partitionBy("repo", "path", F.xxhash64(F.col(col)))
    slim = df.filter(F.col(col).isNotNull()).select(
        "repo",
        "path",
        "commit",
        F.col(part).alias("_part"),
        F.count(F.lit(1)).over(wkey).alias("n"),
        F.row_number().over(wkey.orderBy(F.col("commit").asc_nulls_last())).alias("_rn"),
    )
    offenders = slim.filter((F.col("n") > 1) & (F.col("_rn") > 1))
    violations = as_violations(
        offenders,
        cid,
        observed=F.concat(
            F.lit("content repeated across "), F.col("n").cast("string"), F.lit(" commits")
        ),
        expected=F.lit("one commit per unchanged (repo, path) content"),
        partition_key=F.col("_part"),
    )
    per_part = slim.groupBy(F.col("_part").alias(part)).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(((F.col("n") > 1) & (F.col("_rn") > 1)).cast("long")).alias("n_bloat_rows"),
    )
    verdicts = verdict_frame(
        per_part,
        cid,
        part,
        fail_when=F.col("n_bloat_rows") > 0,
        skip_when=F.col("n_rows") < spec.min_rows,
        metric_cols=["n_rows", "n_bloat_rows"],
    )
    return CheckResult(violations=violations, verdicts=verdicts, metrics=per_part)


def run_uniqueness(df: DataFrame, spec: CheckSpec) -> CheckResult:
    part = spec.partition_col
    key = spec.config.get("key", KEY)
    order_col = spec.config.get("order_col", "content")
    cid = spec.id

    # Single-shuffle design: project down to (key, partition, order) BEFORE
    # the window — `content` must never ride a shuffle (SURVEY.md §7 hard
    # part 5), so when it is the tiebreak we sort on xxhash64(content)
    # instead (8 bytes per row instead of the payload). Survivor identity
    # under hash ties is irrelevant: tied rows are byte-identical in every
    # output column. count(*) and row_number share one window partitioning,
    # so Spark plans ONE hash-partition exchange + one sort for both.
    ord_expr = (
        F.xxhash64(F.col(order_col)) if order_col == "content" else F.col(order_col)
    )
    # Survivor ordering: xxhash64 of the partition value FIRST, tiebreak
    # on the order expression. Pinning the survivor to the key's
    # minimal-HASH partition makes the per-partition attribution of
    # violation rows deterministic and partitioning-invariant — and lets
    # the fused aggregation-only formulation (plans/fused.py) reproduce
    # the exact same (partition_key, count) multiset with a numeric
    # min() that stays inside a vectorized HashAggregate (a string min
    # would demote it to sort-based aggregation). xxhash64(NULL) is the
    # seed constant, so NULL partitions order consistently too.
    wkey = Window.partitionBy(*[F.col(c) for c in key])
    slim = df.select(
        *key,
        F.col(part).alias("_part"),
        F.count(F.lit(1)).over(wkey).alias("n"),
        F.row_number()
        .over(wkey.orderBy(F.xxhash64(F.col(part)).asc(), ord_expr.asc_nulls_last()))
        .alias("_rn"),
    )

    offenders = slim.filter((F.col("n") > 1) & (F.col("_rn") > 1))
    violations = as_violations(
        offenders,
        cid,
        observed=F.concat(F.lit("key seen "), F.col("n").cast("string"), F.lit(" times")),
        expected=F.lit("unique (repo, path, commit)"),
        partition_key=F.col("_part"),
    )

    per_part = slim.groupBy(F.col("_part").alias(part)).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("n") > 1).cast("long")).alias("n_dup_rows"),
    )
    verdicts = verdict_frame(
        per_part,
        cid,
        part,
        fail_when=F.col("n_dup_rows") > 0,
        skip_when=F.col("n_rows") < spec.min_rows,
        metric_cols=["n_rows", "n_dup_rows"],
    )
    return CheckResult(violations=violations, verdicts=verdicts, metrics=per_part)
