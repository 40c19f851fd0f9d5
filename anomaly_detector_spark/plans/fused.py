"""Scan-fused execution of the default check suite.

The naive composition (plans/suite.py) runs each check as an independent
pipeline: correct, modular, oracle-tested — but the full suite then
scans the source table up to 8x (each check x verdicts + violations).
At 100 TB every extra scan is hours. This module compiles the SAME
four checks into a minimal number of passes:

* stats + referential are row-expression checks over the same
  partitioning → ONE groupBy(partition).agg(...) computes both verdict
  frames, and ONE filtered scan emits both checks' violation rows
  (array-of-struct + explode, so a row violating both checks emits both
  envelopes);
* uniqueness drops the window-sort-of-everything for a partial
  aggregated groupBy((key, partition)).count(): the shuffle carries one
  row per distinct key (map-side combined) and is never sorted.
  Violation rows don't need row identity — a duplicated key with n
  copies emits exactly n-1 byte-identical envelope rows — so they are
  regenerated from the counts via explode(sequence(2, n)): zero extra
  scans, zero sort, identical output multiset to the keep-first window
  formulation;
* drift already scans once (pre-aggregated histogram, cached).

Equivalence with the naive path is pinned by tests/test_fused.py: same
verdicts, same violation-row multiset, same check ids.

Scans of the big table per full materialization: 3 for verdicts
(fused agg, uniqueness counts, drift histogram) + 3 for violations
(fused row filter; uniqueness counts for the broadcast dup build; counts
again for the attribution probe) — down from 8, and the only wide
shuffle left is the uniqueness count keyed by the uniform composite key
(skew-immune; AQE splits any residual hot partition). The violations
side regained one scan in round 2 to carry per-partition attribution in
the envelope — measured against the alternatives in PLANS.md; the
manifest path nets ahead because its violations-to-pending re-join
(a wide shuffle of raw rows) was deleted outright.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checks.base import (
    CheckResult,
    CheckSpec,
    as_violations,
    empty_violations,
    null_safe_join,
    verdict_frame,
)
from ..checks.drift import run_drift
from ..checks.referential import run_referential
from ..checks.stats import run_stats, stats_exprs
from ..checks.uniqueness import KEY, run_uniqueness
from ..schema import allowed_langs_df
from .suite import SuiteResult


def fused_row_checks(
    df: DataFrame,
    stats_spec: CheckSpec,
    ref_spec: CheckSpec,
    dim: DataFrame,
    rule_specs: list[CheckSpec] | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame, dict[str, CheckResult], DataFrame]:
    """(stats_verdicts, ref_verdicts, violations, rule_results,
    combined_verdicts) from one agg + one filter scan; the per-check
    verdict frames are filtered views of combined_verdicts.

    Row-rule checks (checks/rowrules.py) fold into the SAME two passes:
    each rule adds a conditional sum to the existing verdict aggregate
    and a struct branch to the existing violations array — so in the
    fused default plan the marginal cost of a rule is an expression, not
    a pass (measured: the 4-rule constraint suite within noise of the
    base suite at 2M rows, BASELINE.md round-3 rules table)."""
    part = stats_spec.partition_col
    col = stats_spec.config.get("column", "content")
    approx = stats_spec.config.get("approx", True)
    max_null_rate = stats_spec.config.get("max_null_rate", 0.02)
    rule_specs = rule_specs or []
    built = [(s, *s.fn._rule_builder(s)) for s in rule_specs]  # type: ignore[attr-defined]

    pre = df.join(
        F.broadcast(dim.select("lang").withColumn("_ok", F.lit(1))), on="lang", how="left"
    )

    agg = pre.groupBy(part).agg(
        *stats_exprs(col, approx=approx),
        F.sum(F.when(F.col("_ok").isNull(), 1).otherwise(0)).alias("n_unknown"),
        *[
            F.sum(bad.cast("int")).alias(f"_rule_bad_{i}")
            for i, (_, bad, _, _) in enumerate(built)
        ],
    )

    # EVERY row-pass check's verdict comes off ONE explode over the same
    # aggregate. Separate verdict_frame selects per check would be
    # column-pruned into per-check aggregate subtrees (the rule branches
    # keep only counts, the stats branch keeps percentiles) — one extra
    # table pass per distinct pruning (measured +4.8s at 8M/local[8] for
    # the rule group). NOTE: a union of the per-check filtered views
    # ALSO re-runs the aggregate per branch (Spark does not reuse
    # identical aggregates across union branches) — suite consumers must
    # union the combined frame once; see CheckResult.shared_verdicts.
    from ..checks.base import FAIL, PASS, SKIPPED

    def _vstruct(cid: str, fail, skip, metric_pairs: list[tuple[str, str]]) -> F.Column:
        v = F.when(skip, F.lit(SKIPPED)).when(fail, F.lit(FAIL)).otherwise(F.lit(PASS))
        metrics = F.create_map(
            *[x for k, c in metric_pairs for x in (F.lit(k), F.col(c).cast("double"))]
        )
        return F.struct(
            F.lit(cid).alias("check_id"), v.alias("verdict"), metrics.alias("metrics")
        )

    vstructs = [
        _vstruct(
            stats_spec.id,
            F.col("null_rate") > max_null_rate,
            F.col("n_rows") < stats_spec.min_rows,
            [
                (c, c)
                for c in (
                    "n_rows", "n_null", "null_rate", "min_len", "max_len",
                    "avg_len", "p50_len", "p99_len", "distinct_content",
                )
            ],
        ),
        _vstruct(
            ref_spec.id,
            F.col("n_unknown") > 0,
            F.col("n_rows") < ref_spec.min_rows,
            [("n_rows", "n_rows"), ("n_unknown", "n_unknown")],
        ),
    ]
    for i, (s, _, _, _) in enumerate(built):
        max_bad = float(s.config.get("max_bad_frac", 0.0))
        vstructs.append(
            _vstruct(
                s.id,
                F.col(f"_rule_bad_{i}") > F.col("n_rows") * F.lit(max_bad),
                F.col("n_rows") < s.min_rows,
                [("n_rows", "n_rows"), ("n_bad", f"_rule_bad_{i}")],
            )
        )
    combined_verdicts = agg.select(
        F.col(part).cast("string").alias("partition_key"),
        F.explode(F.array(*vstructs)).alias("_v"),
    ).select("partition_key", "_v.check_id", "_v.verdict", "_v.metrics")
    # per-check frames are filtered VIEWS; suite-level consumers union
    # `shared_verdicts` once instead (see CheckResult.shared_verdicts —
    # a union of the views re-runs the aggregate per branch).
    stats_verdicts = combined_verdicts.where(F.col("check_id") == stats_spec.id)
    ref_verdicts = combined_verdicts.where(F.col("check_id") == ref_spec.id)

    # One scan, both checks' violation rows. Strings must stay byte-equal
    # to the per-check formulations (checks/stats.py, checks/referential.py).
    null_v = F.when(
        F.col(col).isNull(),
        F.struct(
            F.lit(stats_spec.id).alias("check_id"),
            F.lit("content IS NULL").alias("observed"),
            F.lit("content NOT NULL").alias("expected"),
        ),
    )
    ref_v = F.when(
        F.col("_ok").isNull(),
        F.struct(
            F.lit(ref_spec.id).alias("check_id"),
            F.concat(F.lit("lang="), F.coalesce(F.col("lang"), F.lit("NULL"))).alias("observed"),
            F.lit("lang IN allowed_langs").alias("expected"),
        ),
    )
    rule_vs = [
        F.when(
            bad,
            F.struct(
                F.lit(s.id).alias("check_id"),
                observed.cast("string").alias("observed"),
                F.lit(expected).alias("expected"),
            ),
        )
        for s, bad, observed, expected in built
    ]
    any_bad = F.col(col).isNull() | F.col("_ok").isNull()
    for _, bad, _, _ in built:
        any_bad = any_bad | bad
    violations = (
        pre.filter(any_bad)
        .select(
            "repo", "path", "commit",
            F.col(part).cast("string").alias("partition_key"),
            F.explode(
                F.filter(F.array(null_v, ref_v, *rule_vs), lambda x: x.isNotNull())
            ).alias("_v"),
        )
        .select(
            "repo", "path", "commit", "partition_key",
            "_v.check_id", "_v.observed", "_v.expected",
        )
    )
    # ALL rule verdicts come off ONE explode over the shared aggregate —
    # a per-rule `agg.select(part, n_rows, _rule_bad_i)` branch would be
    # column-pruned differently per rule, defeating exchange reuse and
    # re-scanning the table once per rule (caught by
    # test_folded_rules_add_no_scans). Per-check results are filtered
    # views of the same subtree, so Catalyst plans one aggregate.
    rule_results: dict[str, CheckResult] = {
        s.name: CheckResult(
            violations=empty_violations(df),  # rule rows ride `violations`
            verdicts=combined_verdicts.where(F.col("check_id") == s.id),
            shared_verdicts=combined_verdicts,
        )
        for s, _, _, _ in built
    }
    return stats_verdicts, ref_verdicts, violations, rule_results, combined_verdicts


def fused_uniqueness(df: DataFrame, spec: CheckSpec) -> CheckResult:
    """Aggregation-only uniqueness: no window, no sort, one scan per action."""
    part = spec.partition_col
    key = spec.config.get("key", KEY)
    cid = spec.id

    # Two-level aggregate: per-(key, partition) counts first (one scan,
    # map-side combined), then per-key totals. A key duplicated ACROSS
    # partition values is still a duplicate — grouping by (key, part)
    # alone would miss those (caught by the 16M equivalence run), so the
    # key-level total n is joined back onto the (key, part) counts. Both
    # join inputs derive from the SAME counts_kp aggregate, so Spark
    # reuses the exchange — the table is aggregated once. Two variants
    # benchmarked WORSE at 32M rows: collect_list(struct(part, n_kp))
    # instead of the join (2x slower — per-key list buffers), and
    # broadcast(dup) as the join side (slower — the broadcast build runs
    # as a separate job and forfeits the exchange reuse). The plain join
    # is the measured winner, not just the cleaner-looking plan.
    # config {"salt_buckets": B>1} inserts a salted pre-aggregation level:
    # (key, part, salt) counts first, then (key, part). The default path
    # already map-side combines — a hot key costs one partial row per map
    # task, so the final reducer sees O(n_map_tasks) rows, fine up to
    # ~10^5 tasks — but at extreme task counts (or with partial-agg
    # fallback disabled) the salt caps the reducer fan-in at B rows per
    # (key, part) regardless of cluster size. Salting only restructures
    # the sum, so counts are bit-identical (pinned by
    # test_fused_pathological_hot_key).
    salt_buckets = int(spec.config.get("salt_buckets", 0) or 0)
    if salt_buckets > 1:
        salted = df.withColumn(
            "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
        )
        counts_kp = (
            salted.groupBy(*key, F.col(part).alias("_part"), "_salt")
            .agg(F.count(F.lit(1)).alias("_pn"))
            .groupBy(*key, "_part")
            .agg(F.sum("_pn").alias("n_kp"))
        )
    else:
        counts_kp = df.groupBy(*key, F.col(part).alias("_part")).agg(
            F.count(F.lit(1)).alias("n_kp")
        )
    # The per-key aggregate stays a pure vectorized HashAggregate: sum +
    # min over LONGS. Two slower formulations are banned by measurement:
    # (a) min(_part) as a STRING demotes to ObjectHashAggregate, which
    # falls back to SORT-based aggregation past 128 distinct groups
    # (spark.sql.objectHashAggregate.sortBased.fallbackThreshold) —
    # 2x slower at 2M rows; (b) recovering the survivor partition with a
    # string-min window over the joined dup frame left the probe side a
    # full SortMergeJoin of two ~|keys|-row frames — the violations
    # action measured 48s of a 65s suite pass at 8M rows, local[2]. So
    # the survivor is keyed by the MIN HASH of the partition value —
    # numeric, foldable into the same HashAggregate.
    counts = counts_kp.groupBy(*key).agg(
        F.sum("n_kp").alias("n"),
        F.min(F.xxhash64(F.col("_part"))).alias("_min_h"),
    )

    # Violation attribution without row identity: the window formulation
    # (checks/uniqueness.py) orders its survivor window by
    # xxhash64(partition) first, so per (key, partition) the violation
    # count is n_kp minus one for the partition with the minimal hash
    # (xxhash64 of NULL is the seed constant — consistent both sides, no
    # null-safe special case). Reproduces the window path's
    # (partition_key, observed) multiset exactly (pinned by test_fused)
    # up to a 64-bit hash collision between two partition values of the
    # same duplicated key (~2^-64; would only shift one count between
    # partitions).
    #
    # The dup side (n>1 filter) is EXPLICITLY broadcast: AQE cannot see
    # past the filter (its runtime stat is the pre-filter counts stage,
    # ~|keys| rows) and keeps a sort-merge join — measured 47s vs 17s
    # for the forced broadcast at 8M rows even counting the broadcast's
    # separate build job. Escape hatch for pathological mass-duplication
    # inputs where the dup set itself is huge: config
    # {"broadcast_dup": False} falls back to the shuffle join.
    # null-safe on the key columns: groupBy (and the window path) treat
    # NULL key components as EQUAL, so the join back must too — a plain
    # = join would let NULL-keyed duplicates escape the check.
    dup = counts.filter(F.col("n") > 1).select(*key, "n", "_min_h")
    dup_kp = (
        null_safe_join(
            counts_kp, dup, list(key),
            broadcast_right=spec.config.get("broadcast_dup", True),
        )
        .withColumn(
            "_n_viol",
            F.col("n_kp")
            - (F.xxhash64(F.col("_part")) == F.col("_min_h")).cast("long"),
        )
        .filter(F.col("_n_viol") > 0)
    )
    violations = as_violations(
        dup_kp.select(
            *key, "n", "_part", F.explode(F.sequence(F.lit(1), F.col("_n_viol"))).alias("_i")
        ),
        cid,
        observed=F.concat(F.lit("key seen "), F.col("n").cast("string"), F.lit(" times")),
        expected=F.lit("unique (repo, path, commit)"),
        partition_key=F.col("_part"),
    )

    per_part = (
        null_safe_join(counts_kp, counts.select(*key, "n"), list(key), "left")
        .groupBy(F.col("_part").alias(part))
        .agg(
            F.sum("n_kp").alias("n_rows"),
            F.sum(F.when(F.col("n") > 1, F.col("n_kp")).otherwise(0)).alias("n_dup_rows"),
        )
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


def run_suite_fused(df: DataFrame, suite: list[CheckSpec] | None = None) -> SuiteResult:
    """Drop-in replacement for run_suite over the default check set.

    Falls back to per-check execution for any spec it cannot fuse, so
    custom suites still work; the default suite takes the fused path
    end-to-end.
    """
    from .suite import default_suite

    suite = suite or default_suite()
    by_name = {s.name: s for s in suite}
    results: dict[str, CheckResult] = {}
    extra_violations: list[DataFrame] = []

    stats_spec, ref_spec = by_name.get("stats"), by_name.get("referential")
    fusable = (
        stats_spec is not None
        and ref_spec is not None
        and stats_spec.partition_col == ref_spec.partition_col
        and ref_spec.config.get("dim_df") is None
    )
    rule_specs = [
        s
        for name, s in by_name.items()
        if name not in ("stats", "referential") and hasattr(s.fn, "_rule_builder")
    ]
    folded: list[CheckSpec] = []
    if fusable:
        # Rule checks sharing the stats partition_col fold INTO the
        # stats+referential passes: each rule is an extra conditional sum
        # on the verdict aggregate and an extra struct branch on the
        # violations filter scan — zero extra passes however many rules
        # the suite carries.
        folded = [s for s in rule_specs if s.partition_col == stats_spec.partition_col]
        dim = allowed_langs_df(df.sparkSession)
        sv, rv, viol, rule_results, combined = fused_row_checks(
            df, stats_spec, ref_spec, dim, rule_specs=folded
        )
        results["stats"] = CheckResult(
            violations=empty_violations(df), verdicts=sv, shared_verdicts=combined
        )
        results["referential"] = CheckResult(
            violations=empty_violations(df), verdicts=rv, shared_verdicts=combined
        )
        results.update(rule_results)
        extra_violations.append(viol)
    else:
        if stats_spec:
            results["stats"] = run_stats(df, stats_spec)
        if ref_spec:
            results["referential"] = run_referential(df, ref_spec)
    # Rules with no shared pass to ride (no fusable stats+referential, or
    # a different partition_col) still fuse per partition_col group into
    # ONE violations scan + ONE verdict aggregate of their own.
    leftover = [s for s in rule_specs if s not in folded]
    if leftover:
        from ..checks.rowrules import fused_rule_checks

        groups: dict[str, list[CheckSpec]] = {}
        for s in leftover:
            groups.setdefault(s.partition_col, []).append(s)
        for specs in groups.values():
            results.update(fused_rule_checks(df, specs))

    if "uniqueness" in by_name:
        results["uniqueness"] = fused_uniqueness(df, by_name["uniqueness"])
    if "drift" in by_name:
        results["drift"] = run_drift(df, by_name["drift"])
    for name, spec in by_name.items():
        if name not in results:
            results[name] = spec.run(df)

    violations = reduce(
        DataFrame.unionByName,
        [r.violations for r in results.values()] + extra_violations,
    )
    from .suite import union_check_verdicts

    verdicts = union_check_verdicts(results)
    verdicts = verdicts.withColumn("emitted_at", F.current_timestamp())
    return SuiteResult(violations=violations, verdicts=verdicts, per_check=results)


def run_uniqueness_window(df: DataFrame, spec: CheckSpec) -> CheckResult:
    """Alias of the window-based formulation (kept for equivalence tests)."""
    return run_uniqueness(df, spec)
