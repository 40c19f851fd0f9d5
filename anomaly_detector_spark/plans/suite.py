"""Check-suite composition and execution.

The suite is the engine's "logical plan": a registry of CheckSpecs (the
analog of the reference's selector routing table,
/root/reference/util/__init__.py:98-103) composed into one job. Each
check declares its pipeline with the DataFrame API; Catalyst plans the
whole suite together, so common subexpressions like the base scan are
shared when the input is cached and column pruning keeps checks that
never read ``content`` (uniqueness, referential) off the heavy column.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checks.base import CheckResult, CheckSpec
from ..checks.drift import run_drift
from ..checks.referential import run_referential
from ..checks.stats import run_stats
from ..checks.uniqueness import run_uniqueness


@dataclass
class SuiteResult:
    violations: DataFrame  # unioned canonical violation rows
    verdicts: DataFrame    # unioned (partition_key, check_id, verdict, metrics)
    per_check: dict[str, CheckResult]

    def unpersist(self, blocking: bool = False) -> None:
        """Release per-check caches (drift histograms/scores). Call after
        the result frames are materialized — further actions on them will
        recompute from source."""
        for r in self.per_check.values():
            for c in r.caches:
                try:
                    c.unpersist(blocking=blocking)
                except Exception:
                    pass
            r.caches = []

    def materialize(self, parallel: bool = True) -> tuple[int, int]:
        """Count both result frames; returns (n_verdicts, n_violations).

        ``parallel=True`` submits the two actions from two driver
        threads. The verdicts job and the violations job have disjoint
        bottleneck phases (the verdicts action is aggregate/shuffle
        bound, the violations action is scan/filter bound), so even
        under the default FIFO scheduler their stages interleave and
        the cluster stays saturated — measured 6.0s → 4.5s (2M rows,
        local[32], warm; BASELINE.md round-3 table) for the full fused
        suite versus sequential counts. Spark job submission is
        thread-safe by design (one SparkContext, many scheduler
        clients); this is the standard multi-action overlap pattern,
        not a local[*] artifact — on a multi-executor cluster the win
        is the same idle-stage backfill. Exceptions from either thread
        re-raise here."""
        if not parallel:
            return self.verdicts.count(), self.violations.count()
        import concurrent.futures

        with concurrent.futures.ThreadPoolExecutor(max_workers=2) as ex:
            fv = ex.submit(self.verdicts.count)
            fw = ex.submit(self.violations.count)
            return fv.result(), fw.result()

    def summary(self) -> DataFrame:
        """Per-check verdict counts + per-check violation counts in one
        small frame — a convenience for reporting. NOTE: materializing
        this single unioned plan measured SLOWER than two separate count
        actions on the 16M-row bench (AQE plans the union monolithically
        and no exchange reuse materialized) — prefer separate actions in
        hot paths."""
        v = (
            self.verdicts.groupBy("check_id", "verdict")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("kind", F.lit("verdicts"))
        )
        w = (
            self.violations.groupBy("check_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("verdict", F.lit(None).cast("string"))
            .withColumn("kind", F.lit("violations"))
        )
        return v.unionByName(w.select("check_id", "verdict", "n", "kind"))


def union_check_verdicts(results: dict[str, CheckResult]) -> DataFrame:
    """Union per-check verdicts, taking each SHARED combined frame once.

    Checks whose verdicts are filtered views of one shared plan (the
    fused row-check family) expose it via CheckResult.shared_verdicts;
    unioning the views instead would re-execute the shared aggregate once
    per check — measured as one extra full table pass per branch (Spark
    does not collapse them via exchange reuse)."""
    frames: list[DataFrame] = []
    seen: set[int] = set()
    for r in results.values():
        if r.shared_verdicts is not None:
            if id(r.shared_verdicts) not in seen:
                seen.add(id(r.shared_verdicts))
                frames.append(r.shared_verdicts)
        else:
            frames.append(r.verdicts)
    return reduce(DataFrame.unionByName, frames)


def default_suite(partition_col: str = "lang", min_rows: int = 25) -> list[CheckSpec]:
    return [
        CheckSpec("stats", run_stats, {"column": "content", "approx": True}, partition_col, min_rows),
        CheckSpec("uniqueness", run_uniqueness, {}, partition_col, min_rows),
        CheckSpec("referential", run_referential, {}, partition_col, min_rows),
        CheckSpec("drift", run_drift, {"column": "content"}, partition_col, min_rows),
    ]


def extended_suite(partition_col: str = "lang", min_rows: int = 25) -> list[CheckSpec]:
    """default_suite plus the categorical count-drift check (the
    north_star's second drift dimension). Separate factory so the
    default suite_id — and every committed manifest keyed by it — stays
    stable; switching suites re-validates by design (T3)."""
    from ..checks.drift import run_count_drift

    return default_suite(partition_col, min_rows) + [
        CheckSpec("count_drift", run_count_drift, {}, partition_col, min_rows),
    ]


def constraint_suite(
    partition_col: str = "lang",
    min_rows: int = 25,
    rules: list[CheckSpec] | None = None,
) -> list[CheckSpec]:
    """extended_suite plus row-level constraint rules (checks/rowrules.py).

    The default rule set encodes the files-table contract: commit is a
    40-hex sha, lang within the allowed dimension's code set, content
    present, and a cross-column size predicate. Pass ``rules`` to replace
    it. The fused runner folds ALL rule checks into one extra violations
    scan + one verdict aggregate regardless of rule count.
    """
    from ..checks.rowrules import (
        run_accepted_values,
        run_completeness,
        run_format,
        run_row_predicate,
    )
    from ..schema import ALLOWED_LANGS

    if rules is None:
        rules = [
            CheckSpec(
                "format_commit",
                run_format,
                {"column": "commit", "pattern": "^[0-9a-f]{40}$"},
                partition_col,
                min_rows,
            ),
            CheckSpec(
                "accepted_lang",
                run_accepted_values,
                {"column": "lang", "values": sorted(l for l, _ in ALLOWED_LANGS)},
                partition_col,
                min_rows,
            ),
            CheckSpec(
                "complete_content",
                run_completeness,
                {"column": "content"},
                partition_col,
                min_rows,
            ),
            CheckSpec(
                "size_cap",
                run_row_predicate,
                {"expr": "length(content) <= 1048576"},
                partition_col,
                min_rows,
            ),
        ]
    return extended_suite(partition_col, min_rows) + rules


def run_suite(
    df: DataFrame,
    suite: list[CheckSpec] | None = None,
    cache: bool = False,
    fused: bool = True,
) -> SuiteResult:
    """Run the suite. ``fused=True`` (default) takes the scan-minimal plan
    (plans/fused.py — 5 scans instead of 8, no window sort); ``fused=False``
    runs each check as its own pipeline (the reference formulation the
    fused plan is equivalence-tested against). ``cache`` caches the input
    table first — only worth it when the input is far smaller than
    executor storage memory; the fused plan makes it unnecessary."""
    suite = suite or default_suite()
    if cache:
        df = df.cache()
    if fused:
        from .fused import run_suite_fused

        return run_suite_fused(df, suite)
    results = {s.name: s.run(df) for s in suite}
    violations = reduce(DataFrame.unionByName, [r.violations for r in results.values()])
    verdicts = union_check_verdicts(results)
    # Envelope columns mirroring the reference's output message
    # {pipeline_id, operator_id, analytics, time} (/root/reference/util/op_base.py:86-97).
    verdicts = verdicts.withColumn("emitted_at", F.current_timestamp())
    return SuiteResult(violations=violations, verdicts=verdicts, per_check=results)
