"""Write-audit-publish gate: validate a staged table, publish only if clean.

The lakehouse WAP pattern composed from the engine's own pieces — the
operational answer to "how do violations actually STOP bad data":

1. **Row audit** (enforcement): every row-level rule routes failing rows
   into quarantine (checks/rowrules.py quarantine_by_rules — zero joins,
   zero shuffles; one narrow map computes every rule once).
2. **Table audit**: the distribution/identity suite runs over the CLEAN
   rows only (quarantined rows must not poison drift baselines or
   uniqueness counts they were just removed from).
3. **Publish**: the clean rows are appended to the destination ONLY if
   no table-level check FAILs. Publish is the LAST side effect —
   quarantine and violations are written first, so a crash between them
   re-audits rather than leaving published-but-unaudited data (the same
   ordering argument as run_with_manifest's violations-before-manifest).

Reference analog: the reference only ever REPORTS anomalies to an output
topic (/root/reference/util/op_base.py:86-97); gating the write is the
validation engine's productionization of that signal.

Scale shape: the staged input is scanned by the rule map (once per
consumer — quarantine write + clean write + suite scans, each
column-pruned) and never joined or shuffled for routing; the publish
decision reads O(partitions x checks) verdict rows. The row counts the
result reports ride the writes themselves (an ``Observation`` metric on
the write action — never a second scan just to count). At 10^12 rows
the cost is the suite itself plus the two writes.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ..checks.base import CheckSpec
from .suite import SuiteResult, run_suite


@dataclass
class PublishResult:
    published: bool
    n_published: int      # rows appended to dest (0 when blocked)
    n_quarantined: int    # rows routed to quarantine by row rules
    blocking: list[tuple[str, str]]  # (partition_key, check_id) of FAIL verdicts
    suite: SuiteResult


def audit_publish(
    df: DataFrame,
    dest: str,
    suite: list[CheckSpec],
    quarantine_dir: str | None = None,
    violations_sink: str | None = None,
    mode: str = "append",
) -> PublishResult:
    """Audit ``df`` with ``suite`` and publish clean rows to ``dest`` iff
    no table-level check FAILs.

    Rule specs in the suite (those carrying a ``_rule_builder``) act as
    the ROW gate: their failing rows go to ``quarantine_dir`` (with a
    ``failed_rules`` column) and never block the publish by themselves —
    they were removed from it. All other specs act as the TABLE gate:
    any FAIL verdict over the clean rows blocks the whole publish
    (SKIPPED does not — warm-up partitions are not evidence of badness).
    """
    rule_specs = [s for s in suite if hasattr(s.fn, "_rule_builder")]
    table_specs = [s for s in suite if not hasattr(s.fn, "_rule_builder")]

    if rule_specs:
        from ..checks.rowrules import quarantine_by_rules

        clean, quarantined = quarantine_by_rules(df, rule_specs)
    else:
        clean, quarantined = df, None

    n_quarantined = 0
    if quarantined is not None:
        if quarantine_dir is not None:
            # count DURING the write (Observation rides the write action's
            # scan) — a separate .count() would re-run the rule map over the
            # whole staged input a second time, doubling the row-audit cost
            # at 10^12 rows
            n_quarantined = _write_counted(
                quarantined, quarantine_dir, mode="append"
            )
        else:
            n_quarantined = quarantined.count()

    res = run_suite(clean, table_specs) if table_specs else None
    blocking: list[tuple[str, str]] = []
    if res is not None:
        if violations_sink is not None:
            res.violations.write.mode("append").parquet(violations_sink)
        blocking = [
            (r["partition_key"], r["check_id"])
            for r in res.verdicts.filter(F.col("verdict") == "FAIL")
            .select("partition_key", "check_id")
            .collect()
        ]

    if blocking:
        if res is not None:
            res.unpersist()
        return PublishResult(False, 0, n_quarantined, blocking, res)

    n_published = _write_counted(clean, dest, mode=mode)
    if res is not None:
        res.unpersist()
    return PublishResult(True, n_published, n_quarantined, blocking, res)


def _write_counted(df: DataFrame, path: str, mode: str) -> int:
    """Parquet write + row count in ONE action: an ``Observation`` metric
    rides the write's own scan, so the input is never re-scanned just to
    report how many rows landed."""
    obs = Observation()
    df.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(mode).parquet(path)
    return int(obs.get["n"])
