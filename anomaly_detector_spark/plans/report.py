"""Markdown validation report from manifest metadata — the human
surface over scorecard/incidents.

The reference's human surface is a formatted anomaly message produced
per event (/root/reference/algo/operator.py:181-187); the reframed
engine's unit of communication is a RUN, so the report renders the
operational state of the whole table after a run: latest-run verdict
mix, per-check burn-down (fail rates, current streaks), and open
incidents with their start dates.

Everything here is driver-side rendering over the manifest's
O(runs x partitions x checks) METADATA rows — the data tables are
never touched, so the report costs the same at 10^12 files as at 10^3.
The only collected frames are the scorecard (O(checks)) and the
incident head (capped at ``top``), both bounded.

``check_names``: the manifest stores content-addressed check ids (the
reference's gen_filter convention); pass the live suite's {id: name}
mapping to render names — ids are still shown truncated so two
configs of the same check stay distinguishable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checks.base import CheckSpec


def name_map(suite: list[CheckSpec]) -> dict[str, str]:
    return {s.id: s.name for s in suite}


def _fmt(v) -> str:
    if v is None:
        return "-"
    if isinstance(v, float):
        return f"{v:.4f}".rstrip("0").rstrip(".") or "0"
    return str(v)


def _table(rows: list[dict], cols: list[tuple[str, str]]) -> list[str]:
    out = ["| " + " | ".join(h for _, h in cols) + " |"]
    out.append("|" + "|".join("---" for _ in cols) + "|")
    for r in rows:
        out.append("| " + " | ".join(_fmt(r.get(k)) for k, _ in cols) + " |")
    return out


def render_report(
    manifest: DataFrame,
    suite_sid: str | None = None,
    check_names: dict[str, str] | None = None,
    top: int = 15,
    title: str = "Validation report",
) -> str:
    """Render the manifest's operational state as a markdown document."""
    from .manifest import incidents, scorecard

    names = check_names or {}

    def label(cid: str) -> str:
        n = names.get(cid)
        return f"{n} ({cid[:12]})" if n else cid[:12]

    m = manifest
    if suite_sid is not None:
        m = m.filter(F.col("suite_id") == suite_sid)

    head = m.agg(
        F.countDistinct("run_id").alias("n_runs"),
        F.countDistinct("partition_key").alias("n_partitions"),
        F.countDistinct("check_id").alias("n_checks"),
        F.max_by("run_id", F.struct("committed_at", "run_id")).alias("latest_run"),
        F.max("committed_at").alias("latest_at"),
    ).collect()[0]

    lines = [f"# {title}", ""]
    if head["n_runs"] == 0 or head["n_runs"] is None:
        lines.append("No committed manifest rows yet.")
        return "\n".join(lines) + "\n"

    lines += [
        f"- runs: **{head['n_runs']}**, partitions: **{head['n_partitions']}**, "
        f"checks: **{head['n_checks']}**",
        f"- latest run: `{head['latest_run']}` committed {head['latest_at']}",
        "",
    ]

    latest = (
        m.filter(F.col("run_id") == head["latest_run"])
        .groupBy("verdict")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_violations").alias("n_violations"),
        )
        .orderBy("verdict")
        .collect()
    )
    lines.append("## Latest run")
    lines.append("")
    lines += _table(
        [r.asDict() for r in latest],
        [("verdict", "verdict"), ("n", "rows"), ("n_violations", "violations")],
    )
    lines.append("")

    sc = [r.asDict() for r in scorecard(m).orderBy(
        F.col("n_failing_now").desc(), F.col("fail_rate").desc(), "check_id"
    ).collect()]
    for r in sc:
        r["check"] = label(r["check_id"])
    lines.append("## Checks (all-time burn-down)")
    lines.append("")
    lines += _table(
        sc,
        [
            ("check", "check"),
            ("n_runs", "runs"),
            ("n_partitions", "parts"),
            ("fail_rate", "fail rate"),
            ("n_failing_now", "failing now"),
            ("max_streak", "max streak"),
            ("worst_partition", "worst partition"),
        ],
    )
    lines.append("")

    inc = [
        r.asDict()
        for r in incidents(m)
        .orderBy(F.col("n_checks_failing").desc(), "first_failed_at", "partition_key")
        .limit(top)
        .collect()
    ]
    lines.append(f"## Open incidents (top {top})")
    lines.append("")
    if not inc:
        lines.append("None — latest run is clean.")
    else:
        for r in inc:
            r["failing"] = ", ".join(label(c) for c in (r.get("failing_checks") or []))
        lines += _table(
            inc,
            [
                ("partition_key", "partition"),
                ("n_checks_failing", "checks failing"),
                ("failing", "which"),
                ("first_failed_at", "since"),
            ],
        )
    lines.append("")
    return "\n".join(lines) + "\n"
