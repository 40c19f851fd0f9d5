"""Physical-plan audit of the fused validation suite (PLANS.md source).

Materializes the fused suite's verdicts and violations on a synthetic
input, then counts plan operators in the AQE-final executed plan:
SortMergeJoin / BroadcastHashJoin / Sort / Exchange / FlatMapGroupsInPandas
occurrences and the distinct parquet ReadSchema projections. Run:

    python tools/plan_audit.py [rows]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def audit(plan: str) -> dict:
    """Count physical operators in FORMATTED explain output: one
    '(id) OpName' line per distinct node, reused exchanges appear as
    ReusedExchange — so counts reflect the actual executed DAG, not the
    tree-string's repeated subtree prints."""
    ops = re.findall(r"^\(\d+\) ([A-Za-z]+)", plan, flags=re.M)
    counts: dict[str, int] = {}
    for o in ops:
        counts[o] = counts.get(o, 0) + 1
    interesting = {
        k: v
        for k, v in sorted(counts.items())
        if any(
            t in k
            for t in (
                "Join", "Sort", "Exchange", "Pandas", "Window", "Aggregate", "Scan",
            )
        )
    }
    interesting["ReadSchema"] = sorted(set(re.findall(r"ReadSchema: (struct<[^>]*>)", plan)))
    return interesting


def audit_queries(names: list[str]) -> int:
    """Audit arbitrary __spark_entry__.queries() entries by name at
    sf0.01: `python tools/plan_audit.py docs_corpus_pipeline ...`.
    Counts come from the AQE-final plan after one materialization."""
    import __spark_entry__ as e
    from anomaly_detector_spark.session import get_spark

    spark = get_spark(app_name="plan_audit", cores=8)
    qs = e.queries()
    for name in names:
        df = qs[name](spark, "/root/testdata/sf0.01")
        df.count()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        print(f"== {name} ==")
        for k, v in audit(plan).items():
            if k == "ReadSchema":
                for s in v:
                    print(f"  scan {s}")
            else:
                print(f"  {k}: {v}")
    return 0


def main() -> int:
    if len(sys.argv) > 1 and not sys.argv[1].isdigit():
        return audit_queries(sys.argv[1:])
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    from anomaly_detector_spark.plans.suite import run_suite
    from anomaly_detector_spark.session import get_spark
    from anomaly_detector_spark.synth import synth_files

    spark = get_spark(app_name="plan_audit", cores=8)
    path = f"/tmp/plan_audit_{rows}"
    if not os.path.isdir(path):
        synth_files(spark, rows, seed=42).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)

    res = run_suite(df, cache=False)
    res.verdicts.count()
    vplan = res.verdicts._sc._jvm.PythonSQLUtils.explainString(
        res.verdicts._jdf.queryExecution(), "formatted"
    )
    res.violations.count()
    wplan = res.violations._sc._jvm.PythonSQLUtils.explainString(
        res.violations._jdf.queryExecution(), "formatted"
    )
    res.unpersist()

    for name, plan in (("verdicts", vplan), ("violations", wplan)):
        print(f"== {name} ==")
        for k, v in audit(plan).items():
            if k == "ReadSchema":
                for s in v:
                    print(f"  scan {s}")
            else:
                print(f"  {k}: {v}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
