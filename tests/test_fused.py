"""Equivalence of the scan-fused suite plan with the per-check plan.

The fused plan (plans/fused.py) must be observationally identical to the
naive composition: same verdict rows, same violation-row multiset, same
check ids — on both the synthetic table (planted violations of every
kind, incl. the skewed mega-repo) and the derived files view.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from anomaly_detector_spark.plans.suite import run_suite
from anomaly_detector_spark.sources.registry import files_view
from anomaly_detector_spark.synth import synth_files

SF = "/root/testdata/sf0.001"


def _verdict_set(res):
    return sorted(
        (r["partition_key"], r["check_id"], r["verdict"]) for r in res.verdicts.collect()
    )


def _violation_multiset(res):
    return Counter(tuple(r) for r in res.violations.collect())


@pytest.mark.parametrize("source", ["synth", "files"])
def test_fused_equals_naive(spark, source):
    if source == "synth":
        df = synth_files(spark, 30000)
    else:
        df = files_view(spark, SF).drop("doc_id")
    fused = run_suite(df, fused=True)
    naive = run_suite(df, fused=False)
    assert _verdict_set(fused) == _verdict_set(naive)
    assert _violation_multiset(fused) == _violation_multiset(naive)


def test_fused_metrics_match(spark):
    df = synth_files(spark, 30000)
    fused = run_suite(df, fused=True)
    naive = run_suite(df, fused=False)
    for name in ("stats", "referential", "uniqueness"):
        fm = {r["partition_key"]: r["metrics"] for r in
              fused.verdicts.filter(F.col("check_id") == fused.per_check[name].verdicts.select("check_id").first()[0]).collect()}
        nm = {r["partition_key"]: r["metrics"] for r in
              naive.verdicts.filter(F.col("check_id") == naive.per_check[name].verdicts.select("check_id").first()[0]).collect()}
        assert fm == nm, name


def test_fused_cross_partition_duplicate_keys(spark):
    # A (repo, path, commit) key duplicated across DIFFERENT langs is still
    # a duplicate (caught at 16M: bad langs share the .txt extension, so
    # klingon/brainfuck rows can collide on the full key).
    rows = [
        ("r1", "a.txt", "c1", "klingon", "xx"),
        ("r1", "a.txt", "c1", "brainfuck", "yy"),
        ("r1", "b.py", "c1", "python", "zz"),
    ]
    df = spark.createDataFrame(rows, "repo string, path string, commit string, lang string, content string")
    fused = run_suite(df, fused=True)
    naive = run_suite(df, fused=False)
    assert _violation_multiset(fused) == _violation_multiset(naive)
    uniq_viol = [
        r for r in fused.violations.collect() if r["expected"].startswith("unique")
    ]
    assert len(uniq_viol) == 1 and uniq_viol[0]["path"] == "a.txt"


def test_fused_empty_input(spark):
    df = synth_files(spark, 1000).filter("1=0")
    res = run_suite(df, fused=True)
    assert res.verdicts.count() == 0
    assert res.violations.count() == 0
