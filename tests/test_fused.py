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


def test_fused_pathological_hot_key(spark):
    # SURVEY §7 hard part 1, worst case: ONE (repo, path, commit) key
    # holding ~30% of all rows (a mega-repo where every row collapses to
    # one file shape). The fused path must complete and agree across all
    # three join/agg strategies: default (broadcast dup side), the
    # {"broadcast_dup": False} shuffle-join escape hatch, and the salted
    # pre-aggregation ({"salt_buckets": 16}). Violation multisets are
    # compared without check_id (config changes the content-addressed id
    # by design, P4).
    from anomaly_detector_spark.checks.base import CheckSpec
    from anomaly_detector_spark.checks.uniqueness import run_uniqueness
    from anomaly_detector_spark.plans.fused import fused_uniqueness

    n = 60000
    base = synth_files(spark, n, skew=False)
    hot = (F.col("_rid") % 10 < 3)  # deterministic 30% slice
    df = (
        base.withColumn("_rid", F.monotonically_increasing_id())
        .withColumn("repo", F.when(hot, F.lit("org0/megarepo")).otherwise(F.col("repo")))
        .withColumn("path", F.when(hot, F.lit("src/hot.py")).otherwise(F.col("path")))
        .withColumn("commit", F.when(hot, F.lit("deadbeef")).otherwise(F.col("commit")))
        .drop("_rid")
    )

    def run(config):
        spec = CheckSpec("uniqueness", run_uniqueness, config, "lang", 25)
        return fused_uniqueness(df, spec)

    results = {
        name: run(cfg)
        for name, cfg in {
            "default": {},
            "no_broadcast": {"broadcast_dup": False},
            "salted": {"salt_buckets": 16},
        }.items()
    }
    verd = {
        name: sorted(
            (r["partition_key"], r["verdict"], r["metrics"]) for r in cr.verdicts.collect()
        )
        for name, cr in results.items()
    }
    viol = {
        name: Counter(
            (r["repo"], r["path"], r["commit"], r["partition_key"], r["observed"])
            for r in cr.violations.collect()
        )
        for name, cr in results.items()
    }
    assert verd["default"] == verd["no_broadcast"] == verd["salted"]
    assert viol["default"] == viol["no_broadcast"] == viol["salted"]
    # the hot key emits exactly (n_hot - 1) violation envelopes
    n_hot = df.filter(F.col("path") == "src/hot.py").count()
    hot_viol = sum(
        c for (repo, path, _c, _pk, _o), c in viol["default"].items() if path == "src/hot.py"
    )
    assert n_hot > 0.25 * n and hot_viol == n_hot - 1
