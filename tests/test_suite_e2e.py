"""End-to-end suite tests: golden verdicts on the synthesized table,
determinism across parallelism (the two-cluster-size gate's correctness
precondition), and invariants from FIXTURES.md §6."""

from pyspark.sql import functions as F

from anomaly_detector_spark.plans.suite import default_suite, run_suite
from anomaly_detector_spark.synth import DRIFT_LANG, synth_files

N = 20000


def _verdict_map(res):
    out = {}
    for r in res.verdicts.collect():
        # map check_id back to name via suite order is fragile; key on both
        out[(r["partition_key"], r["check_id"])] = r["verdict"]
    return out


def _by_check(res, suite):
    names = {s.id: s.name for s in suite}
    m = {}
    for r in res.verdicts.collect():
        m.setdefault(names[r["check_id"]], {})[r["partition_key"]] = r["verdict"]
    return m


def test_suite_golden_verdicts(spark):
    df = synth_files(spark, N)
    suite = default_suite()
    res = run_suite(df, suite)
    by = _by_check(res, suite)
    # referential: exactly the planted unknown langs fail
    ref_fails = {k for k, v in by["referential"].items() if v == "FAIL"}
    assert ref_fails == {"", "klingon", "brainfuck"}
    # drift: exactly the shifted lang fails
    drift_fails = {k for k, v in by["drift"].items() if v == "FAIL"}
    assert drift_fails == {DRIFT_LANG}
    # uniqueness: planted dups exist somewhere; violations carry the envelope
    assert any(v == "FAIL" for v in by["uniqueness"].values())
    viol_cols = res.violations.columns
    assert viol_cols == [
        "repo", "path", "commit", "partition_key", "check_id", "observed", "expected",
    ]


def test_suite_deterministic_across_parallelism(spark):
    suite = default_suite()
    a = run_suite(synth_files(spark, N, partitions=2), suite)
    b = run_suite(synth_files(spark, N, partitions=16), suite)
    va = sorted(map(tuple, a.verdicts.select("partition_key", "check_id", "verdict").collect()))
    vb = sorted(map(tuple, b.verdicts.select("partition_key", "check_id", "verdict").collect()))
    assert va == vb
    xa = sorted(map(tuple, a.violations.collect()))
    xb = sorted(map(tuple, b.violations.collect()))
    assert xa == xb


def test_violations_reference_real_rows(spark):
    df = synth_files(spark, N)
    res = run_suite(df)
    # every violation (repo,path,commit) exists in the source
    missing = (
        res.violations.select("repo", "path", "commit")
        .distinct()
        .join(df.select("repo", "path", "commit").distinct(), ["repo", "path", "commit"], "left_anti")
    )
    assert missing.count() == 0


def test_content_projection_pruned(spark):
    """Checks that never need `content` must not read it (SURVEY §7
    hard part 5): the referential check's plan must not scan content."""
    from anomaly_detector_spark.checks.base import CheckSpec
    from anomaly_detector_spark.checks.referential import run_referential

    df = synth_files(spark, 1000)
    spec = CheckSpec("referential", run_referential, {}, "lang", 1)
    plan = spec.run(df).verdicts._jdf.queryExecution().optimizedPlan().toString()
    assert "content" not in plan


def test_suite_partitioned_by_skewed_repo(spark):
    # partition_col="repo" with the mega-repo holding ~50% of rows: the
    # suite must complete, emit a verdict row per (repo, check), and the
    # mega-repo's stats must reflect its share. Exercises the skewed
    # partition-key path end-to-end (SURVEY.md §7 hard part 1).
    df = synth_files(spark, N, skew=True)
    suite = default_suite(partition_col="repo", min_rows=10)
    res = run_suite(df, suite)
    from anomaly_detector_spark.synth import MEGA_REPO as MR

    verd = res.verdicts.select("partition_key", "check_id", "verdict").collect()
    n_repos = df.select("repo").distinct().count()
    assert len(verd) == n_repos * 4
    stats_cid = suite[0].id
    mega_stats = [
        r["metrics"]
        for r in res.verdicts.filter(
            (F.col("partition_key") == MR) & (F.col("check_id") == stats_cid)
        ).collect()
    ]
    assert len(mega_stats) == 1
    assert mega_stats[0]["n_rows"] > 0.4 * N  # the planted skew is visible
    # determinism under skew: same verdicts at different parallelism
    res2 = run_suite(synth_files(spark, N, skew=True, partitions=3), suite)
    assert sorted(map(tuple, verd)) == sorted(
        map(tuple, res2.verdicts.select("partition_key", "check_id", "verdict").collect())
    )


def test_extended_suite_runs_count_drift(spark):
    from anomaly_detector_spark.plans.suite import default_suite, extended_suite, run_suite
    from anomaly_detector_spark.sources.registry import files_view

    files = files_view(spark, "/root/testdata/sf0.001").drop("doc_id")
    ext = extended_suite()
    res = run_suite(files, suite=ext)
    per_check = res.verdicts.select("check_id").distinct().count()
    assert per_check == 5  # default 4 + count_drift
    # a different suite composition must yield a different suite_id
    from anomaly_detector_spark.plans.manifest import suite_id

    assert suite_id(ext) != suite_id(default_suite())
