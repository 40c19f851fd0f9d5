"""Manifest commit + resume protocol tests (SURVEY.md §2.10 T5/T7).

Pins: (1) fresh run commits one row per (partition, check); (2) rerun is
a no-op (idempotency); (3) new partitions resume incrementally and the
combined manifest equals a fresh full run's verdicts; (4) a suite config
change invalidates the checkpoint (content-addressed suite_id).
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from anomaly_detector_spark.plans.manifest import (
    read_manifest,
    run_with_manifest,
    suite_id,
)
from anomaly_detector_spark.plans.suite import default_suite
from anomaly_detector_spark.sources.registry import files_view

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def manifest_dir(tmp_path):
    d = str(tmp_path / "manifest")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_fresh_run_commits_all_partitions(spark, manifest_dir):
    files = files_view(spark, SF).drop("doc_id")
    run = run_with_manifest(files, manifest_dir)
    assert run.result is not None
    n_langs = files.select("lang").distinct().count()
    m = read_manifest(spark, manifest_dir)
    assert m.count() == n_langs * 4  # 4 checks per partition
    assert m.filter(F.col("status") != "committed").count() == 0
    assert m.filter(F.col("n_rows") <= 0).count() == 0


def test_rerun_is_noop(spark, manifest_dir):
    files = files_view(spark, SF).drop("doc_id")
    first = run_with_manifest(files, manifest_dir)
    assert first.pending_partitions > 0
    before = read_manifest(spark, manifest_dir).count()
    second = run_with_manifest(files, manifest_dir)
    assert second.pending_partitions == 0 and second.result is None
    assert read_manifest(spark, manifest_dir).count() == before


def test_incremental_resume_matches_fresh_run(spark, manifest_dir):
    files = files_view(spark, SF).drop("doc_id")
    langs = sorted(r[0] for r in files.select("lang").distinct().collect())
    subset = files.filter(F.col("lang").isin(langs[:2]))

    run_with_manifest(subset, manifest_dir)
    resumed = run_with_manifest(files, manifest_dir)
    # only the remaining partitions were recomputed
    assert resumed.pending_partitions == len(langs) - 2

    combined = read_manifest(spark, manifest_dir).select(
        "partition_key", "check_id", "verdict"
    )
    fresh_run = run_with_manifest(files, manifest_dir + "_fresh")
    fresh = read_manifest(spark, manifest_dir + "_fresh").select(
        "partition_key", "check_id", "verdict"
    )
    assert sorted(map(tuple, combined.collect())) == sorted(map(tuple, fresh.collect()))
    shutil.rmtree(manifest_dir + "_fresh", ignore_errors=True)


def test_suite_change_invalidates_checkpoint(spark, manifest_dir):
    files = files_view(spark, SF).drop("doc_id")
    run_with_manifest(files, manifest_dir)
    changed = default_suite(min_rows=99)  # different config → different check ids
    assert suite_id(changed) != suite_id(default_suite())
    rerun = run_with_manifest(files, manifest_dir, suite=changed)
    assert rerun.pending_partitions > 0  # old checkpoint does not satisfy new suite


def test_frozen_drift_baseline_detects_new_drifted_partition(spark, manifest_dir):
    # T2/T3: run 1 freezes the pooled baseline (normal langs). Run 2 brings
    # a NEW partition with shifted lengths: against the FROZEN baseline it
    # must FAIL drift; without freezing, a lone pending partition
    # self-baselines (pooled = itself) and would PASS.
    from anomaly_detector_spark.synth import DRIFT_LANG, synth_files

    df = synth_files(spark, 30000)
    normal = df.filter(F.col("lang") != DRIFT_LANG)
    shifted = df.filter(F.col("lang") == DRIFT_LANG)

    r1 = run_with_manifest(normal, manifest_dir, freeze_drift_baseline=True)
    assert r1.result is not None

    r2 = run_with_manifest(df, manifest_dir, freeze_drift_baseline=True)
    assert r2.pending_partitions == 1  # only the drifted lang is new
    drift_cid = [s.id for s in default_suite() if s.name == "drift"][0]
    verdict = (
        read_manifest(spark, manifest_dir)
        .filter((F.col("partition_key") == DRIFT_LANG) & (F.col("check_id") == drift_cid))
        .select("verdict")
        .collect()
    )
    assert [r["verdict"] for r in verdict] == ["FAIL"]

    # control: WITHOUT freezing, the lone pending partition self-baselines → PASS
    ctrl_dir = manifest_dir + "_ctrl"
    run_with_manifest(normal, ctrl_dir)
    run_with_manifest(df, ctrl_dir)
    ctrl = (
        read_manifest(spark, ctrl_dir)
        .filter((F.col("partition_key") == DRIFT_LANG) & (F.col("check_id") == drift_cid))
        .select("verdict")
        .collect()
    )
    assert [r["verdict"] for r in ctrl] == ["PASS"]
    shutil.rmtree(ctrl_dir, ignore_errors=True)


def test_null_partition_resume_is_idempotent(spark, manifest_dir):
    # a NULL partition key must commit once and be pruned on rerun —
    # the resume anti-join is null-safe (plans/manifest.py pending_input)
    files = files_view(spark, SF).drop("doc_id").withColumn(
        "lang", F.when(F.col("lang") == "en", F.lit(None)).otherwise(F.col("lang"))
    )
    r1 = run_with_manifest(files, manifest_dir)
    assert r1.result is not None
    n1 = read_manifest(spark, manifest_dir).count()
    assert (
        read_manifest(spark, manifest_dir).filter(F.col("partition_key").isNull()).count() > 0
    )
    r2 = run_with_manifest(files, manifest_dir)
    assert r2.result is None and r2.pending_partitions == 0  # full no-op
    assert read_manifest(spark, manifest_dir).count() == n1  # no duplicate rows


def test_violations_sink_written_before_commit(spark, manifest_dir, tmp_path):
    # run_with_manifest writes the sink itself (pre-commit ordering) and
    # the sink rows carry partition_key from the envelope
    files = files_view(spark, SF).drop("doc_id")
    sink = str(tmp_path / "viol")
    run = run_with_manifest(files, manifest_dir, violations_sink=sink)
    viol = spark.read.parquet(sink)
    assert "partition_key" in viol.columns
    # sink counts agree with the manifest's per-check accounting
    m = read_manifest(spark, manifest_dir).filter(F.col("run_id") == run.run_id)
    per_check_manifest = {
        (r["partition_key"], r["check_id"]): r["n_violations"]
        for r in m.collect()
        if r["n_violations"] > 0
    }
    per_check_sink = {
        (r["partition_key"], r["check_id"]): r["n"]
        for r in viol.groupBy("partition_key", "check_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_check_sink == per_check_manifest


def test_incremental_sketches_union_to_global_distinct(spark, manifest_dir, tmp_path):
    # two incremental runs each write their pending partitions' HLL
    # sketches; the union estimate over the sketch table equals a
    # fresh full-scan sketch estimate — distinct counts stay queryable
    # across resumes without rescanning committed history
    from anomaly_detector_spark.checks.stats import hll_sketches, hll_union_estimate
    from anomaly_detector_spark.plans.manifest import global_distinct

    files = files_view(spark, SF).drop("doc_id")
    langs = sorted(r[0] for r in files.select("lang").distinct().collect())
    first, rest = files.filter(F.col("lang").isin(langs[:2])), files.filter(
        ~F.col("lang").isin(langs[:2])
    )
    sk_dir = str(tmp_path / "sketches")
    run_with_manifest(first, manifest_dir, sketches_dir=sk_dir)
    run_with_manifest(files, manifest_dir, sketches_dir=sk_dir)  # resumes: only `rest` pending
    est = global_distinct(spark, sk_dir).collect()[0]
    full = hll_union_estimate(hll_sketches(files, "lang", "content")).collect()[0]
    # merge order can shift the estimate slightly (sparse->dense sketch
    # promotion happens at different points) — assert both paths agree
    # within HLL error, and against the exact distinct count
    exact = files.select("content").distinct().count()
    assert abs(est["distinct_estimate"] - full["distinct_estimate"]) / exact < 0.05
    assert abs(est["distinct_estimate"] - exact) / exact < 0.05
    assert est["n_rows"] == files.count()


def test_sketch_retry_does_not_overcount_rows(spark, manifest_dir, tmp_path):
    # Sketch rows are at-least-once (written BEFORE the manifest commit):
    # simulate a crash between sketch append and manifest append by
    # re-appending one run's sketch rows under a fresh run_id.
    # global_distinct must dedupe per (suite_id, partition_key) so n_rows
    # is not double-counted and the estimate is unchanged.
    from anomaly_detector_spark.plans.manifest import global_distinct

    files = files_view(spark, SF).drop("doc_id")
    sk_dir = str(tmp_path / "sketches")
    run_with_manifest(files, manifest_dir, sketches_dir=sk_dir)
    before = global_distinct(spark, sk_dir).collect()[0]

    dup = spark.read.parquet(sk_dir).withColumn("run_id", F.lit("retry_run"))
    dup.write.mode("append").parquet(sk_dir)

    after = global_distinct(spark, sk_dir).collect()[0]
    assert after["n_rows"] == before["n_rows"] == files.count()
    assert after["distinct_estimate"] == before["distinct_estimate"]


def test_incremental_quantile_sketches(spark, manifest_dir, tmp_path):
    # the quantile twin of the HLL sketch test: two incremental runs each
    # write their pending partitions' t-digest rows; global_quantiles over
    # the sketch table tracks the exact full-scan percentiles without
    # rescanning committed history, and a duplicate (retry) append does
    # not shift the estimate (at-least-once dedupe)
    from anomaly_detector_spark.plans.manifest import global_quantiles

    files = files_view(spark, SF).drop("doc_id")
    langs = sorted(r[0] for r in files.select("lang").distinct().collect())
    first = files.filter(F.col("lang").isin(langs[:2]))
    q_dir = str(tmp_path / "qsketches")
    run_with_manifest(first, manifest_dir, quantile_sketches_dir=q_dir)
    run_with_manifest(files, manifest_dir, quantile_sketches_dir=q_dir)
    est = global_quantiles(spark, q_dir, qs=[0.5, 0.99]).collect()[0]
    exact = files.selectExpr(
        "percentile(length(content), 0.5) AS p50",
        "percentile(length(content), 0.99) AS p99",
    ).collect()[0]
    assert est["n_rows"] == files.filter(F.col("content").isNotNull()).count()
    assert abs(est["q_0_5"] - exact["p50"]) / max(exact["p50"], 1) < 0.05
    assert abs(est["q_0_99"] - exact["p99"]) / max(exact["p99"], 1) < 0.05

    # simulated crash-retry: re-append one run's rows under a new run_id
    dup = spark.read.parquet(q_dir).withColumn("run_id", F.lit("retry_run"))
    dup.write.mode("append").parquet(q_dir)
    again = global_quantiles(spark, q_dir, qs=[0.5, 0.99]).collect()[0]
    assert again["n_rows"] == est["n_rows"]


def test_violations_sink_sampling_bounds_sink_keeps_exact_counts(
    spark, manifest_dir, tmp_path
):
    # max_violations_per_check bounds the SINK per (partition, check)
    # while the manifest's n_violations stays exact; sampling is
    # deterministic in row identity (rerun -> identical surviving rows)
    from anomaly_detector_spark.synth import synth_files

    files = synth_files(spark, 20000, seed=5)
    cap = 25
    sink = str(tmp_path / "viol")
    run = run_with_manifest(
        files, manifest_dir, violations_sink=sink, max_violations_per_check=cap
    )
    viol = spark.read.parquet(sink)
    sink_counts = {
        (r["partition_key"], r["check_id"]): r["n"]
        for r in viol.groupBy("partition_key", "check_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    m = read_manifest(spark, manifest_dir).filter(F.col("run_id") == run.run_id)
    exact = {
        (r["partition_key"], r["check_id"]): r["n_violations"]
        for r in m.collect()
        if r["n_violations"] > 0
    }
    # synth plants enough dups/unknown langs that at least one group
    # exceeds the cap — the test is vacuous otherwise
    assert any(n > cap for n in exact.values())
    for key, n_exact in exact.items():
        n_sink = sink_counts.get(key, 0)
        if n_exact <= cap:
            assert n_sink == n_exact, key  # small groups kept exactly
        else:
            assert 0 < n_sink < n_exact, key
            assert n_sink <= 4 * cap, key  # binomial around cap, not unbounded
    # every sampled group's rows are a subset of the uncapped run's rows
    full_sink = str(tmp_path / "viol_full")
    run_with_manifest(
        files, str(tmp_path / "m2"), violations_sink=full_sink
    )
    full = spark.read.parquet(full_sink)
    joined = viol.drop("run_id").exceptAll(full.drop("run_id"))
    assert joined.count() == 0
    # determinism: re-running the capped sink yields the same row set
    sink2 = str(tmp_path / "viol2")
    run_with_manifest(
        files, str(tmp_path / "m3"), violations_sink=sink2,
        max_violations_per_check=cap,
    )
    viol2 = spark.read.parquet(sink2)
    assert viol.drop("run_id").exceptAll(viol2.drop("run_id")).count() == 0
    assert viol2.drop("run_id").exceptAll(viol.drop("run_id")).count() == 0


def test_manifest_sink_reconcile_audit(spark, manifest_dir, tmp_path):
    """Dogfooding the reconciliation check: the manifest's exact
    n_violations accounting vs the violations sink's row counts — the
    engine audits its own lineage. A corrupted sink (lost evidence rows)
    FAILs exactly the check_id it corrupted."""
    from anomaly_detector_spark.checks.base import CheckSpec
    from anomaly_detector_spark.checks.reconcile import run_reconcile

    files = files_view(spark, SF).drop("doc_id")
    sink = str(tmp_path / "viol")
    run_with_manifest(files, manifest_dir, violations_sink=sink)
    man = read_manifest(spark, manifest_dir).filter(F.col("n_violations") > 0)
    viol = spark.read.parquet(sink)
    spec = CheckSpec(
        "sink_audit",
        run_reconcile,
        {"other_df": viol, "measure": "n_violations", "agg": "sum", "other_agg": "count"},
        "check_id",
    )
    v = {r["partition_key"]: r["verdict"] for r in run_reconcile(man, spec).verdicts.collect()}
    assert v and all(verdict == "PASS" for verdict in v.values())

    # corrupt ONE check's evidence: drop that check's rows from one partition
    victim = viol.select("check_id", "partition_key").first()
    corrupted = viol.filter(
        ~((F.col("check_id") == victim["check_id"])
          & (F.col("partition_key") == victim["partition_key"]))
    )
    spec2 = CheckSpec(
        "sink_audit",
        run_reconcile,
        {"other_df": corrupted, "measure": "n_violations", "agg": "sum", "other_agg": "count"},
        "check_id",
    )
    v2 = {r["partition_key"]: r["verdict"] for r in run_reconcile(man, spec2).verdicts.collect()}
    assert v2[victim["check_id"]] == "FAIL"
    assert all(verdict == "PASS" for cid, verdict in v2.items() if cid != victim["check_id"])


def test_incremental_topk_sketches_global_heavy_hitters(spark, manifest_dir, tmp_path):
    """Third sketch-family member: two incremental runs write truncated
    top-k content counts; global_topk merges them (partitions as merge
    units) into all-time heavy hitters with sound bounds — est <= exact
    count <= upper for every reported item, top item exact."""
    from anomaly_detector_spark.plans.manifest import global_topk

    files = files_view(spark, SF).drop("doc_id")
    langs = sorted(r[0] for r in files.select("lang").distinct().collect())
    first = files.filter(F.col("lang").isin(langs[:2]))
    tk_dir = str(tmp_path / "topk")
    run_with_manifest(first, manifest_dir, topk_sketches_dir=tk_dir)
    run_with_manifest(files, manifest_dir, topk_sketches_dir=tk_dir)  # only rest pending
    got = global_topk(spark, tk_dir, k=5).collect()
    assert [r["rank"] for r in got] == [1, 2, 3, 4, 5]
    exact = {
        r["content"]: r["n"]
        for r in files.groupBy("content").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in got:
        true = exact[r["item"]]
        assert r["est"] <= true <= r["upper"], (r["item"], r["est"], true, r["upper"])
    # the global top item is the exact most frequent content
    top_true = max(exact.values())
    assert exact[got[0]["item"]] == top_true

    # at-least-once retry: re-appending one run's rows under a fresh
    # run_id must not inflate estimates (dedupe by suite_id/partition)
    dup = spark.read.parquet(tk_dir).withColumn("run_id", F.lit("zzz_retry"))
    dup.write.mode("append").parquet(tk_dir)
    again = global_topk(spark, tk_dir, k=5).collect()
    assert [(r["item"], r["est"], r["upper"]) for r in again] == [
        (r["item"], r["est"], r["upper"]) for r in got
    ]


def test_revalidation_plan_failed_and_stale(spark, manifest_dir):
    """The operational loop-closer: the manifest tells the next cycle
    which partitions to re-run — FAIL verdicts in a partition's latest
    run, and commits older than the staleness budget (deterministic
    explicit `now`)."""
    import datetime as dt

    from anomaly_detector_spark.plans.manifest import revalidation_plan

    files = files_view(spark, SF).drop("doc_id")
    run_with_manifest(files, manifest_dir)
    man = read_manifest(spark, manifest_dir)
    plan = revalidation_plan(man)
    failed = {r["partition_key"] for r in plan.filter("reason = 'failed'").collect()}
    expected = {
        r["partition_key"] for r in man.filter(F.col("verdict") == "FAIL").collect()
    }
    assert failed == expected and expected  # planted violations do FAIL

    # nothing is stale against a generous budget anchored at commit time
    latest = man.agg(F.max("committed_at")).collect()[0][0]
    fresh = revalidation_plan(man, max_age_hours=1.0, now=latest)
    assert fresh.filter("reason = 'stale'").count() == 0
    # everything is stale against a tiny budget from the future
    future = latest + dt.timedelta(hours=3)
    stale = revalidation_plan(man, max_age_hours=1.0, now=future)
    n_parts = man.select("partition_key").distinct().count()
    assert stale.filter("reason = 'stale'").count() == n_parts


def test_result_frames_survive_the_commit_on_a_second_run(spark, manifest_dir):
    """Regression: the final manifest append invalidates the manifest
    path's cached file listing, so a lazily-evaluated done-set would see
    the run's OWN commits on any post-commit action and recompute the
    result frames to empty. The done-set is frozen at run start; a
    second run (different suite_id, same manifest) must keep non-empty
    verdicts after run_with_manifest returns."""
    from anomaly_detector_spark.plans.suite import extended_suite

    files = files_view(spark, SF).drop("doc_id")
    run_with_manifest(files, manifest_dir, suite=default_suite(), run_id="r1")
    run2 = run_with_manifest(
        files, manifest_dir, suite=extended_suite(), run_id="r2",
        collect_verdict_counts=True,
    )
    assert run2.pending_partitions > 0
    assert run2.verdict_counts and sum(run2.verdict_counts.values()) > 0
    # post-return consumption of the result frames is also safe
    assert run2.result.verdicts.count() == sum(run2.verdict_counts.values())


def test_rolling_baseline_catches_wholesale_shift(spark, manifest_dir, tmp_path):
    """Self-baselining is structurally blind to every partition drifting
    together; the rolling-history baseline (hist_dir + rolling_baseline_k)
    with the absolute gate catches it. Also pins: first run self-baselines
    (empty store), retry-appended histogram rows don't change the baseline."""
    from anomaly_detector_spark.checks.base import CheckSpec
    from anomaly_detector_spark.checks.drift import run_drift
    from anomaly_detector_spark.plans.manifest import rolling_baseline
    from anomaly_detector_spark.plans.suite import run_suite

    def mk(shift):
        return spark.range(900).select(
            F.element_at(
                F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("lang"),
            F.expr(f"repeat('x', 100 + CAST(id % 200 AS INT) + {shift})").alias("content"),
        )

    def mk_suite():
        return [CheckSpec("drift", run_drift, {"column": "content", "gate_mode": "absolute"},
                          "lang", 25)]

    hd = str(tmp_path / "hists")
    counts = []
    for rid in ("h1", "h2"):
        r = run_with_manifest(
            mk(0), manifest_dir, suite=mk_suite(), run_id=rid, hist_dir=hd,
            rolling_baseline_k=2, revalidate=True, collect_verdict_counts=True,
        )
        counts.append(r.verdict_counts)
    # unshifted history: PASS everywhere (run 1 self-baselines off the
    # empty store; run 2 baselines against run 1 — same distribution)
    assert counts == [{"PASS": 3}, {"PASS": 3}]

    sid = suite_id(mk_suite())
    base = rolling_baseline(spark, hd, sid, 2)
    assert base is not None and base.count() > 0
    # the streaming bridge form matches the frame bit for bit
    from anomaly_detector_spark.plans.manifest import rolling_baseline_dict

    d = rolling_baseline_dict(spark, hd, sid, 2)
    assert d == {int(r["bucket"]): float(r["base_n"]) for r in base.collect()}

    # retry: re-append h2's rows; (run_id, bucket) dedupe keeps the baseline
    run_with_manifest(mk(0), manifest_dir, suite=mk_suite(), run_id="h2",
                      hist_dir=hd, rolling_baseline_k=2, revalidate=True)
    base2 = rolling_baseline(spark, hd, sid, 2)
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, base2.collect()))

    # wholesale +400 shift: every partition moves together
    shifted = mk(400)
    self_res = run_suite(shifted, mk_suite())  # no baseline -> self-pooled
    self_counts = {r["verdict"]: r["n"] for r in
                   self_res.verdicts.groupBy("verdict").agg(F.count("*").alias("n")).collect()}
    assert self_counts == {"PASS": 3}  # blind, as designed
    self_res.unpersist()
    r3 = run_with_manifest(
        shifted, manifest_dir, suite=mk_suite(), run_id="h3", hist_dir=hd,
        rolling_baseline_k=2, revalidate=True, collect_verdict_counts=True,
    )
    assert r3.verdict_counts == {"FAIL": 3}

    # mutually-exclusive lifecycles are rejected
    with pytest.raises(ValueError, match="mutually"):
        run_with_manifest(mk(0), manifest_dir, suite=mk_suite(), run_id="x",
                          hist_dir=hd, rolling_baseline_k=2, freeze_drift_baseline=True)


def test_per_partition_rolling_baseline_swap(spark, manifest_dir, tmp_path):
    """baseline_scope='partition': each partition drifts against ITS OWN
    history. Heterogeneous partitions (en short, de long) pass against
    their per-partition history; when en silently takes de's length
    distribution, en FAILs while de (unchanged) PASSes — a swap a pooled
    mixture baseline cannot localize."""
    from anomaly_detector_spark.checks.base import CheckSpec
    from anomaly_detector_spark.checks.drift import run_drift

    def mk(swap_en):
        en_len = "400 + CAST(id % 60 AS INT)" if swap_en else "100 + CAST(id % 60 AS INT)"
        return spark.range(600).select(
            F.when(F.col("id") % 2 == 0, F.lit("en")).otherwise(F.lit("de")).alias("lang"),
            F.expr(
                f"CASE WHEN id % 2 = 0 THEN repeat('x', {en_len}) "
                f"ELSE repeat('x', 400 + CAST(id % 60 AS INT)) END"
            ).alias("content"),
        )

    def mk_suite():
        return [CheckSpec(
            "drift", run_drift,
            {"column": "content", "gate_mode": "absolute", "baseline_scope": "partition"},
            "lang", 25,
        )]

    hd = str(tmp_path / "hists")
    run_with_manifest(mk(False), manifest_dir, suite=mk_suite(), run_id="p1",
                      hist_dir=hd, rolling_baseline_k=3, revalidate=True)
    r2 = run_with_manifest(mk(False), manifest_dir, suite=mk_suite(), run_id="p2",
                           hist_dir=hd, rolling_baseline_k=3, revalidate=True,
                           collect_verdict_counts=True)
    # same distributions as their own history: clean
    assert r2.verdict_counts == {"PASS": 2}
    r3 = run_with_manifest(mk(True), manifest_dir, suite=mk_suite(), run_id="p3",
                           hist_dir=hd, rolling_baseline_k=3, revalidate=True)
    verd = {r["partition_key"]: r["verdict"] for r in r3.result.verdicts.collect()}
    assert verd == {"en": "FAIL", "de": "PASS"}


def test_require_baseline_skips_first_run_but_seeds_store(spark, manifest_dir, tmp_path):
    """require_baseline: with no history, drift emits SKIPPED (T1 warm-up)
    instead of self-baselining — which under the absolute gate would flag
    every heterogeneous partition on day one — while STILL seeding the
    histogram store so run 2 has a real baseline."""
    from anomaly_detector_spark.checks.base import CheckSpec
    from anomaly_detector_spark.checks.drift import run_drift

    df = spark.range(600).select(
        F.when(F.col("id") % 2 == 0, F.lit("en")).otherwise(F.lit("de")).alias("lang"),
        F.expr(
            "CASE WHEN id % 2 = 0 THEN repeat('x', 100 + CAST(id % 60 AS INT)) "
            "ELSE repeat('x', 400 + CAST(id % 60 AS INT)) END"
        ).alias("content"),
    )

    def mk_suite(require):
        cfg = {"column": "content", "gate_mode": "absolute",
               "baseline_scope": "partition"}
        if require:
            cfg["require_baseline"] = True
        return [CheckSpec("drift", run_drift, cfg, "lang", 25)]

    hd = str(tmp_path / "hists")
    # control: WITHOUT the guard, day one self-pools a mixture and the
    # absolute gate flags both heterogeneous partitions — false positives
    ctl = run_with_manifest(df, str(tmp_path / "m0"), suite=mk_suite(False),
                            run_id="c1", collect_verdict_counts=True)
    assert ctl.verdict_counts == {"FAIL": 2}
    # with the guard: day one SKIPPED, day two PASS off the seeded store
    r1 = run_with_manifest(df, manifest_dir, suite=mk_suite(True), run_id="w1",
                           hist_dir=hd, rolling_baseline_k=3, revalidate=True,
                           collect_verdict_counts=True)
    assert r1.verdict_counts == {"SKIPPED": 2}
    r2 = run_with_manifest(df, manifest_dir, suite=mk_suite(True), run_id="w2",
                           hist_dir=hd, rolling_baseline_k=3, revalidate=True,
                           collect_verdict_counts=True)
    assert r2.verdict_counts == {"PASS": 2}


def test_membership_store_probes_across_runs(spark, manifest_dir, tmp_path):
    # two incremental runs append bloom word rows for their pending
    # partitions; seen_before answers membership across both WITHOUT
    # rescanning history: every committed key probes maybe_seen=True
    # (no false negatives), fresh keys (new commit ids) probe ~False,
    # and a replayed append (crash retry) changes nothing (bit_or is
    # idempotent — no dedupe-on-read needed, unlike the other sketches).
    from anomaly_detector_spark.plans.manifest import seen_before

    files = files_view(spark, SF).drop("doc_id")
    langs = sorted(r[0] for r in files.select("lang").distinct().collect())
    first = files.filter(F.col("lang").isin(langs[:2]))
    mb_dir = str(tmp_path / "membership")
    run_with_manifest(first, manifest_dir, membership_dir=mb_dir)
    run_with_manifest(files, manifest_dir, membership_dir=mb_dir)

    committed = seen_before(spark, mb_dir, files)
    assert committed.filter(~F.col("maybe_seen")).count() == 0

    fresh = files.withColumn("commit", F.concat(F.lit("never-"), F.col("commit")))
    probed = seen_before(spark, mb_dir, fresh)
    n = probed.count()
    fp = probed.filter(F.col("maybe_seen")).count()
    assert fp / n < 0.01  # 2^22 bits per partition vs a few hundred keys

    replay = spark.read.parquet(mb_dir).withColumn("run_id", F.lit("retry_run"))
    replay.write.mode("append").parquet(mb_dir)
    again = seen_before(spark, mb_dir, fresh)
    assert again.filter(F.col("maybe_seen")).count() == fp

    # a store mixing build parameters is rejected, not probed wrong
    import pytest as _pytest

    # store health: fill/fpp per partition from the persisted rows
    from anomaly_detector_spark.plans.manifest import membership_stats

    stats = {r["partition_key"]: r for r in membership_stats(spark, mb_dir).collect()}
    assert stats and all(0 < r["fill_ratio"] < 0.01 for r in stats.values())

    bad = spark.read.parquet(mb_dir).withColumn("n_bits", F.lit(1 << 10))
    bad.write.mode("append").parquet(mb_dir)
    with _pytest.raises(ValueError, match="parameter"):
        seen_before(spark, mb_dir, fresh).count()
    with _pytest.raises(ValueError, match="parameter"):
        membership_stats(spark, mb_dir).count()


def test_scorecard_over_real_history(spark, manifest_dir):
    # three revalidation runs of the real suite over the same input:
    # the planted defects FAIL identically every run, so each failing
    # (check, partition) carries a CURRENT streak of 3 and every clean
    # one a streak of 0; fail_rate is fails / (fails + passes).
    from anomaly_detector_spark.plans.manifest import scorecard

    files = files_view(spark, SF).drop("doc_id")
    for i, rid in enumerate(["r1", "r2", "r3"]):
        run_with_manifest(
            files, manifest_dir, run_id=rid, revalidate=i > 0
        )
    from anomaly_detector_spark.plans.manifest import incidents

    m = read_manifest(spark, manifest_dir)
    sc = {r["check_id"]: r for r in scorecard(m).collect()}
    assert len(sc) == 4  # the default suite's four checks
    # incident view: every FAILing partition groups its checks; the
    # defects persist since run r1, so first_failed_at is r1's commit
    inc = {r["partition_key"]: r for r in incidents(m).collect()}
    r1_fails = {}
    for row in m.filter((F.col("run_id") == "r1") & (F.col("verdict") == "FAIL")).collect():
        r1_fails.setdefault(row["partition_key"], set()).add(row["check_id"])
    assert set(inc) == set(r1_fails)
    r1_ts = m.filter(F.col("run_id") == "r1").agg(F.min("committed_at")).first()[0]
    for pk, checks in r1_fails.items():
        assert inc[pk]["n_checks_failing"] == len(checks)
        assert inc[pk]["failing_checks"] == ",".join(sorted(checks))
        assert inc[pk]["first_failed_at"] >= r1_ts
    per_run_verdicts = {
        (r["check_id"], r["partition_key"]): r["verdict"]
        for r in m.filter(F.col("run_id") == "r1").collect()
    }
    for cid, row in sc.items():
        fails_r1 = sum(
            1 for (c, _), v in per_run_verdicts.items() if c == cid and v == "FAIL"
        )
        assert row["n_runs"] == 3
        assert row["n_fail"] == 3 * fails_r1  # identical verdicts per run
        assert row["n_failing_now"] == fails_r1
        assert row["max_streak"] == (3 if fails_r1 else 0)
        if fails_r1:
            assert per_run_verdicts[(cid, row["worst_partition"])] == "FAIL"


def test_resume_scales_to_1e5_committed_partitions(spark, manifest_dir):
    # r3 verdict guardrail: the done-set snapshot must not transit driver
    # memory (it's an eager localCheckpoint now) and the resume anti-join
    # must prune 10^5 committed partitions without a forced broadcast
    # collapse. Synthesize a committed manifest for 100k partitions, then
    # run an input holding those plus 2 genuinely-new partitions: only
    # the new ones validate and commit.
    suite = default_suite(partition_col="lang")
    sid = suite_id(suite)
    checks = [F.lit(s.id) for s in suite]
    committed = (
        spark.range(100_000)
        .select(
            F.lit("seed").alias("run_id"),
            F.lit(sid).alias("suite_id"),
            F.concat(F.lit("pk"), F.col("id").cast("string")).alias("partition_key"),
            F.explode(F.array(*checks)).alias("check_id"),
            F.lit("PASS").alias("verdict"),
            F.create_map().cast("map<string,double>").alias("metrics"),
            F.lit(50).cast("long").alias("n_rows"),
            F.lit(0).cast("long").alias("n_violations"),
            F.lit("committed").alias("status"),
            F.current_timestamp().alias("committed_at"),
        )
    )
    committed.write.parquet(manifest_dir)

    # input: 40 rows in each of 3 committed partitions + 2 new partitions
    def part(lang, lo):
        return spark.range(lo, lo + 40).select(
            F.lit(lang).alias("lang"),
            F.concat(F.lit("r"), (F.col("id") % 5).cast("string")).alias("repo"),
            F.concat(F.lit("p"), F.col("id").cast("string")).alias("path"),
            F.concat(F.lit("c"), F.col("id").cast("string")).alias("commit"),
            F.concat(F.lit("x"), F.col("id").cast("string")).alias("content"),
            F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"),
        )

    df = part("pk0", 0)
    for lang, lo in [("pk1", 100), ("pk99999", 200), ("new_a", 300), ("new_b", 400)]:
        df = df.unionByName(part(lang, lo))

    run = run_with_manifest(df, manifest_dir, suite=suite)
    assert run.pending_partitions == 2  # only new_a / new_b were pending
    m = read_manifest(spark, manifest_dir)
    fresh = m.filter(F.col("run_id") == run.run_id)
    assert set(r["partition_key"] for r in fresh.select("partition_key").distinct().collect()) == {
        "new_a",
        "new_b",
    }
    assert m.count() == 100_000 * 4 + 2 * 4


def test_warm_start_partition_budget_cap(spark, tmp_path):
    # the three history_* loaders hold driver-resident dicts; at 1e5
    # store partitions the load works, and an explicit max_partitions
    # under the store's cardinality refuses instead of collecting.
    from anomaly_detector_spark.streaming.topk import history_hitters

    store = str(tmp_path / "topk_1e5")
    (
        spark.range(100_000)
        .select(
            F.lit("s1").alias("suite_id"),
            F.concat(F.lit("pk"), F.col("id").cast("string")).alias("partition_key"),
            F.lit("r1").alias("run_id"),
            F.lit("item0").alias("item"),
            F.lit(7).cast("long").alias("n"),
            F.lit(2).cast("long").alias("bound"),
        )
        .write.parquet(store)
    )
    history = history_hitters(spark, store)
    assert len(history) == 100_000
    assert history["pk42"] == (["item0"], [7], [0], 2)
    with pytest.raises(ValueError, match="driver-memory budget"):
        history_hitters(spark, store, max_partitions=50_000)
