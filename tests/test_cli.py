"""CLI entry-point tests: run, resume no-op, violations sink."""

from __future__ import annotations

import json
import shutil

import pytest

from anomaly_detector_spark.cli import main
from anomaly_detector_spark.sources.registry import files_view

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def dirs(tmp_path, spark):
    files = files_view(spark, SF).drop("doc_id")
    inp = str(tmp_path / "input")
    files.write.parquet(inp)
    d = {"input": inp, "manifest": str(tmp_path / "m"), "viol": str(tmp_path / "v")}
    yield d
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def test_cli_run_and_resume(spark, dirs, capsys):
    rc = main([
        "--input", dirs["input"], "--manifest", dirs["manifest"],
        "--violations", dirs["viol"], "--run-id", "t1",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["run_id"] == "t1" and out["pending_partitions"] > 0
    assert out["verdicts"].get("PASS", 0) > 0
    assert spark.read.parquet(dirs["viol"]).count() > 0

    rc = main(["--input", dirs["input"], "--manifest", dirs["manifest"], "--run-id", "t2"])
    assert rc == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["noop_resume"] is True and out2["pending_partitions"] == 0


def test_cli_quantile_sketches(spark, dirs, tmp_path, capsys):
    qdir = str(tmp_path / "q")
    rc = main([
        "--input", dirs["input"], "--manifest", dirs["manifest"],
        "--quantile-sketches", qdir, "--run-id", "tq",
    ])
    assert rc == 0
    capsys.readouterr()
    from anomaly_detector_spark.plans.manifest import global_quantiles

    row = global_quantiles(spark, qdir).collect()[0]
    assert row["n_rows"] > 0 and row["q_0_5"] > 0 and row["q_0_99"] >= row["q_0_5"]


def test_cli_topk_sketches(spark, dirs, tmp_path, capsys):
    tdir = str(tmp_path / "tk")
    rc = main([
        "--input", dirs["input"], "--manifest", dirs["manifest"],
        "--topk-sketches", tdir, "--run-id", "tt",
    ])
    assert rc == 0
    capsys.readouterr()
    from anomaly_detector_spark.plans.manifest import global_topk

    rows = global_topk(spark, tdir, k=3).collect()
    assert [r["rank"] for r in rows] == [1, 2, 3]
    assert all(r["est"] <= r["upper"] for r in rows)


def test_cli_membership_store(spark, dirs, tmp_path, capsys):
    mdir = str(tmp_path / "mb")
    rc = main([
        "--input", dirs["input"], "--manifest", dirs["manifest"],
        "--membership", mdir, "--run-id", "tm",
    ])
    assert rc == 0
    capsys.readouterr()
    from pyspark.sql import functions as F

    from anomaly_detector_spark.plans.manifest import seen_before

    committed = spark.read.parquet(dirs["input"])
    probed = seen_before(spark, mdir, committed)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_cli_constraint_revalidate_history(spark, dirs, capsys):
    # three revalidated runs under the constraint suite build metric
    # history; --history-flags reports the newest run's anomalies (none
    # here — the input is identical across runs)
    for rid in ("h1", "h2", "h3", "h4"):
        rc = main([
            "--input", dirs["input"], "--manifest", dirs["manifest"],
            "--suite", "constraint", "--revalidate", "--run-id", rid,
            "--history-flags",
        ])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["pending_partitions"] > 0, "revalidate must re-run partitions"
    assert out["history_anomalies"] == []  # identical input -> no flags

    from anomaly_detector_spark.plans.manifest import read_manifest

    m = read_manifest(spark, dirs["manifest"])
    assert m.select("run_id").distinct().count() == 4
    # the constraint suite's rule checks committed verdicts too
    assert m.select("check_id").distinct().count() >= 9


def test_cli_quarantine_out_routes_rule_failures(spark, dirs, tmp_path, capsys):
    qdir = str(tmp_path / "quar")
    rc = main([
        "--input", dirs["input"], "--manifest", dirs["manifest"],
        "--suite", "hygiene", "--quarantine-out", qdir, "--run-id", "q1",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["quarantine_out"] == qdir
    assert out["n_quarantined_rows"] > 0  # synth plants rule violations
    q = spark.read.parquet(qdir)
    assert "failed_rules" in q.columns
    # every quarantined row names at least one failing rule; the sink is
    # the enforcement copy — the manifest still accounted the full input
    assert q.filter("size(failed_rules) = 0").count() == 0
    from anomaly_detector_spark.plans.manifest import read_manifest

    m = read_manifest(spark, dirs["manifest"]).filter("run_id = 'q1'")
    assert m.count() > 0


def test_cli_hygiene_suite_commits_hygiene_checks(spark, dirs, capsys):
    rc = main([
        "--input", dirs["input"], "--manifest", dirs["manifest"],
        "--suite", "hygiene", "--run-id", "hy1",
    ])
    assert rc == 0
    capsys.readouterr()
    from anomaly_detector_spark.checks.codehygiene import code_hygiene_rules
    from anomaly_detector_spark.plans.manifest import read_manifest

    m = read_manifest(spark, dirs["manifest"]).filter("run_id = 'hy1'")
    committed = {r["check_id"] for r in m.select("check_id").distinct().collect()}
    for spec in code_hygiene_rules():
        assert spec.id in committed, spec.name


def test_cli_sampled_tier_separate_manifest_stream(spark, dirs, capsys):
    # full run commits the full-suite stream
    rc = main(["--input", dirs["input"], "--manifest", dirs["manifest"], "--run-id", "full1"])
    assert rc == 0
    full = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    # sampled run: distinct suite_id -> its partitions are NOT pruned by
    # the full run's commits, and vice versa
    rc = main([
        "--input", dirs["input"], "--manifest", dirs["manifest"],
        "--run-id", "samp1", "--sample-frac", "0.5",
    ])
    assert rc == 0
    samp = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert samp["sample_frac"] == 0.5
    assert samp["suite_id"] != full["suite_id"]
    assert samp["pending_partitions"] > 0 and samp["noop_resume"] is False
    assert sum(samp["verdicts"].values()) > 0

    # sampled resume is a no-op on ITS stream only
    rc = main([
        "--input", dirs["input"], "--manifest", dirs["manifest"],
        "--run-id", "samp2", "--sample-frac", "0.5",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["noop_resume"] is True


def test_cli_rolling_baseline_store(spark, dirs, tmp_path, capsys):
    hd = str(tmp_path / "hists")
    for rid in ("b1", "b2"):
        rc = main([
            "--input", dirs["input"], "--manifest", dirs["manifest"],
            "--run-id", rid, "--revalidate",
            "--hist-store", hd, "--rolling-baseline-k", "2",
        ])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert sum(out["verdicts"].values()) > 0
    # the store accumulated one pooled histogram per run
    hist = spark.read.parquet(hd)
    assert hist.select("run_id").distinct().count() == 2


def test_cli_watch_json_drop_dir(spark, tmp_path, capsys):
    # --watch: continuous validate-on-landing from the CLI — landed jsonl
    # files are streamed, corrupt lines quarantined per micro-batch, clean
    # rows committed; a second invocation with the SAME checkpoint resumes
    # past already-processed files and validates only the new arrival.
    from pyspark.sql import functions as F

    ind = tmp_path / "drop"
    ind.mkdir()

    def land(lang, n, bad=False):
        lines = [
            json.dumps(
                {"repo": f"{lang}/r", "path": f"f{j}.x", "commit": f"c{j}",
                 "lang": lang, "content": f"body {j} {lang}"}
            )
            for j in range(n)
        ]
        if bad:
            lines.append("%% not json %%")
        (ind / f"{lang}.jsonl").write_text("\n".join(lines) + "\n")

    land("python", 30, bad=True)
    land("go", 30)
    common = [
        "--input", str(ind), "--format", "json", "--watch",
        "--manifest", str(tmp_path / "m"),
        "--checkpoint", str(tmp_path / "ckpt"),
        "--corrupt-out", str(tmp_path / "corrupt"),
        "--min-rows", "1",
    ]
    rc = main(common + ["--compact-stores"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["watch"] is True and out["n_batches"] >= 1
    assert out["partitions_committed"] == 2
    assert out["n_corrupt_rows"] == 1
    # the quarantine sink was compacted in the same invocation
    assert out["compacted_stores"]["quarantine"] == 1

    m = spark.read.parquet(str(tmp_path / "m"))
    assert {r["partition_key"] for r in m.select("partition_key").collect()} == {
        "python", "go",
    }
    bad = spark.read.parquet(str(tmp_path / "corrupt")).collect()
    assert len(bad) == 1 and bad[0]["_corrupt_record"] == "%% not json %%"
    assert bad[0]["run_id"].startswith("stream-")
    assert bad[0]["source_file"].endswith("python.jsonl")

    # land a THIRD partition; the resumed watch validates only it
    land("rust", 30)
    rc = main(common + ["--coverage-audit"])
    assert rc == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["partitions_committed"] == 1
    assert out2["n_corrupt_rows"] == 0
    # coverage audit works on the streaming frame (schema-only)
    assert "uncovered_columns" in out2
    assert "_corrupt_record" in out2["uncovered_columns"]
    m = spark.read.parquet(str(tmp_path / "m"))
    assert m.filter(F.col("partition_key") == "rust").count() > 0


def test_cli_markdown_report(spark, dirs, tmp_path, capsys):
    rep = str(tmp_path / "report.md")
    for rid in ("rep1", "rep2"):
        rc = main([
            "--input", dirs["input"], "--manifest", dirs["manifest"],
            "--run-id", rid, "--revalidate", "--report", rep,
        ])
        assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["report"] == rep
    md = open(rep, encoding="utf-8").read()
    assert "# Validation report" in md
    assert "## Latest run" in md and "## Checks (all-time burn-down)" in md
    assert "latest run: `rep2`" in md
    # check NAMES are rendered next to truncated ids
    assert "uniqueness (" in md and "referential (" in md
    # the planted defects make incidents non-empty with a FAIL verdict row
    assert "## Open incidents" in md and "| FAIL |" in md


def test_cli_paths_suite(spark, dirs, capsys):
    rc = main([
        "--input", dirs["input"], "--manifest", dirs["manifest"],
        "--suite", "paths", "--run-id", "p1", "--min-rows", "1",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["pending_partitions"] > 0
    # the derived files table has clean paths and matching extensions:
    # the three path checks all PASS, so total verdicts grew but FAILs
    # come only from the planted base-suite defects
    assert out["verdicts"].get("PASS", 0) > 0


def test_cli_full_suite(spark, dirs, capsys):
    # full = constraint + hygiene + paths in one pass; its suite_id is
    # distinct, so everything revalidates under run-id f1
    rc = main([
        "--input", dirs["input"], "--manifest", dirs["manifest"],
        "--suite", "full", "--run-id", "f1", "--min-rows", "1",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["pending_partitions"] > 0
    # 9 constraint + 6 hygiene + 4 paths checks emit per-partition
    # verdicts; with every family present the total verdict count beats
    # the paths run's (13 checks) on the same input
    assert sum(out["verdicts"].values()) > 0
    assert out["verdicts"].get("PASS", 0) > 0


def test_cli_fork_audit(spark, dirs, tmp_path, capsys):
    audit = str(tmp_path / "audit")
    rc = main([
        "--input", dirs["input"], "--manifest", str(tmp_path / "m2"),
        "--run-id", "fa1", "--fork-audit", audit,
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["fork_audit"] == audit
    # the derived table has no mirrored repos or copied subtrees
    assert out["n_fork_pairs"] == 0 and out["n_vendored_dirs"] == 0
    assert spark.read.parquet(audit + "/fork_pairs").columns == [
        "repo_a", "repo_b", "shared_dirs", "n_dirs_a", "n_dirs_b", "jaccard"
    ]


def test_cli_monitor_mode_accumulates_across_invocations(spark, tmp_path, capsys):
    # --monitor-out: no suite, no manifest — per-trigger p50/p99 and
    # heavy-hitter rows land under the sink; a second invocation sharing
    # the checkpoint drains ONLY the newly landed file and its emission
    # continues from the persisted state (cumulative n_rows grows).
    from pyspark.sql import functions as F

    files = files_view(spark, SF).drop("doc_id")
    inp = str(tmp_path / "drop")
    files.filter(F.col("lang") == "en").write.mode("append").parquet(inp)

    mon, ckpt = str(tmp_path / "mon"), str(tmp_path / "ckpt")
    argv = ["--input", inp, "--monitor-out", mon, "--checkpoint", ckpt]
    assert main(argv) == 0
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["monitor"] is True and out1["quantile_rows"] > 0 and out1["topk_rows"] > 0

    q1 = spark.read.parquet(f"{mon}/quantiles")
    n1 = q1.agg({"n_rows": "max"}).collect()[0][0]
    assert {r["q"] for r in q1.collect()} == {0.5, 0.99}

    # land more rows (a second lang), re-invoke with the same checkpoint
    files.filter(F.col("lang") == "de").write.mode("append").parquet(inp)
    assert main(argv) == 0
    json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    q2 = spark.read.parquet(f"{mon}/quantiles")
    langs = {r["partition_key"] for r in q2.collect()}
    assert "en" in langs and "de" in langs
    # en's state did NOT reprocess trigger-1 rows: its cumulative
    # count is unchanged (only de was in the new file)
    py_max = max(r["n_rows"] for r in q2.collect() if r["partition_key"] == "en")
    assert py_max == n1
    tk = spark.read.parquet(f"{mon}/topk")
    assert tk.filter(F.col("est") > F.col("upper")).count() == 0


def test_cli_manifest_required_outside_monitor(spark, dirs):
    with pytest.raises(SystemExit):
        main(["--input", dirs["input"], "--run-id", "x"])


def test_cli_monitor_mode_zero_row_drain_reports_zero(spark, tmp_path, capsys):
    # A first scheduled run whose streams drain ZERO rows (all monitored
    # values NULL -> both kernels emit nothing) never creates the
    # parquet sink paths; the summary must report 0/0, not stack-trace
    # on the missing path (ADVICE r3).
    from pyspark.sql import functions as F

    inp = str(tmp_path / "drop")
    files_view(spark, SF).drop("doc_id").limit(50).withColumn(
        "content", F.lit(None).cast("string")
    ).withColumn("repo", F.lit(None).cast("string")).write.parquet(inp)

    argv = [
        "--input", inp,
        "--monitor-out", str(tmp_path / "mon"),
        "--checkpoint", str(tmp_path / "ckpt"),
    ]
    assert main(argv) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"monitor": True, "quantile_rows": 0, "topk_rows": 0}


def test_cli_robust_suite_runs_end_to_end(spark, dirs, tmp_path, capsys):
    # --suite robust: extended + MAD outliers + Benford(content length)
    # through the full manifest path
    rc = main([
        "--input", dirs["input"], "--manifest", str(tmp_path / "mrobust"),
        "--run-id", "rb1", "--suite", "robust",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    m = spark.read.parquet(str(tmp_path / "mrobust"))
    checks = {r["check_id"] for r in m.select("check_id").distinct().collect()}
    assert len(checks) == 7  # 5 extended + mad + benford
    assert out["run_id"] == "rb1"
