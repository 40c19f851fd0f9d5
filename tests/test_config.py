"""Declarative suite config (plans/config.py): round-trip identity + CLI."""

from __future__ import annotations

import json

import pytest

from anomaly_detector_spark.plans.config import suite_from_config, suite_to_config
from anomaly_detector_spark.plans.manifest import suite_id
from anomaly_detector_spark.plans.suite import (
    constraint_suite,
    default_suite,
    extended_suite,
    run_suite,
)


def _hygiene_suite(**kw):
    from anomaly_detector_spark.checks.codehygiene import code_hygiene_rules

    return constraint_suite(**kw) + code_hygiene_rules(**kw)


@pytest.mark.parametrize(
    "factory", [default_suite, extended_suite, constraint_suite, _hygiene_suite]
)
def test_config_round_trip_preserves_ids(factory):
    # content-addressed ids: a config-loaded suite is manifest-identical
    # to the code-built one (same check ids, same suite_id)
    suite = factory()
    doc = suite_to_config(suite)
    rebuilt = suite_from_config(json.dumps(doc))  # through a JSON string
    assert [s.name for s in rebuilt] == [s.name for s in suite]
    assert [s.id for s in rebuilt] == [s.id for s in suite]
    assert suite_id(rebuilt) == suite_id(suite)


def test_config_file_runs_identical_verdicts(spark, tmp_path):
    from anomaly_detector_spark.synth import synth_files

    df = synth_files(spark, 4000, seed=11)
    doc = suite_to_config(constraint_suite())
    path = tmp_path / "suite.json"
    path.write_text(json.dumps(doc, indent=2))

    def rows(suite):
        res = run_suite(df, suite=suite, cache=False)
        out = sorted(
            (r["partition_key"], r["check_id"], r["verdict"])
            for r in res.verdicts.collect()
        )
        res.unpersist()
        return out

    assert rows(suite_from_config(path)) == rows(constraint_suite())


def test_config_defaults_and_overrides():
    doc = {
        "partition_col": "repo",
        "min_rows": 7,
        "checks": [
            {"check": "uniqueness"},
            {"check": "completeness", "name": "c2", "column": "path",
             "partition_col": "lang", "min_rows": 3},
        ],
    }
    specs = suite_from_config(doc)
    assert (specs[0].partition_col, specs[0].min_rows) == ("repo", 7)
    assert (specs[1].partition_col, specs[1].min_rows) == ("lang", 3)
    assert specs[1].name == "c2" and specs[1].config == {"column": "path"}


def test_config_errors():
    with pytest.raises(ValueError, match="unknown check type"):
        suite_from_config({"checks": [{"check": "nope"}]})
    with pytest.raises(ValueError, match="duplicate check name"):
        suite_from_config({"checks": [{"check": "uniqueness"}, {"check": "uniqueness"}]})
    with pytest.raises(ValueError, match="non-empty 'checks'"):
        suite_from_config({"checks": []})
    with pytest.raises(ValueError, match="unknown suite-config keys"):
        suite_from_config({"cheks": [], "checks": [{"check": "uniqueness"}]})
    with pytest.raises(ValueError, match="'check' key"):
        suite_from_config({"checks": ["uniqueness"]})


def test_to_config_rejects_runtime_state(spark):
    from anomaly_detector_spark.checks.base import CheckSpec
    from anomaly_detector_spark.checks.referential import run_referential

    dim = spark.createDataFrame([("python",)], "lang string")
    spec = CheckSpec("referential", run_referential, {"dim_df": dim})
    with pytest.raises(TypeError):
        suite_to_config([spec])

    def custom_fn(df, spec):  # not in the registry
        raise AssertionError

    with pytest.raises(ValueError, match="not in the config registry"):
        suite_to_config([CheckSpec("x", custom_fn, {})])


def test_cli_suite_config(spark, tmp_path, capsys):
    from anomaly_detector_spark.cli import main
    from anomaly_detector_spark.synth import synth_files

    inp = tmp_path / "files"
    synth_files(spark, 3000, seed=3).write.parquet(str(inp))
    cfg = tmp_path / "suite.json"
    cfg.write_text(json.dumps({
        "min_rows": 10,
        "checks": [
            {"check": "uniqueness"},
            {"check": "format", "name": "format_commit",
             "column": "commit", "pattern": "^[0-9a-f]{40}$"},
        ],
    }))
    assert main([
        "--input", str(inp), "--manifest", str(tmp_path / "m"),
        "--suite-config", str(cfg), "--run-id", "cfg-1",
    ]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["run_id"] == "cfg-1"
    assert summary["verdicts"].get("PASS", 0) > 0
    # same config -> same suite_id -> resume is a no-op
    assert main([
        "--input", str(inp), "--manifest", str(tmp_path / "m"),
        "--suite-config", str(cfg), "--run-id", "cfg-2",
    ]) == 0
    summary2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary2["noop_resume"]


def test_config_declares_fd_check(spark):
    from pyspark.sql import functions as F  # noqa: F401
    from anomaly_detector_spark.synth import synth_files

    doc = {
        "checks": [
            {"check": "fd", "name": "fd_repo_lang",
             "lhs": ["repo"], "rhs": "lang", "partition_col": "lang"},
        ]
    }
    suite = suite_from_config(doc)
    assert [s.name for s in suite] == ["fd_repo_lang"]
    df = synth_files(spark, 3000, seed=5)
    res = run_suite(df, suite=suite, cache=False)
    rows = res.verdicts.collect()
    res.unpersist()
    # synth repos span langs -> the dependency is violated somewhere,
    # and every partition gets exactly one verdict row
    assert len(rows) == len({r["partition_key"] for r in rows})
    assert "FAIL" in {r["verdict"] for r in rows}


def test_suite_column_coverage_audit(spark):
    from anomaly_detector_spark.plans.config import (
        suite_column_coverage,
        suite_from_config,
    )

    df = spark.createDataFrame(
        [], "repo string, path string, commit string, lang string, "
        "content string, stars int",
    )
    suite = suite_from_config(
        {
            "partition_col": "lang",
            "min_rows": 1,
            "checks": [
                {"check": "stats", "column": "content"},
                {"check": "uniqueness", "key": ["repo", "path", "commit"]},
                {"check": "format", "name": "fmt", "column": "commit", "pattern": "^c"},
            ],
        }
    )
    cov = {r["column"]: r for r in suite_column_coverage(suite, df)}
    assert cov["stars"]["covered"] is False and cov["stars"]["checks"] == []
    assert cov["content"]["checks"] == ["stats"]
    assert set(cov["commit"]["checks"]) == {"uniqueness", "fmt"}
    assert cov["lang"]["covered"] is True  # partition_col counts
    assert sorted(cov) == ["commit", "content", "lang", "path", "repo", "stars"]


def test_small_files_declarable_from_config(spark, tmp_path):
    # the compaction gate declares like any other check: a JSON document
    # names the directory and gates, and the loaded spec FAILs the
    # fragmented layout (round-trips through suite_to_config too)
    spark.range(0, 2000).repartition(40).write.parquet(str(tmp_path / "t" / "frag"))
    doc = {
        "checks": [
            {
                "check": "small_files",
                "partition_col": "dir",
                "min_rows": 2,
                "path": str(tmp_path / "t"),
                "glob": "*.parquet",
                "tiny_bytes": 2048,
                "max_tiny_share": 0.5,
            }
        ]
    }
    specs = suite_from_config(json.dumps(doc))
    assert suite_from_config(json.dumps(suite_to_config(specs)))[0].id == specs[0].id
    res = specs[0].run(spark.range(1))
    v = res.verdicts.collect()
    assert len(v) == 1 and v[0]["verdict"] == "FAIL"


def test_round4_robust_checks_declarable_from_config(spark):
    # mad_outliers + benford ride the JSON suite document path like every
    # other family: build -> serialize -> rebuild -> run
    doc = {
        "partition_col": "lang",
        "min_rows": 25,
        "checks": [
            {"check": "mad_outliers", "max_outlier_rate": 0.5},
            {"check": "benford", "name": "benford_len", "column": "size", "max_chi2": 1e9},
        ],
    }
    specs = suite_from_config(doc)
    rebuilt = suite_from_config(suite_to_config(specs))
    assert [s.id for s in rebuilt] == [s.id for s in specs]
    from pyspark.sql import functions as F

    from anomaly_detector_spark.sources.registry import files_view

    files = files_view(spark, "/root/testdata/sf0.001").drop("doc_id").withColumn(
        "size", F.length("content").cast("double")
    )
    for spec in rebuilt:
        res = spec.run(files)
        verdicts = {r["verdict"] for r in res.verdicts.collect()}
        assert verdicts <= {"PASS", "FAIL", "SKIPPED"} and verdicts
