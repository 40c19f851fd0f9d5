"""Schema-contract check (checks/contract.py)."""

from pyspark.sql import functions as F

from anomaly_detector_spark.checks.base import CheckSpec, FAIL, PASS
from anomaly_detector_spark.checks.contract import (
    run_schema_contract,
    schema_contract,
    schema_contract_df,
)
from anomaly_detector_spark.plans.suite import default_suite, run_suite

FILES_COLS = "repo string, path string, commit string, lang string, content string"


def mkfiles(spark, rows):
    return spark.createDataFrame(rows, FILES_COLS)


def test_conforming_schema(spark):
    df = mkfiles(spark, [("r", "a", "c", "python", "x")])
    rows = schema_contract(df)
    assert [s for _, s, _, _ in rows] == ["ok"] * 5


def test_drifted_schema(spark):
    df = (
        mkfiles(spark, [("r", "a", "c", "python", "x")])
        .drop("content")
        .withColumnRenamed("lang", "language")
        .withColumn("commit", F.lit(1).cast("long"))
    )
    by_col = {c: (s, o, e) for c, s, o, e in schema_contract(df)}
    assert by_col["repo"][0] == "ok"
    assert by_col["commit"] == ("type_mismatch", "bigint", "string")
    assert by_col["lang"][0] == "missing"
    assert by_col["content"][0] == "missing"
    assert by_col["language"][0] == "unexpected"


def test_strict_nullability(spark):
    df = mkfiles(spark, [("r", "a", "c", "python", "x")])  # all nullable
    lax = {c: s for c, s, _, _ in schema_contract(df, strict_nullability=False)}
    strict = {c: s for c, s, _, _ in schema_contract(df, strict_nullability=True)}
    assert lax["repo"] == "ok"
    # FILES_SCHEMA declares repo/path/commit non-null; a created frame is nullable
    assert strict["repo"] == "nullability_mismatch"
    assert strict["lang"] == "ok"  # contract says nullable


def test_contract_rides_the_suite(spark):
    df = mkfiles(spark, [("r", f"p{i}", f"c{i}", "python", "x") for i in range(30)])
    suite = default_suite("lang", min_rows=1) + [
        CheckSpec("schema", run_schema_contract, {}, "lang", 1)
    ]
    res = run_suite(df, suite=suite, fused=True)
    sid = suite[-1].id
    got = {
        r["partition_key"]: r["verdict"]
        for r in res.verdicts.where(F.col("check_id") == sid).collect()
    }
    assert got == {c: PASS for c in ["repo", "path", "commit", "lang", "content"]}
    # a drifted-in extra column FAILs the contract, other checks unaffected
    bad = run_suite(df.withColumn("extra", F.lit(1)), suite=suite, fused=True)
    got2 = {
        r["partition_key"]: r["verdict"]
        for r in bad.verdicts.where(F.col("check_id") == sid).collect()
    }
    assert got2["extra"] == FAIL and got2["repo"] == PASS


def test_contract_df_schema(spark):
    df = mkfiles(spark, [("r", "a", "c", "python", "x")])
    out = schema_contract_df(df)
    assert out.columns == ["column", "status", "observed", "expected"]
    assert out.count() == 5


def test_schema_changes_run_over_run(spark, tmp_path):
    from anomaly_detector_spark.checks.contract import (
        append_schema_snapshot,
        schema_changes,
    )

    sd = str(tmp_path / "schemas")
    base = mkfiles(spark, [("r", "a", "c", "python", "x")])
    append_schema_snapshot(base, sd, "r1")
    # r2: adds a column
    append_schema_snapshot(base.withColumn("stars", F.lit(3)), sd, "r2")
    # r3: type change on stars, content removed
    append_schema_snapshot(
        base.withColumn("stars", F.lit("many")).drop("content"), sd, "r3"
    )
    got = {
        (r["run_id"], r["column"]): (r["status"], r["observed"], r["expected"])
        for r in schema_changes(spark, sd).collect()
    }
    assert got == {
        ("r2", "stars"): ("added", "int", "absent"),
        ("r3", "stars"): ("type_changed", "string", "int"),
        ("r3", "content"): ("removed", "absent", "string"),
    }
    # include_unchanged surfaces the stable columns too, no extra diffs
    allrows = schema_changes(spark, sd, include_unchanged=True)
    assert allrows.count() == 6 + 6  # r2: 5 unchanged + 1 added; r3: 5 + 1... recount below
    # r2 vs r1: 5 unchanged + stars added = 6; r3 vs r2: 4 unchanged
    # (repo path commit lang) + stars type_changed + content removed = 6


def test_run_schema_evolution_gate(spark, tmp_path):
    from anomaly_detector_spark.checks.contract import run_schema_evolution
    from anomaly_detector_spark.plans.config import suite_from_config
    from anomaly_detector_spark.plans.manifest import run_with_manifest

    sd = str(tmp_path / "schemas")
    base = mkfiles(
        spark, [("r", f"p{i}", "c", "python", "x" * 30) for i in range(30)]
    ).withColumn("ts", F.to_timestamp(F.lit("2026-01-01 00:00:00")))

    spec = CheckSpec("evo", run_schema_evolution, {"store": sd}, "lang", 1)
    # warm-up: empty store -> every column SKIPPED
    warm = spec.run(base)
    assert {r["verdict"] for r in warm.verdicts.collect()} == {"SKIPPED"}

    # the snapshot store rides the manifest path (zero-scan append)
    run_with_manifest(base, str(tmp_path / "m"), schemas_dir=sd, run_id="r1")

    evolved = base.withColumn("stars", F.lit(3)).drop("ts")
    res = spec.run(evolved)
    v = {r["partition_key"]: r["verdict"] for r in res.verdicts.collect()}
    assert v["stars"] == FAIL and v["ts"] == FAIL  # added + removed
    assert v["repo"] == PASS and v["content"] == PASS

    # append-only evolution tolerated via allow; ids differ per config
    lax = suite_from_config(
        {
            "partition_col": "lang",
            "min_rows": 1,
            "checks": [{"check": "schema_evolution", "store": sd, "allow": ["added"]}],
        }
    )[0]
    v2 = {r["partition_key"]: r["verdict"] for r in lax.run(evolved).verdicts.collect()}
    assert v2["stars"] == PASS and v2["ts"] == FAIL
    assert lax.id != spec.id
