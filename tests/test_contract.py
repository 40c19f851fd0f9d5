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
