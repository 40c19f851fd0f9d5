"""Row-level constraint checks (checks/rowrules.py): known-answer unit
tests, NULL semantics, thresholds, and fused==standalone equivalence."""

from pyspark.sql import functions as F

from anomaly_detector_spark.checks.base import CheckSpec, FAIL, PASS, SKIPPED
from anomaly_detector_spark.checks.rowrules import (
    fused_rule_checks,
    run_accepted_values,
    run_completeness,
    run_format,
    run_row_predicate,
)
from anomaly_detector_spark.plans.suite import constraint_suite, run_suite

FILES_COLS = "repo string, path string, commit string, lang string, content string"


def mkfiles(spark, rows):
    return spark.createDataFrame(rows, FILES_COLS)


def _base(spark):
    return mkfiles(
        spark,
        [
            ("r", "a", "00aa", "python", "hello"),
            ("r", "b", "00bb", "python", None),
            ("r", "c", "ZZZZ", "python", "world!"),
            ("r", "d", "00cc", "go", "x" * 100),
            ("r", "e", None, "cobol", "ok"),
        ],
    )


def test_format_check(spark):
    df = _base(spark)
    spec = CheckSpec("fmt", run_format, {"column": "commit", "pattern": "^[0-9a-f]{4}$"}, "lang", 1)
    res = spec.run(df)
    bad = {(r["path"], r["observed"]) for r in res.violations.collect()}
    # ZZZZ fails the pattern; NULL commit is a violation by default.
    assert bad == {("c", "commit=ZZZZ"), ("e", "commit=NULL")}
    v = {r["partition_key"]: r["verdict"] for r in res.verdicts.collect()}
    assert v == {"python": FAIL, "go": PASS, "cobol": FAIL}


def test_format_allow_null(spark):
    df = _base(spark)
    spec = CheckSpec(
        "fmt",
        run_format,
        {"column": "commit", "pattern": "^[0-9a-f]{4}$", "allow_null": True},
        "lang",
        1,
    )
    assert {r["path"] for r in spec.run(df).violations.collect()} == {"c"}


def test_accepted_values(spark):
    df = _base(spark)
    spec = CheckSpec(
        "acc", run_accepted_values, {"column": "lang", "values": ["python", "go"]}, "lang", 1
    )
    res = spec.run(df)
    assert {r["path"] for r in res.violations.collect()} == {"e"}
    v = {r["partition_key"]: r["verdict"] for r in res.verdicts.collect()}
    assert v == {"python": PASS, "go": PASS, "cobol": FAIL}
    assert res.violations.collect()[0]["expected"] == "lang in {go,python}"


def test_completeness(spark):
    df = _base(spark)
    spec = CheckSpec("cmp", run_completeness, {"column": "content"}, "lang", 1)
    res = spec.run(df)
    assert {r["path"] for r in res.violations.collect()} == {"b"}
    v = {r["partition_key"]: r["verdict"] for r in res.verdicts.collect()}
    assert v == {"python": FAIL, "go": PASS, "cobol": PASS}


def test_row_predicate_null_is_violation(spark):
    df = _base(spark)
    # NULL content -> length(content) <= 10 is NULL -> violation.
    spec = CheckSpec("sz", run_row_predicate, {"expr": "length(content) <= 10"}, "lang", 1)
    res = spec.run(df)
    assert {r["path"] for r in res.violations.collect()} == {"b", "d"}
    assert res.violations.collect()[0]["expected"] == "length(content) <= 10"


def test_max_bad_frac_threshold(spark):
    df = _base(spark)
    # python has 1 bad of 3 rows (0.33); threshold 0.5 passes, 0.2 fails.
    lax = CheckSpec(
        "cmp", run_completeness, {"column": "content", "max_bad_frac": 0.5}, "lang", 1
    )
    strict = CheckSpec(
        "cmp", run_completeness, {"column": "content", "max_bad_frac": 0.2}, "lang", 1
    )
    assert {r["partition_key"]: r["verdict"] for r in lax.run(df).verdicts.collect()}[
        "python"
    ] == PASS
    assert {r["partition_key"]: r["verdict"] for r in strict.run(df).verdicts.collect()}[
        "python"
    ] == FAIL


def test_min_rows_skip(spark):
    df = _base(spark)
    spec = CheckSpec("cmp", run_completeness, {"column": "content"}, "lang", min_rows=2)
    v = {r["partition_key"]: r["verdict"] for r in spec.run(df).verdicts.collect()}
    assert v["go"] == SKIPPED and v["cobol"] == SKIPPED and v["python"] == FAIL


def _specs(min_rows=1):
    return [
        CheckSpec("fmt", run_format, {"column": "commit", "pattern": "^[0-9a-f]{4}$"}, "lang", min_rows),
        CheckSpec("acc", run_accepted_values, {"column": "lang", "values": ["python", "go"]}, "lang", min_rows),
        CheckSpec("cmp", run_completeness, {"column": "content"}, "lang", min_rows),
        CheckSpec("sz", run_row_predicate, {"expr": "length(content) <= 10"}, "lang", min_rows),
    ]


def _canon_violations(frames):
    rows = set()
    for f in frames:
        rows |= {tuple(r) for r in f.select(
            "repo", "path", "commit", "partition_key", "check_id", "observed", "expected"
        ).collect()}
    return rows


def test_fused_equals_standalone(spark):
    df = _base(spark)
    specs = _specs()
    fused = fused_rule_checks(df, specs)
    assert set(fused) == {"fmt", "acc", "cmp", "sz"}
    viol_fused = _canon_violations([r.violations for r in fused.values()])
    viol_solo = _canon_violations([s.run(df).violations for s in specs])
    assert viol_fused == viol_solo and len(viol_fused) == 6
    for s in specs:
        vf = {(r["partition_key"], r["verdict"]) for r in fused[s.name].verdicts.collect()}
        vs = {(r["partition_key"], r["verdict"]) for r in s.run(df).verdicts.collect()}
        assert vf == vs, s.name


def test_constraint_suite_fused_path(spark):
    """run_suite(constraint_suite) carries the 5 base checks + 4 rules and
    the rule checks ride the fused grouped pass."""
    df = _base(spark)
    suite = constraint_suite("lang", min_rows=1)
    res = run_suite(df, suite=suite, fused=True)
    assert set(res.per_check) == {
        "stats", "uniqueness", "referential", "drift", "count_drift",
        "format_commit", "accepted_lang", "complete_content", "size_cap",
    }
    by_check = {
        s.id: s.name for s in suite
    }
    got = {
        (by_check[r["check_id"]], r["partition_key"]): r["verdict"]
        for r in res.verdicts.collect()
    }
    # the tiny commits fail the 40-hex format; cobol fails accepted_lang
    assert got[("format_commit", "go")] == FAIL
    assert got[("accepted_lang", "cobol")] == FAIL
    assert got[("accepted_lang", "python")] == PASS
    assert got[("complete_content", "go")] == PASS
    assert got[("size_cap", "go")] == PASS
    # unfused path agrees
    res2 = run_suite(df, suite=suite, fused=False)
    got2 = {
        (by_check[r["check_id"]], r["partition_key"]): r["verdict"]
        for r in res2.verdicts.collect()
    }
    assert got == got2
    v1 = _canon_violations([res.violations])
    v2 = _canon_violations([res2.violations])
    assert v1 == v2


def test_folded_rules_add_no_scans(spark, tmp_path):
    """Folded rules must not multiply passes over the table.

    Violations: the constraint suite's violations plan has exactly as
    many scans as the extended suite's — rule rows ride the existing
    filter scan.

    Verdicts: the suite's verdicts union takes the row-check family's
    SHARED combined frame exactly once (CheckResult.shared_verdicts), so
    the constraint suite's verdicts plan has exactly as many scans as
    the extended suite's — the rules only widen the row-check scan's
    schema. (History of this pin: per-rule verdict selects were first
    column-pruned into per-rule aggregate subtrees — one table pass per
    rule; then filtered views of one explode still re-ran the shared
    aggregate once per union branch, because Spark does not collapse
    identical aggregates across union branches via exchange reuse —
    measured 4 passes at 2M rows. The shared-frame union is the
    structural fix.)"""
    from anomaly_detector_spark.plans.suite import extended_suite, run_suite

    p = str(tmp_path / "files")
    mkfiles(
        spark, [("r", f"p{i}", f"c{i}", "python", "x" * (i + 1)) for i in range(50)]
    ).write.parquet(p)
    df = spark.read.parquet(p)

    def plan(frame):
        return frame._jdf.queryExecution().executedPlan().toString()

    def n_scans(t):
        return t.count("Scan parquet")

    base = run_suite(df, suite=extended_suite("lang", 1), fused=True)
    cons = run_suite(df, suite=constraint_suite("lang", 1), fused=True)
    assert n_scans(plan(cons.violations)) == n_scans(plan(base.violations))
    # four extra rule checks, ZERO extra scans in the verdicts plan
    assert n_scans(plan(cons.verdicts)) == n_scans(plan(base.verdicts))

    import re

    base_schemas = set(re.findall(r"ReadSchema: (\S+)", plan(base.verdicts)))
    cons_schemas = set(re.findall(r"ReadSchema: (\S+)", plan(cons.verdicts)))
    # the only plan difference the rules introduce is the rule-column-
    # widened row-check scan schema
    assert cons_schemas - base_schemas == {
        "struct<commit:string,lang:string,content:string>"
    }, (sorted(cons_schemas), sorted(base_schemas))


def test_quarantine_by_rules(spark):
    from anomaly_detector_spark.checks.rowrules import quarantine_by_rules

    df = _base(spark)
    clean, quar = quarantine_by_rules(df, _specs())
    assert {r["path"] for r in clean.collect()} == {"a"}  # only row passing all 4
    got = {r["path"]: sorted(r["failed_rules"]) for r in quar.collect()}
    assert got["b"] == ["cmp", "sz"]      # NULL content: completeness + predicate
    assert got["c"] == ["fmt"]            # bad commit format
    assert got["e"] == ["acc", "fmt"]     # NULL commit + disallowed lang
    assert got["d"] == ["sz"]             # 100 chars > 10
    # split is exhaustive and disjoint
    assert clean.count() + quar.count() == df.count()


def test_json_schema_rule(spark):
    from anomaly_detector_spark.checks.rowrules import run_json_schema

    df = spark.createDataFrame(
        [
            ("r", "a", "c", "python", '{"k": 69}'),
            ("r", "b", "c", "python", '{"k": 69'),     # malformed
            ("r", "c", "c", "python", '{"j": 1}'),     # k missing
            ("r", "d", "c", "python", '{"k": "x"}'),   # k wrong type -> corrupt
            ("r", "e", "c", "python", None),           # NULL column
            ("r", "f", "c", "python", "{}"),           # k missing
        ],
        FILES_COLS,
    )
    spec = CheckSpec(
        "js", run_json_schema,
        {"column": "content", "schema": "k long", "required": ["k"]},
        "lang", 1,
    )
    res = spec.run(df)
    assert {r["path"] for r in res.violations.collect()} == {"b", "c", "d", "e", "f"}
    assert res.violations.collect()[0]["expected"] == "content json matches (k long) required [k]"
    # without `required`, well-formed objects pass regardless of fields
    lax = CheckSpec(
        "js", run_json_schema,
        {"column": "content", "schema": "k long", "allow_null": True},
        "lang", 1,
    )
    assert {r["path"] for r in lax.run(df).violations.collect()} == {"b", "d"}
    # json rule composes with the fused group
    fused = fused_rule_checks(df, [spec] + _specs())
    assert "js" in fused
