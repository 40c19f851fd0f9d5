"""Path-integrity family: structural path rules, case collisions,
lang-vs-extension agreement (checks/paths.py)."""

import pytest
from pyspark.sql import functions as F

from anomaly_detector_spark.checks.base import CheckSpec
from anomaly_detector_spark.checks.paths import (
    case_collision_rows,
    expected_lang_expr,
    path_integrity_rules,
    path_rule_kinds,
    run_case_collisions,
    run_lang_ext,
    run_path_format,
    run_sensitive_path,
)

FILES_COLS = "repo string, path string, commit string, lang string, content string"


def mkfiles(spark, rows):
    return spark.createDataFrame(rows, FILES_COLS)


def test_path_rule_kinds_classification(spark):
    cases = [
        ("src/ok/file.py", ""),
        ("../etc/passwd", "traversal"),
        ("src/../up.py", "traversal"),
        ("src/..dots/x.py", ""),  # `..` prefix inside a segment is legal
        ("/rooted/file.py", "absolute"),
        ("src\\win\\file.py", "backslash"),
        ("src//empty.py", "double_slash"),
        ("src/tab\there.py", "control"),
        ("src/ lead.py", "edge_space"),
        ("src/trail .py", ""),  # interior space before the dot is legal
        ("src/seg /x.py", "edge_space"),
        ("x" * 2000, "too_long,long_segment"),
        (None, "null_path"),
    ]
    df = spark.createDataFrame(
        [(i, p) for i, (p, _) in enumerate(cases)], "i long, path string"
    )
    got = {
        r["i"]: r["k"]
        for r in df.select("i", path_rule_kinds("path").alias("k")).collect()
    }
    for i, (p, want) in enumerate(cases):
        assert got[i] == want, (p, got[i], want)


def test_sensitive_path_kinds_classification(spark):
    from anomaly_detector_spark.checks.paths import sensitive_path_kinds

    cases = [
        ("src/ok/file.py", ""),
        (".env", "dotenv"),
        ("deploy/.env.production", "dotenv"),
        ("src/environment.py", ""),            # substring never fires
        (".ssh/id_rsa", "ssh_key"),
        ("keys/id_ed25519", "ssh_key"),
        ("certs/server.PEM", "key_material"),  # (?i) extension
        ("app/keystore.jks", "key_material"),
        ("conf/credentials.json", "cred_store"),
        ("gcp/service_account.json", "cred_store"),
        ("conf/secrets.yaml", "cred_store"),
        ("home/.netrc", "auth_rc"),
        (".npmrc", "auth_rc"),
        ("backup/.bash_history", "shell_history"),
        (".aws/credentials", "cred_store,cloud_config"),  # kinds co-fire
        (".kube/config", "cloud_config"),
        ("docs/secretary.md", ""),             # 'secret' prefix alone is clean
        ("rsa_notes/id_rsa.md", ""),           # suffix after the keyname is clean
        (None, ""),                            # NULL path is path_format's kind
    ]
    df = spark.createDataFrame(
        [(i, p) for i, (p, _) in enumerate(cases)], "i long, path string"
    )
    got = {
        r["i"]: r["k"]
        for r in df.select("i", sensitive_path_kinds("path").alias("k")).collect()
    }
    for i, (p, want) in enumerate(cases):
        assert got[i] == want, (p, got[i], want)


def test_sensitive_path_rule_verdicts(spark):
    from anomaly_detector_spark.checks.paths import run_sensitive_path

    rows = [
        ("r1", "src/a.py", "c1", "python", "x"),
        ("r1", ".env", "c2", "python", "SECRET=hunter2"),
        ("r2", "lib/b.go", "c3", "go", "x"),
    ]
    df = mkfiles(spark, rows)
    spec = CheckSpec("sensitive_path", run_sensitive_path, {}, "lang", 1)
    res = run_sensitive_path(df, spec)
    v = res.violations.collect()
    assert len(v) == 1 and v[0]["path"] == ".env"
    assert "dotenv" in v[0]["observed"] and "hunter2" not in v[0]["observed"]
    verd = {r["partition_key"]: r["verdict"] for r in res.verdicts.collect()}
    assert verd == {"python": "FAIL", "go": "PASS"}


def test_path_format_check_verdicts_and_violations(spark):
    rows = [
        ("r1", "src/a.py", "c1", "python", "x"),
        ("r1", "../evil.py", "c2", "python", "x"),
        ("r2", "ok/b.go", "c3", "go", "x"),
    ]
    spec = CheckSpec("path_format", run_path_format, {"column": "path"}, "lang", 1)
    res = run_path_format(mkfiles(spark, rows), spec)
    v = res.violations.collect()
    assert len(v) == 1 and v[0]["path"] == "../evil.py"
    assert "traversal" in v[0]["observed"]
    verd = {r["partition_key"]: r["verdict"] for r in res.verdicts.collect()}
    assert verd == {"python": "FAIL", "go": "PASS"}


def test_lang_ext_rule(spark):
    rows = [
        ("r", "src/a.de", "c1", "de", "x"),       # agree
        ("r", "src/b.de", "c2", "en", "x"),       # mismatch
        ("r", "src/c.unknownext", "c3", "de", "x"),  # unmapped ext: clean
        ("r", "noext", "c4", "de", "x"),          # no ext: clean
        ("r", "src/d.fr", "c5", None, "x"),       # NULL lang, mapped ext: bad
    ]
    spec = CheckSpec("lang_ext", run_lang_ext, {}, "lang", 1)
    res = run_lang_ext(mkfiles(spark, rows), spec)
    bad = {r["path"]: r["observed"] for r in res.violations.collect()}
    assert set(bad) == {"src/b.de", "src/d.fr"}
    assert bad["src/b.de"] == "lang=en expected=de"
    assert bad["src/d.fr"] == "lang=NULL expected=fr"


def test_lang_ext_custom_mapping_and_case(spark):
    rows = [
        ("r", "src/a.PY", "c1", "python", "x"),   # upper ext, mapped: agree
        ("r", "src/b.py", "c2", "rust", "x"),     # mismatch
    ]
    spec = CheckSpec(
        "lang_ext", run_lang_ext, {"ext_langs": {"py": "python", "rs": "rust"}}, "lang", 1
    )
    res = run_lang_ext(mkfiles(spark, rows), spec)
    assert [r["path"] for r in res.violations.collect()] == ["src/b.py"]
    # expression form: unmapped -> NULL
    df = spark.createDataFrame([("a.py",), ("a.xyz",)], "path string")
    got = [
        r["e"]
        for r in df.select(
            expected_lang_expr("path", {"py": "python"}).alias("e")
        ).collect()
    ]
    assert got == ["python", None]


def test_case_collisions_survivor_and_attribution(spark):
    rows = [
        # two-variant group, same (repo, commit): min form 'src/A.py' survives
        ("r1", "src/A.py", "c1", "python", "x"),
        ("r1", "src/a.py", "c1", "go", "x"),
        # same lower path, DIFFERENT commit: no collision
        ("r1", "src/a.py", "c2", "python", "x"),
        # three-variant group: two violations
        ("r2", "Lib/X.rs", "c3", "rust", "x"),
        ("r2", "lib/x.rs", "c3", "rust", "x"),
        ("r2", "LIB/x.rs", "c3", "rust", "x"),
        # byte-duplicate rows (same form) alone are NOT case collisions
        ("r3", "dup/same.py", "c4", "python", "x"),
        ("r3", "dup/same.py", "c4", "python", "y"),
    ]
    df = mkfiles(spark, rows)
    spec = CheckSpec("case_collisions", run_case_collisions, {}, "lang", 1)
    res = run_case_collisions(df, spec)
    v = sorted((r["path"], r["partition_key"]) for r in res.violations.collect())
    # survivors: 'src/A.py' (A < a), 'LIB/x.rs' (binary min of the three)
    assert v == [
        ("Lib/X.rs", "rust"),
        ("lib/x.rs", "rust"),
        ("src/a.py", "go"),
    ]
    verd = {r["partition_key"]: r["verdict"] for r in res.verdicts.collect()}
    assert verd["go"] == "FAIL" and verd["rust"] == "FAIL" and verd["python"] == "PASS"


def test_case_collisions_null_partition_and_scope(spark):
    rows = [
        ("r", "A.py", "c", None, "x"),
        ("r", "a.py", "c", None, "x"),
    ]
    spec = CheckSpec("case_collisions", run_case_collisions, {}, "lang", 1)
    res = run_case_collisions(mkfiles(spark, rows), spec)
    v = res.violations.collect()
    assert len(v) == 1 and v[0]["partition_key"] is None
    verd = res.verdicts.collect()
    assert len(verd) == 1 and verd[0]["verdict"] == "FAIL"
    # widened scope (repo only): variants across commits now collide
    wide = case_collision_rows(
        mkfiles(spark, [("r", "A.py", "c1", "de", "x"), ("r", "a.py", "c2", "de", "x")]),
        scope=["repo"],
    ).collect()
    assert len(wide) == 1 and wide[0]["path"] == "a.py"


def test_case_collisions_single_exchange(spark):
    df = mkfiles(spark, [("r", f"p{i}.py", "c", "python", "x") for i in range(100)])
    plan = (
        case_collision_rows(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one window partitioning = one hash exchange; content is pruned out
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "content" not in plan.split("Exchange")[0], "content must not ride the shuffle"


def test_path_rules_fold_with_zero_extra_scans(spark, tmp_path):
    """path_format + lang_ext must ride the constraint suite's existing
    row-pass scans (same pin as the hygiene family)."""
    from anomaly_detector_spark.plans.suite import constraint_suite, run_suite

    p = str(tmp_path / "files")
    mkfiles(
        spark, [("r", f"p{i}.de", f"c{i}", "de", "x" * (i + 1)) for i in range(50)]
    ).write.parquet(p)
    df = spark.read.parquet(p)

    def n_scans(frame):
        return (
            frame._jdf.queryExecution().executedPlan().toString().count("Scan parquet")
        )

    rules = [s for s in path_integrity_rules("lang", 1) if s.name != "case_collisions"]
    base = run_suite(df, suite=constraint_suite("lang", 1), fused=True)
    ext = run_suite(df, suite=constraint_suite("lang", 1) + rules, fused=True)
    assert n_scans(ext.violations) == n_scans(base.violations)
    assert n_scans(ext.verdicts) == n_scans(base.verdicts)


def test_paths_config_roundtrip(spark):
    from anomaly_detector_spark.plans.config import suite_from_config, suite_to_config

    code = path_integrity_rules("lang", 25)
    doc = suite_to_config(code)
    back = suite_from_config(doc)
    assert [s.id for s in back] == [s.id for s in code]
    assert [s.fn for s in back] == [s.fn for s in code]


def test_normalize_paths(spark):
    from anomaly_detector_spark.checks.paths import normalize_paths

    cases = [
        ("src\\win\\f.py", "src/win/f.py"),
        ("src//a.py", "src/a.py"),
        ("./src/a.py", "src/a.py"),
        ("/rooted/a.py", "rooted/a.py"),
        ("a /src/ b.py", "a/src/b.py"),
        ("../up/a.py", "../up/a.py"),       # traversal NOT resolved
        ("ok/already.py", "ok/already.py"),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, p) for i, (p, _) in enumerate(cases)], "i long, path string"
    )
    out = {r["i"]: r for r in normalize_paths(df).collect()}
    for i, (p, want) in enumerate(cases):
        assert out[i]["path"] == want, (p, out[i]["path"], want)
        assert out[i]["path_changed"] == (p != want), (p, want)
    # idempotent: a second pass changes nothing
    again = normalize_paths(normalize_paths(df).drop("path_changed"))
    assert again.filter(F.col("path_changed")).count() == 0


def test_normalize_paths_batch_random_invariance(spark):
    """Seeded-random batch property (the codescan entropy pattern — one
    Spark job, not per-example): any canonical path survives arbitrary
    decoration with './', rooted '/', doubled slashes, backslash
    separators, and segment edge whitespace."""
    import random

    from anomaly_detector_spark.checks.paths import normalize_paths

    rng = random.Random(1234)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789_."
    rows = []
    for i in range(200):
        segs = []
        for _ in range(rng.randint(1, 6)):
            s = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 10)))
            # '.'-only segments are exactly what normalization drops —
            # a canonical path must not contain them
            segs.append(s if s.strip(".") else "x")
        canon = "/".join(segs)
        dec = segs[:]
        if rng.random() < 0.5:
            dec = [" " * rng.randint(0, 2) + s + " " * rng.randint(0, 2) for s in dec]
        sep = "\\" if rng.random() < 0.3 else "/"
        path = sep.join(dec)
        if rng.random() < 0.4:
            path = "./" * rng.randint(1, 3) + path
        if rng.random() < 0.3:
            path = "/" + path
        if rng.random() < 0.4 and sep == "/":
            path = path.replace("/", "//", 1)
        rows.append((i, path, canon))
    df = spark.createDataFrame(rows, "i long, path string, canon string")
    out = normalize_paths(df)
    bad = out.filter(F.col("path") != F.col("canon")).collect()
    assert not bad, bad[:5]


def test_skeleton_batch_random_invariance(spark):
    """Seeded-random batch property: for comment-free texts, inserting
    whitespace anywhere and appending comment lines never changes the
    skeleton."""
    import random

    from anomaly_detector_spark.operators.dedup import skeleton

    rng = random.Random(99)
    alphabet = "abcdefghijklmnopqrstuvwxyz(){}[]=+-;:,.'0123456789"
    rows = []
    for i in range(200):
        base = "".join(rng.choice(alphabet + "  \n") for _ in range(rng.randint(5, 120)))
        mutated = "".join(
            ch + (" " * rng.randint(0, 2) if rng.random() < 0.3 else "")
            + ("\t" if rng.random() < 0.05 else "")
            for ch in base
        )
        if rng.random() < 0.5:
            mutated += "\n# appended comment " + str(i)
        if rng.random() < 0.3:
            mutated += "\n// another note"
        rows.append((i, base, mutated))
    df = spark.createDataFrame(rows, "i long, base string, mutated string")
    out = df.select(
        "i",
        skeleton("base").alias("a"),
        skeleton("mutated").alias("b"),
    ).filter(F.col("a") != F.col("b")).collect()
    assert not out, out[:5]


def test_new_checks_empty_input(spark):
    """Verify-probe parity for the session's checks: an empty input
    yields zero verdicts/violations and no crash."""
    from anomaly_detector_spark.checks.codehygiene import (
        run_boilerplate,
        run_encoding,
        run_fork_exposure,
        run_unicode,
    )
    from anomaly_detector_spark.checks.uniqueness import run_commit_bloat

    empty = mkfiles(spark, []).filter("1=0")
    for name, fn, cfg in [
        ("path_format", run_path_format, {}),
        ("lang_ext", run_lang_ext, {}),
        ("case_collisions", run_case_collisions, {}),
        ("sensitive_path", run_sensitive_path, {}),
        ("encoding", run_encoding, {}),
        ("unicode", run_unicode, {}),
        ("boilerplate", run_boilerplate, {}),
        ("fork_exposure", run_fork_exposure, {"hash_fn": "sha256"}),
        ("commit_bloat", run_commit_bloat, {}),
    ]:
        res = fn(empty, CheckSpec(name, fn, cfg, "lang", 1))
        assert res.verdicts.count() == 0, name
        assert res.violations.count() == 0, name
