"""One-pass table profiler (checks/profile.py)."""

import datetime

import pytest

from pyspark.sql import functions as F

from anomaly_detector_spark.checks.profile import profile_table, top_values


def _df(spark):
    rows = [
        (1, "aa", 2.0, True, datetime.datetime(2026, 1, 1, 0, 0, 0), ["x"]),
        (2, None, 4.0, False, datetime.datetime(2026, 1, 1, 0, 0, 10), []),
        (2, "abcd", None, None, None, None),
        (3, "aa", 10.0, True, datetime.datetime(2026, 1, 1, 0, 0, 20), ["y", "z"]),
    ]
    return spark.createDataFrame(
        rows, "i long, s string, v double, b boolean, t timestamp, arr array<string>"
    )


def test_profile_exact(spark):
    out = {
        (r["column"], r["metric"]): r["value"]
        for r in profile_table(_df(spark), exact=True).collect()
    }
    assert out[("i", "n_rows")] == 4.0
    assert out[("i", "n_distinct")] == 3.0
    assert out[("i", "min")] == 1.0 and out[("i", "max")] == 3.0 and out[("i", "mean")] == 2.0
    assert out[("s", "n_null")] == 1.0 and out[("s", "null_frac")] == 0.25
    # string min/max/mean are LENGTH stats
    assert out[("s", "min")] == 2.0 and out[("s", "max")] == 4.0
    assert abs(out[("s", "mean")] - 8 / 3) < 1e-3
    assert out[("v", "mean")] == round(16 / 3, 4)
    assert out[("b", "min")] == 0.0 and out[("b", "max")] == 1.0
    # timestamps profile as integer epoch seconds
    base = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc).timestamp()
    assert out[("t", "min")] == base and out[("t", "max")] == base + 20
    assert out[("t", "mean")] == round(base + 10, 4)
    # unmeasurable array column: only the four basic metrics
    arr = {m for (c, m) in out if c == "arr"}
    assert arr == {"n_rows", "n_null", "null_frac", "n_distinct"}


def test_profile_approx_runs_and_counts_match(spark):
    df = _df(spark)
    ex = {
        (r["column"], r["metric"]): r["value"]
        for r in profile_table(df, exact=True).collect()
    }
    ap = {
        (r["column"], r["metric"]): r["value"]
        for r in profile_table(df, exact=False).collect()
    }
    assert set(ex) == set(ap)
    # at 4 rows HLL is exact too; everything but n_distinct is identical math
    for k, v in ex.items():
        assert ap[k] == v, k


def test_profile_column_subset(spark):
    out = profile_table(_df(spark), columns=["i", "s"], exact=True)
    assert set(r["column"] for r in out.collect()) == {"i", "s"}


def test_top_values(spark):
    df = _df(spark)
    rows = top_values(df, "i", 2).collect()
    assert (rows[0]["value"], rows[0]["n"]) == ("2", 2)
    assert rows[1]["n"] == 1  # deterministic tie-break: value asc
    assert rows[1]["value"] == "1"
    # NULL counts as a value
    nulls = top_values(df.where(F.col("s").isNull()), "s", 1).collect()[0]
    assert nulls["value"] is None and nulls["n"] == 1


def test_profile_grouped(spark):
    df = _df(spark).withColumn("grp", F.when(F.col("i") == 2, "a").otherwise("b"))
    out = {
        (r["grp"], r["column"], r["metric"]): r["value"]
        for r in profile_table(df, columns=["i", "v"], by="grp", exact=True).collect()
    }
    assert out[("a", "i", "n_rows")] == 2.0
    assert out[("b", "i", "n_rows")] == 2.0
    assert out[("a", "i", "n_distinct")] == 1.0
    assert out[("b", "i", "min")] == 1.0 and out[("b", "i", "max")] == 3.0
    assert out[("a", "v", "n_null")] == 1.0
    # the by column itself is excluded from the default column set
    full = profile_table(df, by="grp", exact=True)
    assert "grp" not in {r["column"] for r in full.collect()}


def test_suggest_sweep_feeds_drift_sweep(spark):
    """Profile-driven sweep authoring: measurable columns get a width of
    (max-min)/buckets on the SAME measure the sweep buckets (value /
    length / epoch), constants and unmeasurables are skipped, and the
    suggested dict drives run_drift_sweep end-to-end (incl. a timestamp
    column — epoch bucketing, not a raw interval division)."""
    from anomaly_detector_spark.checks.base import CheckSpec
    from anomaly_detector_spark.checks.drift import run_drift_sweep
    from anomaly_detector_spark.checks.profile import suggest_sweep

    df = spark.createDataFrame(
        [
            ("g1", float(i % 100), "x" * (10 + i % 40), 7.0,
             f"2026-01-01 0{i % 10}:00:00", [1])
            for i in range(200)
        ],
        "grp string, v double, txt string, const double, ts string, arr array<int>",
    ).select("grp", "v", "txt", "const", F.col("ts").cast("timestamp").alias("ts"), "arr")

    sw = suggest_sweep(df, buckets=10)
    assert set(sw) == {"v", "txt", "ts"}  # const (max==min) + array skipped
    assert sw["v"] == pytest.approx(9.9, abs=1e-9)  # (99-0)/10
    assert sw["txt"] == pytest.approx(3.9, abs=1e-9)  # length range 10..49
    assert sw["ts"] == pytest.approx(9 * 3600 / 10)  # epoch-second range

    spec = CheckSpec("sweep", run_drift_sweep, {"columns": sw}, "grp", 1)
    res = spec.run(df)
    assert {r["verdict"] for r in res.verdicts.collect()} <= {"PASS", "FAIL", "SKIPPED"}
    cols_scored = {r["column"] for r in res.metrics.collect()}
    assert cols_scored == {"v", "txt", "ts"}


def test_suggest_rules_roundtrip(spark):
    """Suggest on a trusted snapshot -> all suggested rules PASS on it;
    a drifted snapshot (new domain value, oversized content, new NULLs)
    FAILs the matching rules."""
    from anomaly_detector_spark.checks.base import FAIL, PASS
    from anomaly_detector_spark.checks.profile import suggest_rules
    from anomaly_detector_spark.plans.suite import run_suite

    trusted = spark.createDataFrame(
        [("r", f"p{i}", f"c{i}", "python" if i % 2 else "go", "x" * 10) for i in range(40)],
        "repo string, path string, commit string, lang string, content string",
    )
    specs = suggest_rules(trusted, partition_col="lang", min_rows=1)
    names = {s.name for s in specs}
    assert "suggest_complete_content" in names
    assert "suggest_domain_lang" in names
    assert "suggest_maxlen_content" in names
    dom = next(s for s in specs if s.name == "suggest_domain_lang")
    assert dom.config["values"] == ["go", "python"] and dom.config["allow_null"] is False

    res = run_suite(trusted, suite=specs, fused=True)
    assert {r["verdict"] for r in res.verdicts.collect()} == {PASS}

    drifted = trusted.unionByName(
        spark.createDataFrame(
            [
                ("r", "new1", "cX", "cobol", "x" * 10),   # outside domain
                ("r", "new2", "cY", "python", "x" * 100), # over the 2x length cap
                ("r", "new3", "cZ", "go", None),          # new NULL content
            ],
            "repo string, path string, commit string, lang string, content string",
        )
    )
    res2 = run_suite(drifted, suite=specs, fused=True)
    by = {s.id: s.name for s in specs}
    fails = {
        (by[r["check_id"]], r["partition_key"])
        for r in res2.verdicts.collect()
        if r["verdict"] == FAIL
    }
    assert ("suggest_domain_lang", "cobol") in fails
    assert ("suggest_maxlen_content", "python") in fails
    assert ("suggest_complete_content", "go") in fails


def test_topk_sketches_merge_with_sound_bounds(spark):
    """Heavy-hitter member of the mergeable sketch family: truncated
    per-run top-k counts + rank-(k+1) bound merge across runs with a
    sound undercount interval — est <= true <= upper, and upper == est
    exactly when every run stored the item."""
    from anomaly_detector_spark.checks.profile import topk_sketches, topk_union

    def mk(counts):
        rows = [("p", it) for it, n in counts for _ in range(n)]
        return spark.createDataFrame(rows, "g string, v string")

    # run 1 keeps a(50), b(10); bound = count at rank 3 = c(3)
    s1 = topk_sketches(
        mk([("a", 50), ("b", 10), ("c", 3), ("d", 2)]), "g", "v", k=2, run_id="r1"
    )
    # run 2 keeps a(40), c(12); bound = b(4)
    s2 = topk_sketches(
        mk([("a", 40), ("c", 12), ("b", 4), ("e", 1)]), "g", "v", k=2, run_id="r2"
    )
    assert {r["bound"] for r in s1.collect()} == {3}
    assert {r["bound"] for r in s2.collect()} == {4}

    rows = {r["item"]: r for r in topk_union(s1.unionByName(s2), k=3).collect()}
    assert rows["a"]["rank"] == 1 and rows["a"]["est"] == 90 and rows["a"]["upper"] == 90
    # stored by one run only: the other run's bound widens the interval
    assert rows["c"]["est"] == 12 and rows["c"]["upper"] == 15  # true = 15
    assert rows["b"]["est"] == 10 and rows["b"]["upper"] == 14  # true = 14
    assert [r["item"] for r in sorted(rows.values(), key=lambda r: r["rank"])] == ["a", "c", "b"]


def test_skew_profile_flags_hot_key(spark):
    from anomaly_detector_spark.checks.profile import skew_profile

    # col a: 'hot' on 60 of 100 rows, the rest spread over 40 values;
    # col b: uniform over 4 values (skew_x == 1 for every value)
    rows = [("hot" if i < 60 else f"v{i}", f"u{i % 4}") for i in range(100)]
    df = spark.createDataFrame(rows, "a string, b string")
    out = skew_profile(df, ["a", "b"], k=3, min_share=0.01)
    got = {(r["col_name"], r["rank"]): r for r in out.collect()}

    hot = got[("a", 1)]
    assert hot["value"] == "hot" and hot["n"] == 60
    assert abs(hot["share"] - 0.6) < 1e-9
    # 41 distinct values in a -> skew_x = 0.6 * 41
    assert abs(hot["skew_x"] - 24.6) < 1e-6
    for rk in (1, 2, 3):
        assert abs(got[("b", rk)]["skew_x"] - 1.0) < 1e-6

    # min_share pre-filter: a's singleton values (share 0.01) survive at
    # 0.01 but are cut at 0.02 — fewer than k survivors is the answer
    cut = skew_profile(df, ["a"], k=3, min_share=0.02).collect()
    assert [r["value"] for r in cut] == ["hot"]
