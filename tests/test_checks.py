"""Unit tests per check on tiny hand-written frames with known answers
(the analog of the reference's assert-exact golden style,
/root/reference/tests/_util.py:93-104)."""

import pytest
from pyspark.sql import functions as F

from anomaly_detector_spark.checks.base import CheckSpec, FAIL, PASS, SKIPPED
from anomaly_detector_spark.checks.drift import (
    drift_scores,
    flag_outliers,
    global_baseline,
    length_histogram,
    psi_ks,
    run_drift,
)
from anomaly_detector_spark.checks.referential import run_referential, unknown_lang_rows
from anomaly_detector_spark.checks.stats import run_stats
from anomaly_detector_spark.checks.uniqueness import (
    dedup_keep_first,
    duplicate_counts,
    run_uniqueness,
)

FILES_COLS = "repo string, path string, commit string, lang string, content string"


def mkfiles(spark, rows):
    return spark.createDataFrame(rows, FILES_COLS)


def test_stats_known_answers(spark):
    df = mkfiles(
        spark,
        [
            ("r", "a", "c1", "python", "abc"),
            ("r", "b", "c1", "python", None),
            ("r", "c", "c1", "python", "abcdef"),
            ("r", "d", "c1", "go", "xy"),
        ],
    )
    spec = CheckSpec("stats", run_stats, {"approx": False, "max_null_rate": 0.3}, "lang", 1)
    res = spec.run(df)
    m = {r["lang"]: r.asDict() for r in res.metrics.collect()}
    assert m["python"]["n_rows"] == 3
    assert m["python"]["n_null"] == 1
    assert abs(m["python"]["null_rate"] - 1 / 3) < 1e-9
    assert m["python"]["min_len"] == 3 and m["python"]["max_len"] == 6
    assert m["python"]["distinct_content"] == 2
    v = {r["partition_key"]: r["verdict"] for r in res.verdicts.collect()}
    assert v["python"] == FAIL  # null_rate 0.33 > 0.3
    assert v["go"] == PASS
    assert res.violations.count() == 1  # the NULL row


def test_stats_min_rows_skip(spark):
    df = mkfiles(spark, [("r", "a", "c", "python", "abc")])
    spec = CheckSpec("stats", run_stats, {"approx": False}, "lang", min_rows=5)
    v = spec.run(df).verdicts.collect()[0]
    assert v["verdict"] == SKIPPED


def test_uniqueness_keep_first_and_violations(spark):
    df = mkfiles(
        spark,
        [
            ("r", "p", "c1", "python", "AAA"),
            ("r", "p", "c1", "python", "BBB"),  # dup key, different content
            ("r", "q", "c1", "python", "CCC"),
        ],
    )
    spec = CheckSpec("uniqueness", run_uniqueness, {}, "lang", 1)
    res = spec.run(df)
    viol = res.violations.collect()
    assert len(viol) == 1
    assert viol[0]["observed"] == "key seen 2 times"
    # keep-first with order_col=content keeps "AAA"
    surv = dedup_keep_first(df).filter(F.col("path") == "p").collect()
    assert len(surv) == 1 and surv[0]["content"] == "AAA"
    assert {r["verdict"] for r in res.verdicts.collect()} == {FAIL}


def test_uniqueness_salted_matches_unsalted(spark):
    rows = [("mega/repo", f"p{i % 7}", "c", "python", f"x{i}") for i in range(100)]
    df = mkfiles(spark, rows)
    plain = {tuple(r) for r in duplicate_counts(df).collect()}
    salted = {tuple(r) for r in duplicate_counts(df, salt_buckets=8).collect()}
    assert plain == salted


def test_referential(spark):
    df = mkfiles(
        spark,
        [
            ("r", "a", "c", "python", "x"),
            ("r", "b", "c", "klingon", "y"),
            ("r", "c", "c", None, "z"),
        ],
    )
    dim = spark.createDataFrame([("python",)], "lang string")
    bad = unknown_lang_rows(df, dim).collect()
    assert {r["path"] for r in bad} == {"b", "c"}  # NULL lang is a violation
    spec = CheckSpec("referential", run_referential, {"dim_df": dim}, "lang", 1)
    res = spec.run(df)
    assert res.violations.count() == 2


def test_psi_ks_oracle():
    # identical distributions → 0 drift
    psi, ks = psi_ks([10, 20, 30], [10, 20, 30])
    assert psi == pytest.approx(0.0, abs=1e-12)
    assert ks == pytest.approx(0.0, abs=1e-12)
    # disjoint mass → large psi
    psi2, _ = psi_ks([100, 0], [0, 100])
    assert psi2 > 5


def test_drift_flags_planted_shift(spark):
    rows = []
    for i in range(300):
        rows.append(("r", f"a{i}", "c", "python", "x" * (50 + i % 20)))
        rows.append(("r", f"b{i}", "c", "go", "x" * (50 + i % 20)))
        rows.append(("r", f"c{i}", "c", "rust", "x" * (500 + i % 20)))  # shifted
    df = mkfiles(spark, rows)
    spec = CheckSpec("drift", run_drift, {"bucket_width": 50}, "lang", 25)
    res = spec.run(df)
    v = {r["partition_key"]: r["verdict"] for r in res.verdicts.collect()}
    assert v["rust"] == FAIL
    assert v["python"] == PASS and v["go"] == PASS


def test_drift_kernel_matches_oracle(spark):
    rows = [("r", f"p{i}", "c", "python" if i % 2 else "go", "y" * (10 + (i * 37) % 300)) for i in range(200)]
    df = mkfiles(spark, rows)
    hist = length_histogram(df, "lang", bucket_width=50)
    scores = {r["partition_key"]: r for r in drift_scores(hist, global_baseline(hist)).collect()}
    # recompute with the pure-python oracle
    import collections

    by_lang = collections.defaultdict(collections.Counter)
    for repo, path, commit, lang, content in rows:
        by_lang[lang][len(content) // 50] += 1
    buckets = sorted({b for c in by_lang.values() for b in c})
    base = [sum(c[b] for c in by_lang.values()) for b in buckets]
    for lang, counter in by_lang.items():
        obs = [counter.get(b, 0) for b in buckets]
        psi, ks = psi_ks(obs, base)
        assert scores[lang]["psi"] == pytest.approx(psi, rel=1e-9)
        assert scores[lang]["ks"] == pytest.approx(ks, rel=1e-9)


def test_flag_outliers_median_gate(spark):
    scores = spark.createDataFrame(
        [("a", 0.01, 0.0, 100, 5), ("b", 0.02, 0.0, 100, 5), ("c", 0.015, 0.0, 100, 5), ("d", 5.0, 0.0, 100, 5)],
        "partition_key string, psi double, ks double, n_obs long, n_buckets long",
    )
    flagged = {r["partition_key"]: r["is_drifted"] for r in flag_outliers(scores).collect()}
    assert flagged == {"a": False, "b": False, "c": False, "d": True}


def test_hll_sketches_mergeable(spark):
    # the sketch union across partitions must estimate the GLOBAL distinct
    # count (shared content across partitions counted once), within HLL
    # error; and merging two disjoint runs' sketches == one full-scan sketch
    from anomaly_detector_spark.checks.stats import hll_sketches, hll_union_estimate

    df = spark.range(20000).select(
        (F.col("id") % 5).cast("string").alias("lang"),
        F.concat(F.lit("c"), (F.col("id") % 3000).cast("string")).alias("content"),
    )
    per_part = hll_sketches(df, "lang", "content")
    assert per_part.count() == 5
    est = hll_union_estimate(per_part).collect()[0]
    assert est["n_rows"] == 20000
    assert abs(est["distinct_estimate"] - 3000) / 3000 < 0.05

    # incremental: sketches from two halves union to the same estimate
    a = hll_sketches(df.filter(F.col("id") < 10000), "lang", "content")
    b = hll_sketches(df.filter(F.col("id") >= 10000), "lang", "content")
    est2 = hll_union_estimate(a.unionByName(b)).collect()[0]
    # merge order may shift the estimate slightly (sparse->dense
    # promotion points differ); both must stay within HLL error of truth
    assert abs(est2["distinct_estimate"] - 3000) / 3000 < 0.05


def test_count_drift_flags_share_shift(spark):
    # baseline: 4 langs with equal shares; current: one lang's share
    # quadrupled — it (and only it) must be flagged vs the frozen baseline
    from anomaly_detector_spark.checks.drift import run_count_drift

    langs = ["en", "de", "es", "fr"]
    cur_rows = [(lang,) for lang in langs for _ in range(1000)] + [("en",)] * 3000
    df = spark.createDataFrame(cur_rows, "lang string")
    baseline = spark.createDataFrame([(lang, 1000.0) for lang in langs],
                                     "partition_key string, base_n double")
    spec = CheckSpec("count_drift", run_count_drift, {"baseline_df": baseline}, "lang", 25)
    res = run_count_drift(df, spec)
    verd = {r["partition_key"]: r["verdict"] for r in res.verdicts.collect()}
    assert verd["en"] == FAIL
    assert all(v == PASS for k, v in verd.items() if k != "en")


def test_count_drift_stable_distribution_passes(spark):
    from anomaly_detector_spark.checks.drift import run_count_drift

    rows = [(lang,) for lang in ("en", "de", "es", "fr") for _ in range(500)]
    df = spark.createDataFrame(rows, "lang string")
    spec = CheckSpec("count_drift", run_count_drift, {}, "lang", 25)
    res = run_count_drift(df, spec)  # default baseline: uniform — matches
    assert {r["verdict"] for r in res.verdicts.collect()} == {PASS}


def test_count_drift_null_partition_single_row(spark):
    # ADVICE r2 (medium): a NULL partition_key must join null-safely to
    # its baseline row — plain equality emitted TWO verdict rows for the
    # NULL partition (a spurious FAIL from the unmatched cur side plus a
    # SKIPPED from the unmatched baseline side).
    from anomaly_detector_spark.checks.drift import run_count_drift

    rows = [(lang,) for lang in ("en", "de", "es") for _ in range(1000)] + [(None,)] * 1000
    df = spark.createDataFrame(rows, "lang string")
    baseline = spark.createDataFrame(
        [("en", 1000.0), ("de", 1000.0), ("es", 1000.0), (None, 1000.0)],
        "partition_key string, base_n double",
    )
    spec = CheckSpec("count_drift", run_count_drift, {"baseline_df": baseline}, "lang", 25)
    res = run_count_drift(df, spec)
    verd = res.verdicts.collect()
    keys = [r["partition_key"] for r in verd]
    assert sorted(keys, key=lambda k: (k is None, k)) == ["de", "en", "es", None]
    assert {r["verdict"] for r in verd} == {PASS}  # uniform vs uniform baseline

    # default (uniform) baseline path: same single-row-per-partition law
    spec2 = CheckSpec("count_drift", run_count_drift, {}, "lang", 25)
    res2 = run_count_drift(df, spec2)
    keys2 = [r["partition_key"] for r in res2.verdicts.collect()]
    assert len(keys2) == 4 and len(set(map(str, keys2))) == 4


def test_tdigest_compress_and_quantile_oracle():
    # pure-math check: digest quantiles of a known distribution track the
    # exact quantiles within t-digest error (delta=200)
    import numpy as np

    from anomaly_detector_spark.checks.quantiles import td_compress, td_quantile

    rng = np.random.RandomState(7)
    v = rng.lognormal(4.0, 1.0, 50000)
    m, w = td_compress(v, np.ones_like(v), delta=200.0)
    assert len(m) < 500  # compressed
    assert float(w.sum()) == pytest.approx(50000.0)
    for q in (0.5, 0.9, 0.99):
        exact = float(np.quantile(v, q))
        est = td_quantile(m, w, q)
        assert abs(est - exact) / exact < 0.02, (q, est, exact)


def test_tdigest_sketches_mergeable(spark):
    # per-partition sketches merge to the same global quantiles as a
    # one-shot digest, and both track exact percentiles; two disjoint
    # halves' sketches union to the full-scan answer (incremental form)
    from anomaly_detector_spark.checks.quantiles import (
        quantiles_from_sketches,
        tdigest_sketches,
    )

    df = spark.range(20000).select(
        (F.col("id") % 5).cast("string").alias("lang"),
        F.repeat(F.lit("x"), ((F.col("id") * 37) % 400 + 10).cast("int")).alias("content"),
    )
    sk = tdigest_sketches(df, "lang", "content")
    assert sk.count() == 5
    est = quantiles_from_sketches(sk, [0.5, 0.99]).collect()[0]
    exact = df.selectExpr(
        "percentile(length(content), 0.5) AS p50",
        "percentile(length(content), 0.99) AS p99",
    ).collect()[0]
    assert est["n_rows"] == 20000
    assert abs(est["q_0_5"] - exact["p50"]) / exact["p50"] < 0.02
    assert abs(est["q_0_99"] - exact["p99"]) / exact["p99"] < 0.02

    a = tdigest_sketches(df.filter(F.col("id") < 10000), "lang", "content")
    b = tdigest_sketches(df.filter(F.col("id") >= 10000), "lang", "content")
    est2 = quantiles_from_sketches(a.unionByName(b), [0.5, 0.99]).collect()[0]
    assert abs(est2["q_0_5"] - exact["p50"]) / exact["p50"] < 0.02
    assert abs(est2["q_0_99"] - exact["p99"]) / exact["p99"] < 0.02


def test_drift_attribution_decomposes_psi(spark):
    from anomaly_detector_spark.checks.drift import drift_attribution

    rows = []
    for i in range(300):
        rows.append(("r", f"a{i}", "c", "python", "x" * (50 + i % 20)))
        rows.append(("r", f"b{i}", "c", "go", "x" * (50 + i % 20)))
        rows.append(("r", f"c{i}", "c", "rust", "x" * (500 + i % 20)))  # shifted
    df = mkfiles(spark, rows)
    hist = length_histogram(df, "lang", bucket_width=50)
    base = global_baseline(hist)
    psi = {r["partition_key"]: r["psi"] for r in drift_scores(hist, base).collect()}
    # with top_k covering every bucket, the terms sum back to the exact
    # kernel PSI per partition (same grid, same smoothing)
    full = drift_attribution(hist, base, top_k=10_000).toPandas()
    for key, grp in full.groupby("partition_key"):
        assert abs(grp["psi_term"].sum() - psi[key]) < 1e-12
    # the shifted partition's two contributors are the bucket where it is
    # MISSING baseline mass (50..99 -> bucket 1; p<<q terms are positive
    # and dominate) and the bucket where it GAINED mass (500..549 -> 10)
    top = drift_attribution(hist, base, top_k=2).toPandas()
    rust = top[top["partition_key"] == "rust"].sort_values("rank")
    assert list(rust["bucket"]) == [1, 10]
    assert (rust["psi_term"] > 0).all()


def test_drift_examples_sample_blamed_buckets(spark):
    from anomaly_detector_spark.checks.drift import drift_attribution, drift_examples

    rows = []
    for i in range(300):
        rows.append(("r", f"a{i}", "c", "python", "x" * (50 + i % 20)))
        rows.append(("r", f"b{i}", "c", "go", "x" * (50 + i % 20)))
        rows.append(("r", f"c{i}", "c", "rust", "x" * (500 + i % 20)))  # shifted
    df = mkfiles(spark, rows)
    hist = length_histogram(df, "lang", bucket_width=50).cache()
    # top_k=2 so the shifted partition's GAINED-mass bucket (10) is in
    # scope — its top-1 is the MISSING-mass bucket (1), which by nature
    # has no rows to exemplify (see drift_examples docstring)
    att = drift_attribution(hist, global_baseline(hist), top_k=2).cache()

    # per_bucket >= group size: EVERY row of each blamed bucket survives
    full = drift_examples(df, att, "lang", bucket_width=50, per_bucket=10_000)
    got = full.toPandas()
    blamed = {(r["partition_key"], r["bucket"]) for r in att.collect()}
    assert set(zip(got["partition_key"], got["bucket"])) <= blamed
    rust = got[got["partition_key"] == "rust"]
    assert len(rust) == 300 and (rust["bucket"] == 10).all()
    assert rust["measured"].between(500, 519).all()

    # small per_bucket: a genuine sample — subset, deterministic, and
    # invariant to input partitioning (hash-threshold, no rank window)
    few = drift_examples(df, att, "lang", bucket_width=50, per_bucket=5)
    f1 = sorted(map(tuple, few.collect()))
    assert 0 < len(f1) < len(got)
    assert set(f1) <= set(map(tuple, full.collect()))
    f2 = sorted(map(tuple, drift_examples(
        df.repartition(7), att, "lang", bucket_width=50, per_bucket=5
    ).collect()))
    assert f1 == f2
    # sha256 oracle mode: same schema/bucket semantics, same determinism
    sha = drift_examples(
        df, att, "lang", bucket_width=50, per_bucket=5, hash_fn="sha256"
    )
    s1 = sorted(map(tuple, sha.collect()))
    assert 0 < len(s1) and set(s1) <= set(map(tuple, full.collect()))
    hist.unpersist(), att.unpersist()


def test_drift_sweep_one_scan_worst_column(spark, tmp_path):
    from anomaly_detector_spark.checks.drift import multi_column_drift, run_drift_sweep

    # three flat peers anchor the per-column median; 'noisy' moved only
    # its text lengths, 'shifted' only its value distribution
    rows = []
    for i in range(300):
        for g in ("flat1", "flat2", "flat3"):
            rows.append((g, 10.0 + i % 20, "x" * (40 + i % 10)))
        rows.append(("noisy", 10.0 + i % 20, "y" * (400 + i % 10)))
        rows.append(("shifted", 500.0 + i % 20, "z" * (40 + i % 10)))
    rows.append(("flat1", None, None))  # NULLs drop per column
    df = spark.createDataFrame(rows, "grp string, value double, txt string")
    p = str(tmp_path / "t")
    df.write.parquet(p)
    df = spark.read.parquet(p)

    scores = multi_column_drift(df, "grp", {"value": 10.0, "txt": 20.0})
    got = {(r["partition_key"], r["column"]): (r["psi"], r["n_obs"]) for r in scores.collect()}
    assert got[("flat1", "value")][1] == 300  # the NULL row dropped
    # per-column psi equals the single-column kernel's psi (same grid &
    # smoothing — the attribution identity), column by column
    for col, width, mode in (("value", 10.0, "value"), ("txt", 20.0, "length")):
        hist = length_histogram(df, "grp", col, int(width), mode=mode)
        single = {r["partition_key"]: r["psi"] for r in drift_scores(hist, global_baseline(hist)).collect()}
        for grp in ("flat1", "flat2", "noisy", "shifted"):
            assert abs(got[(grp, col)][0] - single[grp]) < 1e-6, (col, grp)

    spec = CheckSpec(
        "sweep", run_drift_sweep,
        {"columns": {"value": 10.0, "txt": 20.0}}, "grp", 25,
    )
    res = spec.run(df)
    v = {r["partition_key"]: r["verdict"] for r in res.verdicts.collect()}
    assert v == {"flat1": PASS, "flat2": PASS, "flat3": PASS,
                 "noisy": FAIL, "shifted": FAIL}
    # per-(partition, column) flags: each drifter flagged ONLY on its column
    fl = {(r["partition_key"], r["column"]): r["is_drifted"] for r in res.metrics.collect()}
    assert fl[("noisy", "txt")] is True and fl[("noisy", "value")] is False
    assert fl[("shifted", "value")] is True and fl[("shifted", "txt")] is False
    assert not any(flag for (g, _), flag in fl.items() if g.startswith("flat"))

    # ONE scan: the verdicts plan reads only the checkpointed histogram
    plan = res.verdicts._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 0, plan
    # materialize=False agrees
    pure = CheckSpec(
        "sweep", run_drift_sweep,
        {"columns": {"value": 10.0, "txt": 20.0}, "materialize": False}, "grp", 25,
    ).run(df)
    assert {r["partition_key"]: r["verdict"] for r in pure.verdicts.collect()} == v


def test_drift_sweep_external_baseline_catches_wholesale_shift(spark):
    from anomaly_detector_spark.checks.drift import (
        multi_column_drift,
        run_drift_sweep,
        sweep_baseline,
    )

    cols = {"value": 10.0, "txt": 20.0}

    def snap(value_off):
        rows = []
        for i in range(300):
            for g in ("a", "b", "c"):
                rows.append((g, value_off + i % 20, "x" * (40 + i % 10)))
        return spark.createDataFrame(rows, "grp string, value double, txt string")

    day1, day2 = snap(10.0), snap(500.0)  # EVERY partition's value moved
    base = sweep_baseline(day1, cols, materialize=True)

    # in-batch relative sweep on day2 is structurally blind: all three
    # partitions moved together, the pool moved with them
    blind = CheckSpec("sweep", run_drift_sweep, {"columns": cols}, "grp", 25)
    assert {r["verdict"] for r in blind.run(day2).verdicts.collect()} == {PASS}

    # the external baseline + absolute gate flags every partition on
    # `value` and none on the untouched `txt`
    ext = CheckSpec(
        "sweep", run_drift_sweep,
        {"columns": cols, "baseline_df": base, "gate_mode": "absolute"}, "grp", 25,
    )
    res = ext.run(day2)
    assert {r["verdict"] for r in res.verdicts.collect()} == {FAIL}
    fl = {(r["partition_key"], r["column"]): r["is_drifted"] for r in res.metrics.collect()}
    assert all(fl[(g, "value")] for g in "abc") and not any(fl[(g, "txt")] for g in "abc")

    # sanity: scoring day1 against its own pooled baseline rows is the
    # in-batch pooled computation exactly (same support, same totals)
    s_ext = {(r["partition_key"], r["column"]): r["psi"]
             for r in multi_column_drift(day1, "grp", cols, baseline=base).collect()}
    s_pool = {(r["partition_key"], r["column"]): r["psi"]
              for r in multi_column_drift(day1, "grp", cols).collect()}
    assert s_ext == s_pool
    # new-mass visibility: day2's value buckets are absent from the
    # baseline support — union grid keeps them (psi large, not zero)
    s2 = {(r["partition_key"], r["column"]): r["psi"]
          for r in multi_column_drift(day2, "grp", cols, baseline=base).collect()}
    assert all(s2[(g, "value")] > 1.0 for g in "abc")


def test_reconcile_cross_table(spark):
    from anomaly_detector_spark.checks.base import CheckSpec
    from anomaly_detector_spark.checks.reconcile import run_reconcile

    left = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("b", 100.0), ("c", 1.0), (None, 7.0)],
        "g string, m double",
    )
    right = spark.createDataFrame(
        [("a", 30.0), ("b", 95.0), ("d", 2.0), (None, 7.0)],
        "g string, m double",
    )
    spec = CheckSpec("reconcile", run_reconcile, {"other_df": right, "measure": "m"}, "g")
    v = {r["partition_key"]: r for r in run_reconcile(left, spec).verdicts.collect()}
    assert len(v) == 5  # the NULL group is ONE row (null-safe join), not two
    assert v["a"]["verdict"] == "PASS"
    assert v["b"]["verdict"] == "FAIL" and v["b"]["metrics"]["diff"] == 5.0
    assert v["c"]["verdict"] == "FAIL"  # group missing on the right
    assert v["d"]["verdict"] == "FAIL"  # group missing on the left
    assert v[None]["verdict"] == "PASS"

    tol = CheckSpec(
        "reconcile", run_reconcile, {"other_df": right, "measure": "m", "tol_abs": 10.0}, "g"
    )
    v2 = {r["partition_key"]: r["verdict"] for r in run_reconcile(left, tol).verdicts.collect()}
    assert v2["b"] == "PASS" and v2["c"] == "FAIL"  # tolerance absolves b, not missing groups

    cnt = CheckSpec("reconcile", run_reconcile, {"other_df": right, "agg": "count"}, "g")
    v3 = {r["partition_key"]: r for r in run_reconcile(left, cnt).verdicts.collect()}
    assert v3["a"]["verdict"] == "FAIL" and v3["a"]["metrics"]["lhs"] == 2.0
    assert v3["b"]["verdict"] == "PASS"

    warm = CheckSpec(
        "reconcile", run_reconcile, {"other_df": right, "measure": "m"}, "g", min_rows=2
    )
    v4 = {r["partition_key"]: r["verdict"] for r in run_reconcile(left, warm).verdicts.collect()}
    assert v4["a"] == "PASS" and v4["b"] == "SKIPPED"
    assert v4["d"] == "FAIL"  # missing-left is a FAIL, never a warm-up skip

    # check id is stable whether other_df is injected or not (runtime
    # state, not configuration) — manifest rows stay comparable
    assert spec.id == CheckSpec("reconcile", run_reconcile, {"measure": "m"}, "g").id


def test_drift_value_mode_catches_numeric_shift(spark):
    """mode='value' buckets the numeric column itself: a shifted
    partition FAILs value-mode drift while length-mode (on an identical
    text column) sees nothing — telemetry drift is a first-class
    dimension, not just content length."""
    from anomaly_detector_spark.checks.base import CheckSpec
    from anomaly_detector_spark.checks.drift import run_drift

    rows = []
    for grp, base in (("a", 0.0), ("b", 0.0), ("c", 1000.0)):  # c shifted
        for i in range(300):
            rows.append((grp, base + (i % 100), "x" * 50))
    df = spark.createDataFrame(rows, "grp string, value double, txt string")

    vspec = CheckSpec(
        "value_drift", run_drift, {"column": "value", "mode": "value", "bucket_width": 10}, "grp"
    )
    vres = run_drift(df, vspec)
    v = {r["partition_key"]: r["verdict"] for r in vres.verdicts.collect()}
    assert v == {"a": "PASS", "b": "PASS", "c": "FAIL"}

    lspec = CheckSpec("len_drift", run_drift, {"column": "txt", "bucket_width": 10}, "grp")
    lres = run_drift(df, lspec)
    assert {r["verdict"] for r in lres.verdicts.collect()} == {"PASS"}
    for res in (vres, lres):
        for c in res.caches:
            c.unpersist()


def test_fk_missing_and_orphan_keys(spark):
    from anomaly_detector_spark.checks.referential import fk_missing_keys, orphan_dim_keys

    fact = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 11), (4, 99), (5, 99), (6, None)],
        "row_id long, fk long",
    )
    dim = spark.createDataFrame([(10,), (11,), (12,)], "k long")

    missing = {
        r["fk_value"]: r["n_rows"]
        for r in fk_missing_keys(fact, "fk", dim, "k").collect()
    }
    # 99 twice, NULL once (NULL matches nothing -> violation)
    assert missing == {99: 2, None: 1}

    orphans = sorted(r["k"] for r in orphan_dim_keys(dim, "k", fact, "fk").collect())
    assert orphans == [12]


def test_fd_check(spark):
    from anomaly_detector_spark.checks.base import CheckSpec
    from anomaly_detector_spark.checks.fd import fd_violating_keys, run_fd

    # repo r1 spans two langs (violating), r2/r3 are clean; NULL repo
    # appears with two langs -> NULL keys group together and violate
    rows = [
        ("r1", "a.py", "c1", "py"), ("r1", "b.go", "c2", "go"),
        ("r2", "c.py", "c3", "py"), ("r2", "d.py", "c4", "py"),
        ("r3", "e.go", "c5", "go"),
        (None, "f.py", "c6", "py"), (None, "g.go", "c7", "go"),
    ]
    df = spark.createDataFrame(rows, "repo string, path string, commit string, lang string")

    keys = {r["repo"]: r["n_rhs"] for r in fd_violating_keys(df, ["repo"], "lang").collect()}
    assert keys == {"r1": 2, None: 2}

    spec = CheckSpec("fd_repo_lang", run_fd, {"lhs": ["repo"], "rhs": "lang"}, "lang", 1)
    res = run_fd(df, spec)
    got = {r["partition_key"]: (r["verdict"], r["metrics"]["n_fd_bad_rows"]) for r in res.verdicts.collect()}
    # py: 4 rows, 2 under violating keys (r1 + NULL); go: 3 rows, 2 bad
    assert got == {"py": ("FAIL", 2.0), "go": ("FAIL", 2.0)}

    # clean table passes
    clean = df.filter(F.col("repo").isin("r2", "r3"))
    res2 = run_fd(clean, spec)
    assert {r["verdict"] for r in res2.verdicts.collect()} == {"PASS"}


def test_key_cardinality_check(spark):
    from anomaly_detector_spark.checks.base import CheckSpec
    from anomaly_detector_spark.checks.fd import (
        key_cardinality_violations,
        run_key_cardinality,
    )

    # key k1: 1 row (under), k2: 2 rows straddling BOTH partitions
    # (global sum -> in band), k3: 3 rows in one partition (over),
    # NULL key: 2 rows (in band; NULLs group together)
    rows = [
        ("k1", "py"),
        ("k2", "py"), ("k2", "go"),
        ("k3", "go"), ("k3", "go"), ("k3", "go"),
        (None, "py"), (None, "py"),
    ]
    df = spark.createDataFrame(rows, "okey string, lang string")
    viol = key_cardinality_violations(df, ["okey"], min_count=2, max_count=2)
    assert {(r["okey"], r["n_rows"]) for r in viol.collect()} == {("k1", 1), ("k3", 3)}

    spec = CheckSpec(
        "card", run_key_cardinality, {"key": ["okey"], "min_count": 2, "max_count": 2},
        "lang", 1,
    )
    res = run_key_cardinality(df, spec)
    per = {r["lang"]: r for r in res.metrics.collect()}
    # py holds k1's 1 bad row; go holds k3's 3; k2 and NULL are clean
    assert (per["py"]["n_rows"], per["py"]["n_card_bad_rows"]) == (4, 1)
    assert (per["go"]["n_rows"], per["go"]["n_card_bad_rows"]) == (4, 3)
    v = {r["partition_key"]: r["verdict"] for r in res.verdicts.collect()}
    assert v == {"py": "FAIL", "go": "FAIL"}

    # tolerance: py's 25% bad passes at max_violating_frac=0.3, go's 75% not
    spec2 = CheckSpec(
        "card", run_key_cardinality,
        {"key": ["okey"], "min_count": 2, "max_count": 2, "max_violating_frac": 0.3},
        "lang", 1,
    )
    v2 = {r["partition_key"]: r["verdict"] for r in run_key_cardinality(df, spec2).verdicts.collect()}
    assert v2 == {"py": "PASS", "go": "FAIL"}

    # JSON-declarable; uniqueness special case max_count=1
    from anomaly_detector_spark.plans.config import suite_from_config

    uniq = suite_from_config(
        {
            "partition_col": "lang",
            "min_rows": 1,
            "checks": [{"check": "key_cardinality", "key": ["okey"], "max_count": 1}],
        }
    )[0]
    got = {r["partition_key"]: r["verdict"] for r in uniq.run(df).verdicts.collect()}
    assert got == {"py": "FAIL", "go": "FAIL"}  # k2/k3/NULL all multi-row


def test_commit_bloat(spark):
    from anomaly_detector_spark.checks.base import CheckSpec
    from anomaly_detector_spark.checks.uniqueness import run_commit_bloat

    rows = [
        # same (repo, path) + same content across 3 commits: 2 bloat rows
        ("r1", "src/a.py", "c1", "python", "unchanged body"),
        ("r1", "src/a.py", "c2", "python", "unchanged body"),
        ("r1", "src/a.py", "c3", "python", "unchanged body"),
        # same path, content CHANGED: legitimate history
        ("r1", "src/b.py", "c1", "python", "v1"),
        ("r1", "src/b.py", "c2", "python", "v2"),
        # same content different path: not bloat (vendoring's concern)
        ("r1", "src/c.py", "c1", "go", "shared"),
        ("r1", "src/d.py", "c1", "go", "shared"),
        # NULL content excluded
        ("r1", "src/e.py", "c1", "go", None),
    ]
    df = mkfiles(spark, rows)
    spec = CheckSpec("commit_bloat", run_commit_bloat, {}, "lang", 1)
    res = run_commit_bloat(df, spec)
    v = sorted((r["path"], r["commit"]) for r in res.violations.collect())
    assert v == [("src/a.py", "c2"), ("src/a.py", "c3")]  # c1 survives (min commit)
    verd = {r["partition_key"]: r["verdict"] for r in res.verdicts.collect()}
    assert verd == {"python": "FAIL", "go": "PASS"}


def test_media_dups_check_verdicts_and_metrics(spark):
    # The multimodal family as a first-class suite member: image rows
    # carry 5 byte-identical pairs (10/30 rows dupped -> FAIL at
    # max_dup_frac=0.1), audio is clean (PASS; its NULL-payload row is
    # excluded from totals), video is under min_rows (SKIPPED).
    from anomaly_detector_spark.checks.base import CheckSpec
    from anomaly_detector_spark.checks.media import run_media_dups

    rows = []
    for i in range(30):  # first 10 rows = 5 identical pairs
        seed = f"img{i // 2}" if i < 10 else f"imgu{i}"
        rows.append((i, "image", seed))
    rows += [(100 + i, "audio", f"aud{i}") for i in range(30)]
    rows += [(200 + i, "video", f"vid{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "media_id long, kind string, seed string").select(
        "media_id",
        "kind",
        F.sha2(F.col("seed"), 256).cast("binary").alias("payload"),
    )
    null_row = spark.createDataFrame(
        [(999, "audio")], "media_id long, kind string"
    ).select("media_id", "kind", F.lit(None).cast("binary").alias("payload"))
    df = df.unionByName(null_row)

    spec = CheckSpec("media_dups", run_media_dups, {"max_dup_frac": 0.1}, "kind", 25)
    res = spec.run(df)
    v = {r["partition_key"]: r["verdict"] for r in res.verdicts.collect()}
    assert v == {"image": "FAIL", "audio": "PASS", "video": "SKIPPED"}
    m = {r["kind"]: (r["n_rows"], r["n_dup"]) for r in res.metrics.collect()}
    assert m["image"] == (30, 10)
    assert m["audio"] == (30, 0)  # NULL payload excluded from totals
    assert m["video"][0] == 10


def test_media_dups_empty_input(spark):
    # verify-probe parity: an empty media table yields zero verdict rows
    # and no crash (the pair join and both aggregates tolerate emptiness)
    from anomaly_detector_spark.checks.base import CheckSpec
    from anomaly_detector_spark.checks.media import run_media_dups
    from anomaly_detector_spark.operators.multimodal import phash_near_dups, synth_media

    empty = synth_media(spark, 10).filter("1 = 0")
    res = CheckSpec("media_dups", run_media_dups, {}, "kind", 25).run(empty)
    assert res.verdicts.count() == 0 and res.metrics.count() == 0
    assert phash_near_dups(empty).count() == 0


def test_media_overlap_checks_end_to_end(spark):
    # frame_overlap + audio_overlap as declarable suite members: the
    # planted media tables FAIL (copies exceed 5%), a clean slice
    # PASSes, and both ride the JSON-config registry
    from anomaly_detector_spark.checks.base import CheckSpec
    from anomaly_detector_spark.checks.media import run_audio_overlap, run_frame_overlap
    from anomaly_detector_spark.operators.multimodal import (
        synth_media_audio,
        synth_media_video,
    )
    from anomaly_detector_spark.plans.config import suite_from_config

    video = synth_media_video(spark, 100, n_frames=4, plant_every=25)
    spec_v = CheckSpec("frame_overlap", run_frame_overlap, {"max_dup_frac": 0.05}, "kind", 25)
    res_v = spec_v.run(video)
    v = {r["partition_key"]: r for r in res_v.verdicts.collect()}
    assert v["gif"]["verdict"] == "FAIL"  # 8 of 100 clips in pairs

    audio = synth_media_audio(spark, 100, plant_every=25)
    spec_a = CheckSpec("audio_overlap", run_audio_overlap, {"max_dup_frac": 0.05}, "kind", 25)
    res_a = spec_a.run(audio)
    a = {r["partition_key"]: r for r in res_a.verdicts.collect()}
    assert a["wav"]["verdict"] == "FAIL"

    clean = synth_media_video(spark, 60, n_frames=4)
    assert spec_v.run(clean).verdicts.collect()[0]["verdict"] == "PASS"

    # declarable from a JSON document like every other family
    specs = suite_from_config(
        {
            "partition_col": "kind",
            "min_rows": 25,
            "checks": [
                {"check": "frame_overlap", "max_dup_frac": 0.05},
                {"check": "audio_overlap", "max_dup_frac": 0.05},
            ],
        }
    )
    assert [s.fn for s in specs] == [run_frame_overlap, run_audio_overlap]


def test_media_dups_check_on_mixed_modality_table(spark):
    # one media table holding images AND audio: dhash64 dispatches per
    # payload (pixels vs waveform), pairs stay within modality, and the
    # per-kind verdicts gate independently
    from anomaly_detector_spark.checks.base import CheckSpec
    from anomaly_detector_spark.checks.media import run_media_dups
    from anomaly_detector_spark.operators.multimodal import (
        synth_media_audio,
        synth_media_images,
    )
    from pyspark.sql import functions as F

    images = synth_media_images(spark, 100, plant_every=25)
    audio = synth_media_audio(spark, 100, plant_every=25).withColumn(
        "media_id", F.col("media_id") + 1000  # disjoint id space
    )
    mixed = images.unionByName(audio).withColumn(
        "kind", F.when(F.col("kind") == "wav", F.lit("wav")).otherwise(F.lit("image"))
    )
    spec = CheckSpec("media_dups", run_media_dups, {"max_dup_frac": 0.01}, "kind", 25)
    res = spec.run(mixed)
    v = {r["partition_key"]: r["verdict"] for r in res.verdicts.collect()}
    assert v == {"image": "FAIL", "wav": "FAIL"}  # 8% planted in each
    m = {r["kind"]: r for r in res.metrics.collect()}
    # exactly the planted participants per modality (4 pairs -> 8 ids)
    assert m["image"]["n_dup"] == 8 and m["wav"]["n_dup"] == 8
