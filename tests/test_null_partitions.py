"""NULL partition keys are legitimate groups — regression tests for the
null_safe_join sweep.

Every aggregate in the engine folds NULL partition values into one group
(SQL GROUP BY semantics), so every join back on the group key must treat
NULL as equal to NULL or the NULL partition silently degenerates: bloom
probes false-negative, KMV algebra reads empty history, drift scores
all-zero mass, slot coverage reports everything missing, top-k bounds
go unsound, violation sampling drops rows, scorecard streaks invert.
This is the count_drift bug class from the round-2 advice
(checks/base.py null_safe_join), pinned here for every site that had it.
"""

import pyspark.sql.functions as F
import pytest

from anomaly_detector_spark.checks.base import CheckSpec, null_safe_join


@pytest.fixture()
def null_part_files(spark):
    # lang is the partition column; half the rows sit in the NULL partition
    rows = [
        ("r1", "a.py", "c1", "py", "alpha beta"),
        ("r1", "b.py", "c2", None, "gamma delta"),
        ("r2", "c.py", "c3", None, "epsilon zeta"),
        ("r2", "d.py", "c4", "py", "eta theta"),
    ]
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )


def test_null_safe_join_shapes(spark):
    l = spark.createDataFrame([(None, 1), ("a", 2)], "k string, x int")
    r = spark.createDataFrame([(None, 10), ("b", 20)], "k string, y int")
    inner = null_safe_join(l, r, ["k"]).collect()
    assert [(row["k"], row["x"], row["y"]) for row in inner] == [(None, 1, 10)]
    left = {row["k"]: row["y"] for row in null_safe_join(l, r, ["k"], "left").collect()}
    assert left == {None: 10, "a": None}
    outer = {row["k"]: (row["x"], row["y"])
             for row in null_safe_join(l, r, ["k"], "full_outer").collect()}
    assert outer == {None: (1, 10), "a": (2, None), "b": (None, 20)}
    semi = [row["k"] for row in null_safe_join(l, r, ["k"], "left_semi").collect()]
    assert semi == [None]
    anti = [row["k"] for row in null_safe_join(l, r, ["k"], "left_anti").collect()]
    assert anti == ["a"]


def test_bloom_probe_null_partition_no_false_negative(spark, null_part_files):
    from anomaly_detector_spark.checks.membership import bloom_probe, bloom_words

    df = null_part_files
    words = bloom_words(df, "lang", ["repo", "path", "commit"], n_bits=1 << 12, k=3)
    probed = bloom_probe(df, words, "lang", ["repo", "path", "commit"],
                         n_bits=1 << 12, k=3)
    # every key was just inserted: maybe_seen=False anywhere is a false
    # negative, which the bloom contract forbids
    assert all(r["maybe_seen"] for r in probed.collect())


def test_kmv_set_stats_null_partition_identity(spark, null_part_files):
    from anomaly_detector_spark.checks.kmv import kmv_set_stats, kmv_sketch

    df = null_part_files
    ska = kmv_sketch(df, ["repo", "path", "commit"], "lang", k=16)
    skb = kmv_sketch(df, ["repo", "path", "commit"], "lang", k=16)
    st = {r["partition_key"]: r for r in kmv_set_stats(ska, skb).collect()}
    assert set(st) == {None, "py"}
    for pk, r in st.items():
        assert r["jaccard"] == 1.0 and r["n_a"] == 2 and r["est_new_b"] == 0.0, (pk, r)


def test_kmv_novelty_null_partition_replay_fails(spark, null_part_files, tmp_path):
    from anomaly_detector_spark.checks.kmv import kmv_sketch, run_novelty

    df = null_part_files
    store = str(tmp_path / "kmv")
    kmv_sketch(df, ["repo", "path", "commit"], "lang", k=16).withColumn(
        "run_id", F.lit("r1")
    ).write.parquet(store)
    spec = CheckSpec("novelty", run_novelty, {"store": store, "min_new_frac": 0.0},
                     "lang", 1)
    # replaying the exact same input: zero novelty -> FAIL for EVERY
    # partition including the NULL one (which previously read as
    # "no history" and skipped)
    res = run_novelty(df, spec)
    v = {r["partition_key"]: r["verdict"] for r in res.verdicts.collect()}
    assert v == {None: "FAIL", "py": "FAIL"}


def test_drift_scores_null_partition_matches_sentinel(spark):
    from anomaly_detector_spark.checks.drift import drift_scores, length_histogram

    rows = [("x" * (10 * i % 50 + 1), None if i % 2 else "py") for i in range(40)]
    df = spark.createDataFrame(rows, "content string, lang string")
    hist = length_histogram(df, "lang", "content", bucket_width=10).cache()
    base = hist.groupBy("bucket").agg(F.sum("n").alias("base_n"))
    got = {r["partition_key"]: r["psi"] for r in drift_scores(hist, base).collect()}

    sent = df.withColumn("lang", F.coalesce("lang", F.lit("__S__")))
    hist_s = length_histogram(sent, "lang", "content", bucket_width=10).cache()
    base_s = hist_s.groupBy("bucket").agg(F.sum("n").alias("base_n"))
    want = {r["partition_key"]: r["psi"]
            for r in drift_scores(hist_s, base_s).collect()}
    assert got[None] == pytest.approx(want["__S__"], abs=1e-12)
    assert got["py"] == pytest.approx(want["py"], abs=1e-12)


def test_drift_attribution_null_partition_matches_sentinel(spark):
    from anomaly_detector_spark.checks.drift import drift_attribution, length_histogram

    rows = [("x" * (7 * i % 40 + 1), None if i % 3 else "py") for i in range(30)]
    df = spark.createDataFrame(rows, "content string, lang string")
    hist = length_histogram(df, "lang", "content", bucket_width=10).cache()
    base = hist.groupBy("bucket").agg(F.sum("n").alias("base_n")).cache()
    got = {(r["partition_key"], r["rank"]): (r["bucket"], round(r["psi_term"], 10))
           for r in drift_attribution(hist, base, top_k=2).collect()}

    sent = df.withColumn("lang", F.coalesce("lang", F.lit("__S__")))
    hist_s = length_histogram(sent, "lang", "content", bucket_width=10).cache()
    base_s = hist_s.groupBy("bucket").agg(F.sum("n").alias("base_n")).cache()
    want = {(r["partition_key"], r["rank"]): (r["bucket"], round(r["psi_term"], 10))
            for r in drift_attribution(hist_s, base_s, top_k=2).collect()}
    for rank in (1, 2):
        assert got[(None, rank)] == want[("__S__", rank)]


def test_missing_slots_null_partition(spark):
    from anomaly_detector_spark.checks.freshness import missing_slots

    rows = [(None, f"2026-01-01 00:0{m}:00") for m in (0, 1, 3)]
    df = spark.createDataFrame(rows, "lang string, ts string")
    got = missing_slots(df, "lang", "ts", granularity="minute").collect()
    # exactly the one real gap (minute 2) — NOT every slot
    assert len(got) == 1 and got[0]["partition_key"] is None
    assert got[0]["slot"].minute == 2


def test_topk_sketch_null_partition_bound_and_union(spark, null_part_files):
    from anomaly_detector_spark.checks.profile import topk_sketches, topk_union

    sk = topk_sketches(null_part_files, "lang", "path", k=1, run_id="r")
    bounds = {r["partition_key"]: r["bound"] for r in sk.collect()}
    # NULL partition has 2 distinct items at k=1 -> bound = count@rank2 = 1
    assert bounds[None] == 1 and bounds["py"] == 1
    u = {r["partition_key"]: (r["est"], r["upper"])
         for r in topk_union(sk, k=1).collect()}
    assert u[None] == (1, 1) and u["py"] == (1, 1)


def test_sample_violations_keeps_null_partition(spark):
    from anomaly_detector_spark.plans.manifest import sample_violations

    viol = spark.createDataFrame(
        [("r1", f"p{i}", "c1", None, "chk", "dup", "unique") for i in range(6)]
        + [("r1", f"q{i}", "c1", "py", "chk", "dup", "unique") for i in range(6)],
        "repo string, path string, commit string, partition_key string, "
        "check_id string, observed string, expected string",
    )
    counts = spark.createDataFrame(
        [(None, "chk", 6), ("py", "chk", 6)],
        "partition_key string, check_id string, n_violations long",
    )
    kept = sample_violations(viol, counts, per_group=100)
    by_pk = {r["partition_key"]: r["cnt"]
             for r in kept.groupBy("partition_key").agg(F.count("*").alias("cnt")).collect()}
    # per_group >= group size: every row survives, including NULL partition
    assert by_pk == {None: 6, "py": 6}


def test_scorecard_and_incidents_null_partition(spark):
    from anomaly_detector_spark.plans.manifest import incidents, scorecard

    # NULL partition: FAIL then PASS (latest) -> no current streak;
    # "py": PASS then FAIL (latest) -> streak of 1
    rows = [
        ("r1", "s", None, "chk", "FAIL", "2026-01-01 00:00:00"),
        ("r2", "s", None, "chk", "PASS", "2026-01-02 00:00:00"),
        ("r1", "s", "py", "chk", "PASS", "2026-01-01 00:00:00"),
        ("r2", "s", "py", "chk", "FAIL", "2026-01-02 00:00:00"),
    ]
    m = spark.createDataFrame(
        rows,
        "run_id string, suite_id string, partition_key string, check_id string, "
        "verdict string, committed_at string",
    ).withColumn("committed_at", F.col("committed_at").cast("timestamp"))
    sc = scorecard(m).collect()[0]
    # the NULL partition PASSes now: it must NOT count as failing-now
    assert sc["n_failing_now"] == 1 and sc["max_streak"] == 1
    assert sc["worst_partition"] == "py"
    inc = incidents(m).collect()
    assert [r["partition_key"] for r in inc] == ["py"]

    # flip: NULL partition currently failing must appear in incidents
    m2 = m.withColumn(
        "verdict",
        F.when(F.col("partition_key").isNull() & (F.col("run_id") == "r2"),
               F.lit("FAIL")).otherwise(F.col("verdict")),
    )
    inc2 = {r["partition_key"] for r in incidents(m2).collect()}
    assert None in inc2


def test_global_topk_null_partition_survives(spark, tmp_path):
    from anomaly_detector_spark.plans.manifest import global_topk

    d = str(tmp_path / "topk")
    spark.createDataFrame(
        [("r1", "s", None, "needle", 100, 0), ("r1", "s", "py", "hay", 1, 0)],
        "run_id string, suite_id string, partition_key string, item string, "
        "n long, bound long",
    ).write.parquet(d)
    items = {r["item"]: r["est"] for r in global_topk(spark, d, k=5).collect()}
    # the NULL partition's heavy hitter must survive the latest-run dedupe
    assert items.get("needle") == 100


def test_fused_uniqueness_null_key_matches_window_path(spark):
    from anomaly_detector_spark.checks.uniqueness import run_uniqueness
    from anomaly_detector_spark.plans.fused import fused_uniqueness

    # duplicate key with a NULL commit component: GROUP BY (and the
    # window path) treat NULLs as equal, so these are 3 copies of one key
    rows = [
        ("r1", "a.py", None, "py", "x"),
        ("r1", "a.py", None, "go", "x"),
        ("r1", "a.py", None, "py", "x"),
        ("r2", "b.py", "c9", "py", "y"),
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    spec = CheckSpec("uniqueness", run_uniqueness, {}, "lang", 1)
    win = run_uniqueness(df, spec)
    fus = fused_uniqueness(df, spec)
    wv = sorted((r["partition_key"], r["verdict"]) for r in win.verdicts.collect())
    fv = sorted((r["partition_key"], r["verdict"]) for r in fus.verdicts.collect())
    assert wv == fv and ("py", "FAIL") in fv
    assert win.violations.count() == fus.violations.count() == 2


def test_metric_history_null_partition_flagged(spark):
    from anomaly_detector_spark.checks.history import flag_metric_anomalies

    # NULL-partition series: flat history then a spike in the latest run
    rows = [(f"r{i}", f"2026-01-0{i} 00:00:00", None, "chk", "n_rows",
             100.0 if i < 5 else 1e6) for i in range(1, 6)]
    hist = spark.createDataFrame(
        rows,
        "run_id string, committed_at string, partition_key string, "
        "check_id string, metric string, value double",
    ).withColumn("committed_at", F.col("committed_at").cast("timestamp"))
    out = flag_metric_anomalies(hist).collect()
    assert len(out) == 1 and out[0]["partition_key"] is None
    assert out[0]["n_history"] == 4 and out[0]["is_anomalous"] is True


def test_run_with_manifest_null_partition_accounting(spark, tmp_path):
    from anomaly_detector_spark.plans.manifest import read_manifest, run_with_manifest
    from anomaly_detector_spark.plans.suite import default_suite
    from anomaly_detector_spark.synth import synth_files

    df = synth_files(spark, 300, seed=7).withColumn(
        "lang", F.when(F.xxhash64("path") % 3 == 0, F.lit(None)).otherwise(F.col("lang"))
    )
    n_null = df.filter(F.col("lang").isNull()).count()
    assert n_null > 0
    md = str(tmp_path / "manifest")
    run_with_manifest(df, md, default_suite(min_rows=1), partition_col="lang")
    m = read_manifest(spark, md).filter(F.col("partition_key").isNull())
    rows_seen = {r["n_rows"] for r in m.collect()}
    assert m.count() > 0 and rows_seen == {n_null}


def test_embedding_drift_null_partition_matches_sentinel(spark):
    from anomaly_detector_spark.operators.similarity import embedding_drift

    import random

    rng = random.Random(11)
    rows = [([rng.uniform(-1, 1) for _ in range(8)], None if i % 2 else "py")
            for i in range(30)]
    df = spark.createDataFrame(rows, "embedding array<double>, lang string")
    got = {r["partition_key"]: (r["psi"], r["n_obs"])
           for r in embedding_drift(df, "lang", dim=8, n_planes=2).collect()}
    sent = df.withColumn("lang", F.coalesce("lang", F.lit("__S__")))
    want = {r["partition_key"]: (r["psi"], r["n_obs"])
            for r in embedding_drift(sent, "lang", dim=8, n_planes=2).collect()}
    assert set(got) == {None, "py"}
    assert got[None] == want["__S__"] and got["py"] == want["py"]


def test_seen_before_null_partition_and_null_key(spark, null_part_files, tmp_path):
    from anomaly_detector_spark.checks.membership import bloom_words, run_seen_before

    # history: the fixture's 4 keys (two in the NULL partition) plus a
    # NULL-commit key in the NULL partition — both NULL axes at once
    hist = null_part_files.unionByName(
        spark.createDataFrame(
            [("r3", "e.py", None, None, "iota kappa")],
            "repo string, path string, commit string, lang string, content string",
        )
    )
    hist_path, store = str(tmp_path / "hist"), str(tmp_path / "mb")
    hist.write.parquet(hist_path)
    (
        bloom_words(hist, "lang", ["repo", "path", "commit"], n_bits=1 << 12, k=3)
        .select(
            "partition_key", "word_idx", "bits",
            F.lit(1 << 12).alias("n_bits"), F.lit(3).alias("k"),
            F.lit("xxhash64").alias("mode"),
        )
        .write.parquet(store)
    )

    # new input re-sends BOTH NULL-partition committed keys (one of them
    # the NULL-commit key) plus a fresh key in each partition
    new = spark.createDataFrame(
        [
            ("r1", "b.py", "c2", None, "gamma delta"),   # committed, NULL part
            ("r3", "e.py", None, None, "iota kappa"),    # committed, NULL key+part
            ("r9", "new.py", "c9", None, "fresh"),       # fresh, NULL part
            ("r1", "a.py", "c1", "py", "alpha beta"),    # committed, py
            ("r9", "neu.py", "c8", "py", "fresh"),       # fresh, py
        ],
        "repo string, path string, commit string, lang string, content string",
    )
    spec = CheckSpec(
        "seen_before", run_seen_before,
        {"store": store, "history": hist_path}, "lang", 1,
    )
    res = run_seen_before(new, spec)
    got = {r["partition_key"]: (r["verdict"], r["metrics"]["n_dup"])
           for r in res.verdicts.collect()}
    # NULL partition: 2 exactly-verified dups (incl. the NULL-keyed one);
    # pre-fix it read n_dup=0 (accounting join dropped the NULL partition,
    # and the history semi-join acquitted the NULL-keyed candidate)
    assert got[None] == ("FAIL", 2.0)
    assert got["py"] == ("FAIL", 1.0)
    # the NULL-keyed duplicate appears as a real violation row
    v = res.violations.filter(F.col("commit").isNull()).collect()
    assert len(v) == 1 and v[0]["partition_key"] is None


def test_sweep_depth_null_group_matches_sentinel(spark):
    from anomaly_detector_spark.operators.layout import sweep_depth

    rows = [(None, 0.0, 10.0), (None, 5.0, 15.0), ("a", 0.0, 1.0)]
    df = spark.createDataFrame(rows, "dim string, lo double, hi double")
    got = {r["dim"]: (r["n_intervals"], r["max_depth"])
           for r in sweep_depth(df, group_cols=["dim"], chunks=4).collect()}
    sent = df.withColumn("dim", F.coalesce("dim", F.lit("__S__")))
    want = {r["dim"]: (r["n_intervals"], r["max_depth"])
            for r in sweep_depth(sent, group_cols=["dim"], chunks=4).collect()}
    assert got[None] == want["__S__"] == (2, 2)
    assert got["a"] == want["a"] == (1, 1)
