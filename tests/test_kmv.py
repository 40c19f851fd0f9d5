"""KMV bottom-k sketches: estimator accuracy, exact degradation, merge
algebra, cross-run set stats, parameter safety (checks/kmv.py)."""

import pytest
from pyspark.sql import functions as F

from anomaly_detector_spark.checks.kmv import (
    kmv_estimate,
    kmv_merge,
    kmv_set_stats,
    kmv_sketch,
)


def _keys(spark, lo, hi, pk="p0"):
    return spark.range(lo, hi).select(
        F.lit(pk).alias("grp"), F.concat(F.lit("key-"), F.col("id")).alias("k1")
    )


def test_estimator_within_tolerance(spark):
    # 20k distinct keys, k=256: CV ~ 1/sqrt(254) ~ 6.3%; assert 4 sigma
    df = _keys(spark, 0, 20_000)
    sk = kmv_sketch(df, ["k1"], "grp", k=256)
    est = kmv_estimate(sk).collect()[0]
    assert est["exact"] is False and est["n_kept"] == 256
    assert abs(est["est_distinct"] - 20_000) / 20_000 < 0.25
    # duplicates do not move the estimate: the sketch sees the SET
    dup = df.unionByName(df).unionByName(df)
    est2 = kmv_estimate(kmv_sketch(dup, ["k1"], "grp", k=256)).collect()[0]
    assert est2["est_distinct"] == est["est_distinct"]


def test_exact_mode_below_k(spark):
    sk = kmv_sketch(_keys(spark, 0, 100), ["k1"], "grp", k=256)
    est = kmv_estimate(sk).collect()[0]
    assert est["exact"] is True
    assert est["n_kept"] == 100 and est["est_distinct"] == 100.0


def test_partitioning_invariance_and_merge_equals_rebuild(spark):
    a, b = _keys(spark, 0, 5_000), _keys(spark, 3_000, 9_000)
    k = 128
    direct = kmv_sketch(a.unionByName(b), ["k1"], "grp", k=k)
    merged = kmv_merge(
        kmv_sketch(a, ["k1"], "grp", k=k), kmv_sketch(b.repartition(17), ["k1"], "grp", k=k)
    )
    assert sorted(r["u"] for r in direct.collect()) == sorted(
        r["u"] for r in merged.collect()
    )
    # idempotent: re-merging a sketch with itself is a no-op
    again = kmv_merge(merged, merged)
    assert sorted(r["u"] for r in again.collect()) == sorted(
        r["u"] for r in merged.collect()
    )


def test_set_stats_planted_overlap(spark):
    # A = [0, 6000), B = [3000, 9000): |A|=|B|=6000, inter=3000,
    # union=9000, jaccard=1/3, novelty |B\A|=3000
    a = kmv_sketch(_keys(spark, 0, 6_000), ["k1"], "grp", k=256)
    b = kmv_sketch(_keys(spark, 3_000, 9_000), ["k1"], "grp", k=256)
    st = kmv_set_stats(a, b).collect()[0]
    assert st["exact"] is False
    assert abs(st["est_union"] - 9_000) / 9_000 < 0.25
    assert abs(st["est_inter"] - 3_000) / 3_000 < 0.40
    assert abs(st["jaccard"] - 1 / 3) < 0.12
    assert abs(st["est_new_b"] - 3_000) / 3_000 < 0.40
    # exact small case: every number is exact set arithmetic
    ae = kmv_sketch(_keys(spark, 0, 60), ["k1"], "grp", k=256)
    be = kmv_sketch(_keys(spark, 30, 90), ["k1"], "grp", k=256)
    se = kmv_set_stats(ae, be).collect()[0]
    assert se["exact"] is True
    assert (se["est_union"], se["est_inter"], se["est_new_b"]) == (90.0, 30.0, 30.0)
    assert se["jaccard"] == round(30 / 90, 6)


def test_disjoint_partitions_and_one_sided(spark):
    a = kmv_sketch(_keys(spark, 0, 50, pk="only_a"), ["k1"], "grp", k=64)
    b = kmv_sketch(_keys(spark, 0, 50, pk="only_b"), ["k1"], "grp", k=64)
    st = {r["partition_key"]: r for r in kmv_set_stats(a, b).collect()}
    assert st["only_a"]["est_inter"] == 0.0 and st["only_a"]["est_new_b"] == 0.0
    assert st["only_b"]["est_new_b"] == 50.0 and st["only_b"]["jaccard"] == 0.0


def test_mixed_parameters_rejected(spark):
    df = _keys(spark, 0, 100)
    with pytest.raises(ValueError, match="mixed KMV parameters"):
        kmv_merge(kmv_sketch(df, ["k1"], "grp", k=64), kmv_sketch(df, ["k1"], "grp", k=128))
    with pytest.raises(ValueError, match="mixed KMV parameters"):
        kmv_set_stats(
            kmv_sketch(df, ["k1"], "grp", k=64),
            kmv_sketch(df, ["k1"], "grp", k=64, hash_fn="sha256"),
        )


def test_prefilter_pushdown_sound(spark):
    # a generous threshold from a prior sketch keeps the rebuild exact:
    # same retained rows as the unfiltered build
    df = _keys(spark, 0, 10_000)
    prior = kmv_sketch(df, ["k1"], "grp", k=128)
    umax = prior.agg(F.max("u")).first()[0]
    grown = df.unionByName(_keys(spark, 10_000, 12_000))
    full = kmv_sketch(grown, ["k1"], "grp", k=128)
    fast = kmv_sketch(grown, ["k1"], "grp", k=128, prefilter_max_u=2.0 * umax)
    assert sorted(r["u"] for r in full.collect()) == sorted(r["u"] for r in fast.collect())


def _files(spark, lo, hi, lang="py"):
    return spark.range(lo, hi).select(
        F.lit(lang).alias("lang"),
        F.concat(F.lit("r"), (F.col("id") % 7).cast("string")).alias("repo"),
        F.concat(F.lit("p"), F.col("id").cast("string")).alias("path"),
        F.concat(F.lit("c"), F.col("id").cast("string")).alias("commit"),
        F.concat(F.lit("body "), F.col("id").cast("string")).alias("content"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"),
    )


def test_manifest_store_and_novelty_stats(spark, tmp_path):
    # two committed runs; run 2 re-sends 40 of run 1's 100 keys plus 60
    # fresh ones. Exact mode (both sides < k): novelty_stats must report
    # EXACT set arithmetic from the store alone.
    from anomaly_detector_spark.plans.manifest import novelty_stats, run_with_manifest

    kmv_dir, mdir = str(tmp_path / "kmv"), str(tmp_path / "m")
    run_with_manifest(
        _files(spark, 0, 100), mdir, kmv_sketches_dir=kmv_dir, run_id="r1"
    )
    r2 = _files(spark, 60, 160)  # 40 replayed (60..99), 60 new (100..159)
    run_with_manifest(r2, mdir, kmv_sketches_dir=kmv_dir, run_id="r2", revalidate=True)

    st = novelty_stats(spark, kmv_dir).collect()
    assert len(st) == 1 and st[0]["run_id"] == "r2"
    row = st[0]
    assert row["exact"] is True
    assert (row["est_a"], row["est_b"]) == (100.0, 100.0)
    assert (row["est_union"], row["est_inter"], row["est_new_b"]) == (160.0, 40.0, 60.0)

    # single-run store: novelty undefined
    solo = str(tmp_path / "kmv1")
    run_with_manifest(_files(spark, 0, 50), str(tmp_path / "m1"), kmv_sketches_dir=solo)
    with pytest.raises(ValueError, match="single run"):
        novelty_stats(spark, solo)


def test_run_novelty_check_json_declarable(spark, tmp_path):
    # history = keys 0..199 in py, 0..99 in go. New input: py is a PURE
    # REPLAY (FAIL at the default min_new_frac=0), go is half fresh
    # (PASS), rs has no history sketch (SKIPPED warm-up).
    from anomaly_detector_spark.plans.config import suite_from_config
    from anomaly_detector_spark.plans.manifest import run_with_manifest

    kmv_dir = str(tmp_path / "kmv")
    hist = _files(spark, 0, 200, lang="py").unionByName(_files(spark, 0, 100, lang="go"))
    run_with_manifest(hist, str(tmp_path / "m"), kmv_sketches_dir=kmv_dir)

    new = (
        _files(spark, 50, 150, lang="py")  # all seen
        .unionByName(_files(spark, 50, 150, lang="go"))  # 50 seen, 50 new
        .unionByName(_files(spark, 0, 40, lang="rs"))  # no history
    )
    suite = suite_from_config(
        {
            "partition_col": "lang",
            "min_rows": 1,
            "checks": [{"check": "novelty", "store": kmv_dir}],
        }
    )
    res = suite[0].run(new)
    got = {r["partition_key"]: r for r in res.verdicts.collect()}
    assert got["py"]["verdict"] == "FAIL" and got["py"]["metrics"]["new_frac"] == 0.0
    assert got["go"]["verdict"] == "PASS" and got["go"]["metrics"]["est_new"] == 50.0
    assert got["rs"]["verdict"] == "SKIPPED" and got["rs"]["metrics"]["n_hist"] == 0.0
    assert res.violations.count() == 0  # set-level check: no row identity

    # max_new_frac band: go's 50% novelty now ALSO fails (key-space churn)
    suite2 = suite_from_config(
        {
            "partition_col": "lang",
            "min_rows": 1,
            "checks": [{"check": "novelty", "store": kmv_dir, "max_new_frac": 0.2}],
        }
    )
    got2 = {r["partition_key"]: r["verdict"] for r in suite2[0].run(new).verdicts.collect()}
    assert got2["go"] == "FAIL" and got2["py"] == "FAIL" and got2["rs"] == "SKIPPED"
    # the two configs are DIFFERENT checks: the band rides the id
    assert suite[0].id != suite2[0].id


def test_sha_mode_matches_xxhash_estimates_roughly(spark):
    # both modes are uniform draws over the same key set: estimates agree
    # within the estimator's own error band
    df = _keys(spark, 0, 8_000)
    ex = kmv_estimate(kmv_sketch(df, ["k1"], "grp", k=256)).collect()[0]["est_distinct"]
    es = kmv_estimate(kmv_sketch(df, ["k1"], "grp", k=256, hash_fn="sha256")).collect()[0][
        "est_distinct"
    ]
    assert abs(ex - es) / 8_000 < 0.4
