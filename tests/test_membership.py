"""Bloom membership sketches (checks/membership.py)."""

import pytest
from pyspark.sql import functions as F

from anomaly_detector_spark.checks.membership import (
    bloom_merge,
    bloom_probe,
    bloom_stats,
    bloom_words,
    suggest_n_bits,
)

KEYS = ["repo", "path", "commit"]


def _files(spark, lo, hi, lang="py"):
    return spark.range(lo, hi).select(
        F.lit(lang).alias("lang"),
        F.concat(F.lit("r"), (F.col("id") % 7).cast("string")).alias("repo"),
        F.concat(F.lit("p"), F.col("id").cast("string")).alias("path"),
        F.concat(F.lit("c"), F.col("id").cast("string")).alias("commit"),
    )


@pytest.mark.parametrize("mode", ["xxhash64", "sha"])
def test_no_false_negatives_and_bounded_fps(spark, mode):
    hist = _files(spark, 0, 400)
    words = bloom_words(hist, "lang", KEYS, n_bits=1 << 14, k=5, mode=mode)

    seen = bloom_probe(hist, words, "lang", KEYS, n_bits=1 << 14, k=5, mode=mode)
    assert seen.count() == 400
    assert seen.filter(~F.col("maybe_seen")).count() == 0  # no false negatives

    fresh = _files(spark, 1000, 1400)
    probed = bloom_probe(fresh, words, "lang", KEYS, n_bits=1 << 14, k=5, mode=mode)
    fp = probed.filter(F.col("maybe_seen")).count()
    # 400 keys * 5 bits in 16384 -> fill ~0.11, fpp ~1.9e-5; allow slack
    assert fp <= 4


def test_merge_idempotent_and_two_run_equals_one(spark):
    a = _files(spark, 0, 200)
    b = _files(spark, 200, 350)
    wa = bloom_words(a, "lang", KEYS, n_bits=4096, k=4)
    wb = bloom_words(b, "lang", KEYS, n_bits=4096, k=4)

    two_run = bloom_merge(wa.unionByName(wb).unionByName(wa))  # wa replayed
    one_run = bloom_words(a.unionByName(b), "lang", KEYS, n_bits=4096, k=4)
    assert sorted(map(tuple, two_run.collect())) == sorted(
        map(tuple, one_run.collect())
    )


def test_broadcast_and_shuffle_probe_agree(spark):
    hist = _files(spark, 0, 300)
    new = _files(spark, 250, 550)  # 50 overlap
    words = bloom_words(hist, "lang", KEYS, n_bits=1 << 14, k=5)
    kw = dict(n_bits=1 << 14, k=5)
    b = bloom_probe(new, words, "lang", KEYS, broadcast_store=True, **kw)
    s = bloom_probe(new, words, "lang", KEYS, broadcast_store=False, **kw)
    assert sorted(map(tuple, b.collect())) == sorted(map(tuple, s.collect()))
    assert b.filter(F.col("maybe_seen")).count() >= 50  # the true overlap


def test_candidates_verify_exactly(spark):
    # the product loop: probe -> candidates -> exact anti-join verify
    hist = _files(spark, 0, 300)
    new = _files(spark, 280, 320)  # 20 true dups
    words = bloom_words(hist, "lang", KEYS, n_bits=1 << 13, k=4)
    cand = bloom_probe(new, words, "lang", KEYS, n_bits=1 << 13, k=4).filter(
        "maybe_seen"
    )
    confirmed = cand.join(hist.select(*KEYS).distinct(), KEYS, "left_semi")
    assert confirmed.count() == 20  # every true dup survives; FPs drop out


def test_stats_fill_and_fpp(spark):
    words = bloom_words(_files(spark, 0, 500), "lang", KEYS, n_bits=1 << 14, k=5)
    row = bloom_stats(words, n_bits=1 << 14, k=5).collect()[0]
    assert 0 < row["fill_ratio"] < 0.25
    assert row["fpp_est"] == pytest.approx(row["fill_ratio"] ** 5, abs=1e-6)


def test_suggest_n_bits():
    n_bits, k = suggest_n_bits(1_000_000, 0.01)
    assert n_bits % 64 == 0
    assert 9_000_000 < n_bits < 10_300_000  # ~9.59 bits/key at 1% fpp
    assert k in (6, 7)


def test_run_seen_before_check_json_declarable(spark, tmp_path):
    # run 1 commits history + its bloom store; run 2's input re-sends
    # some committed keys plus fresh ones — the JSON-declared check
    # FAILs exactly the partitions holding re-sent keys, with exact
    # verification against the history path
    from anomaly_detector_spark.plans.config import suite_from_config
    from anomaly_detector_spark.plans.manifest import run_with_manifest

    hist = (
        _files(spark, 0, 300)
        .withColumn(
            "lang",
            F.when(F.col("path").substr(2, 10).cast("long") % 2 == 0, "py").otherwise("go"),
        )
        .withColumn("content", F.concat(F.lit("body of "), F.col("path")))
    )
    hist_path, mb_dir = str(tmp_path / "hist"), str(tmp_path / "mb")
    hist.write.parquet(hist_path)
    run_with_manifest(
        spark.read.parquet(hist_path),
        str(tmp_path / "manifest"),
        membership_dir=mb_dir,
        partition_col="lang",
    )

    resent = _files(spark, 100, 110).withColumn(
        "lang", F.when(F.col("path").substr(2, 10).cast("long") % 2 == 0, "py").otherwise("go")
    )
    fresh = _files(spark, 5000, 5100).withColumn("lang", F.lit("rs"))
    new = resent.unionByName(fresh)

    suite = suite_from_config(
        {
            "partition_col": "lang",
            "min_rows": 1,
            "checks": [
                {
                    "check": "seen_before",
                    "store": mb_dir,
                    "history": hist_path,
                }
            ],
        }
    )
    res = suite[0].run(new)
    got = {
        r["partition_key"]: (r["verdict"], r["metrics"]["n_dup"])
        for r in res.verdicts.collect()
    }
    assert got["rs"] == ("PASS", 0.0)
    assert got["py"][0] == "FAIL" and got["go"][0] == "FAIL"
    assert got["py"][1] + got["go"][1] == 10.0  # the 10 re-sent keys, exactly
    # violations carry the real duplicate keys
    assert res.violations.count() == 10


def test_probe_plan_shape(spark):
    # the 100x-scale pin: with broadcast_store the probed side never
    # shuffles for the join (BroadcastHashJoin), and the only exchange
    # on the probe path is the final per-key aggregate
    hist = _files(spark, 0, 200)
    new = _files(spark, 100, 300)
    words = bloom_words(hist, "lang", KEYS, n_bits=1 << 14, k=5)
    p = bloom_probe(new, words, "lang", KEYS, n_bits=1 << 14, k=5)
    plan = p._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "Sort " not in plan
