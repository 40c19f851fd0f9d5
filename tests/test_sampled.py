"""Sampled validation tier (plans/sampled.py): deterministic draw,
unbiased scale-up estimates, unsafe-check refusal, and signal agreement
with the full-scan suite."""

import pytest
from pyspark.sql import functions as F

from anomaly_detector_spark.plans.sampled import (
    SAMPLE_SAFE,
    sample_estimates,
    sample_predicate,
    sampled_suite,
)
from anomaly_detector_spark.plans.suite import default_suite, run_suite
from anomaly_detector_spark.synth import DRIFT_LANG, synth_files


def test_sample_predicate_deterministic_and_calibrated(spark):
    df = synth_files(spark, 20000)
    pred = sample_predicate(("repo", "path", "commit"), 0.3, "val1")
    n = df.filter(pred).count()
    # calibration: hash-uniform draw keeps ~frac of rows
    assert abs(n / 20000 - 0.3) < 0.02
    # determinism: selection is a pure function of the key, not layout
    assert df.repartition(7).filter(pred).count() == n
    keys = sorted(tuple(r) for r in df.filter(pred).select("repo", "path", "commit").collect())
    keys1 = sorted(
        tuple(r) for r in df.coalesce(1).filter(pred).select("repo", "path", "commit").collect()
    )
    assert keys == keys1


def test_sample_estimates_unbiased_and_guarded(spark):
    df = synth_files(spark, 20000)
    frac = 0.3
    sampled = df.filter(sample_predicate(("repo", "path", "commit"), frac, "val1"))
    true = {r["lang"]: r["count"] for r in df.groupBy("lang").count().collect()}
    est = {r["partition_key"]: r for r in sample_estimates(sampled, frac).collect()}
    assert set(est) <= set(true)
    for lang, r in est.items():
        # binomial sd of the sampled count, scaled up: 4-sigma bound holds
        # for tiny strata where a flat relative tolerance would not
        bound = 4 * (true[lang] * frac * (1 - frac)) ** 0.5 / frac
        assert abs(r["n_rows_est"] - true[lang]) <= bound, lang
        assert r["verdict"] in ("PASS", "FAIL", "SKIPPED")
        if r["null_rate"] > 0:
            assert r["ci95"] > 0  # margin reported whenever the rate is
    # warm-up guard applies to SAMPLED evidence: force it with a tiny frac
    tiny = df.filter(sample_predicate(("repo", "path", "commit"), 0.001, "val1"))
    for r in sample_estimates(tiny, 0.001, min_rows=25).collect():
        assert r["verdict"] == "SKIPPED"


def test_sampled_suite_refuses_identity_checks(spark):
    df = synth_files(spark, 2000)
    with pytest.raises(ValueError, match="uniqueness"):
        sampled_suite(df, 0.5, suite=default_suite())


def test_sampled_suite_sees_the_drift_signal(spark):
    """The planted cpp length shift survives a 30% sample: the sampled
    drift verdict agrees with the full scan on the drifted partition."""
    df = synth_files(spark, 20000)
    safe = [s for s in default_suite() if s.name in SAMPLE_SAFE]
    full = {
        (r["partition_key"], r["check_id"]): r["verdict"]
        for r in run_suite(df, safe).verdicts.collect()
    }
    res = sampled_suite(df, 0.3)
    got = {
        (r["partition_key"], r["check_id"]): (r["verdict"], r["sample_frac"])
        for r in res.verdicts.collect()
    }
    assert got, "sampled suite produced no verdicts"
    drift_rows = [k for k in full if k[0] == DRIFT_LANG]
    assert drift_rows
    for k in drift_rows:
        verdict, frac = got[k]
        assert verdict == full[k], k
        assert frac == 0.3
    res.unpersist()
