"""Robust-statistics checks (checks/robust.py): MAD modified-z outliers
and Benford first-digit drift."""

import math

from pyspark.sql import functions as F

from anomaly_detector_spark.checks.base import CheckSpec
from anomaly_detector_spark.checks.robust import (
    BENFORD_P,
    benford_profile,
    mad_profile,
    run_benford,
    run_mad_outliers,
)


def _lengths_df(spark, spec: dict):
    rows = [
        (lang, "r0", f"p{lang}{i}", f"c{i}", "x" * ln)
        for lang, lengths in spec.items()
        for i, ln in enumerate(lengths)
    ]
    return spark.createDataFrame(
        rows, "lang string, repo string, path string, commit string, content string"
    )


def test_mad_profile_flags_planted_outliers_and_is_robust(spark):
    # 60 values at 100 +- 2 plus two monsters; a mean/std z-score would
    # let the monsters inflate sigma — the MAD path must flag exactly 2
    base = [100 + (i % 5) - 2 for i in range(60)]
    df = _lengths_df(spark, {"py": base + [5000, 9000], "go": base})
    prof = {r["partition_key"]: r for r in mad_profile(df, "lang").collect()}
    assert prof["py"]["n_outliers"] == 2
    assert prof["py"]["med"] == 100.0
    assert prof["go"]["n_outliers"] == 0
    assert prof["go"]["outlier_rate"] == 0.0


def test_mad_profile_constant_partition_flags_any_deviation(spark):
    # mad == 0: the robust reading is "any deviation from the median is
    # an outlier" — not a divide-by-zero, not a silent pass
    df = _lengths_df(spark, {"py": [50] * 40 + [51]})
    r = mad_profile(df, "lang").collect()[0]
    assert r["mad"] == 0.0 and r["n_outliers"] == 1


def test_run_mad_outliers_verdicts(spark):
    base = [100 + (i % 5) - 2 for i in range(60)]
    df = _lengths_df(
        spark,
        {
            "py": base + [9000] * 5,  # 7.7% outliers > 1% gate -> FAIL
            "go": base,  # PASS
            "rs": base[:10],  # < min_rows -> SKIPPED
        },
    )
    spec = CheckSpec("mad", run_mad_outliers, {"max_outlier_rate": 0.01}, "lang", 25)
    res = spec.run(df)
    v = {r["partition_key"]: r["verdict"] for r in res.verdicts.collect()}
    assert v == {"py": "FAIL", "go": "PASS", "rs": "SKIPPED"}


def _value_df(spark, spec: dict):
    rows = [(t, float(v)) for t, vals in spec.items() for v in vals]
    return spark.createDataFrame(rows, "event_type string, value double")


def test_benford_profile_digits_and_chi2(spark):
    # log-uniform values follow Benford closely; uniform-leading-digit
    # values (1..9 equally often) deviate hard
    benford_vals = [10 ** (i / 500.0 * 3) for i in range(500)]  # 1 .. 1000 log-uniform
    uniform_vals = [d * 10 ** (i % 3) for d in range(1, 10) for i in range(56)]
    df = _value_df(spark, {"ok": benford_vals, "bad": uniform_vals})
    prof = {r["partition_key"]: r for r in benford_profile(df, "event_type", "value").collect()}
    assert prof["ok"]["chi2"] < 20.09 < prof["bad"]["chi2"]
    # observed d1 fraction of the log-uniform set is near log10(2)
    assert abs(prof["ok"]["d1"] - math.log10(2)) < 0.05
    # digit fractions sum to 1 (zeros/NULLs excluded upstream)
    assert abs(sum(prof["bad"][f"d{d}"] for d in range(1, 10)) - 1.0) < 1e-5
    # uniform leading digits: every fraction ~1/9
    assert abs(prof["bad"]["d9"] - 1 / 9) < 0.01


def test_benford_excludes_zero_null_and_uses_abs(spark):
    df = _value_df(spark, {"t": [0.0, 123.0, -123.0]}).unionByName(
        _value_df(spark, {"t": [float("nan")]}).withColumn(
            "value", F.lit(None).cast("double")
        )
    )
    r = benford_profile(df, "event_type", "value").collect()[0]
    assert r["n_rows"] == 2  # zero and NULL dropped; negative kept via abs
    assert r["d1"] == 1.0


def test_run_benford_verdicts(spark):
    benford_vals = [10 ** (i / 500.0 * 3) for i in range(500)]
    uniform_vals = [d * 10 ** (i % 3) for d in range(1, 10) for i in range(56)]
    df = _value_df(spark, {"ok": benford_vals, "bad": uniform_vals, "tiny": [1.0] * 5})
    spec = CheckSpec("benford", run_benford, {"column": "value"}, "event_type", 25)
    res = spec.run(df)
    v = {r["partition_key"]: r["verdict"] for r in res.verdicts.collect()}
    assert v == {"ok": "PASS", "bad": "FAIL", "tiny": "SKIPPED"}
    assert abs(sum(BENFORD_P) - 1.0) < 1e-12


def test_mad_profile_approx_backend_agrees(spark):
    # the 10^12-row path: percentile_approx sketches instead of exact
    # percentile buffers — same plan shape, estimates within tolerance
    base = [100 + (i % 21) - 10 for i in range(500)]
    df = _lengths_df(spark, {"py": base + [9000] * 4})
    exact = mad_profile(df, "lang").collect()[0]
    approx = mad_profile(df, "lang", approx=True).collect()[0]
    assert approx["n_outliers"] == exact["n_outliers"] == 4
    assert abs(approx["med"] - exact["med"]) <= 2
    assert abs(approx["mad"] - exact["mad"]) <= 2
