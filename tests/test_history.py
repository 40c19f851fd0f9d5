"""Metric-history anomaly check (checks/history.py) + the manifest's
revalidate mode that feeds it."""

import datetime

from anomaly_detector_spark.checks.base import CheckSpec
from anomaly_detector_spark.checks.history import (
    flag_metric_anomalies,
    manifest_metric_anomalies,
    metric_history,
)
from anomaly_detector_spark.checks.stats import run_stats
from anomaly_detector_spark.plans.manifest import read_manifest, run_with_manifest

HIST_COLS = (
    "run_id string, committed_at timestamp, partition_key string, "
    "check_id string, metric string, value double"
)


def _t(i):
    return datetime.datetime(2026, 1, 1, 0, i)


def mkhist(spark, series):
    rows = []
    for (pk, metric), values in series.items():
        for i, v in enumerate(values):
            rows.append((f"r{i}", _t(i), pk, "chk", metric, float(v)))
    return spark.createDataFrame(rows, HIST_COLS)


def test_flag_metric_anomalies(spark):
    hist = mkhist(
        spark,
        {
            ("python", "stable"): [10, 10, 10, 10, 10],
            ("python", "spike"): [10, 11, 9, 10, 30],
            ("go", "short"): [5, 50],
            ("go", "drop"): [100, 101, 99, 100, 1],
        },
    )
    out = {
        (r["partition_key"], r["metric"]): r.asDict()
        for r in flag_metric_anomalies(hist).collect()
    }
    assert out[("python", "stable")]["is_anomalous"] is False
    assert out[("python", "spike")]["is_anomalous"] is True
    assert out[("python", "spike")]["value"] == 30.0
    assert out[("python", "spike")]["n_history"] == 4
    assert out[("go", "drop")]["is_anomalous"] is True
    # one prior point < min_history -> NULL verdict, not a guess
    assert out[("go", "short")]["is_anomalous"] is None
    assert out[("go", "short")]["n_history"] == 1


def test_constant_history_iqr_zero(spark):
    # all-equal history: std 0 (z path dead), IQR fences collapse to the
    # constant, so ANY deviation flags — the null_rate 0 -> 0.5 case.
    hist = mkhist(spark, {("python", "null_rate"): [0, 0, 0, 0.5]})
    r = flag_metric_anomalies(hist).collect()[0]
    assert r["is_anomalous"] is True and r["z_score"] == 0.0


def test_revalidate_builds_history_and_flags(spark, tmp_path):
    mdir = str(tmp_path / "manifest")
    suite = [CheckSpec("stats", run_stats, {"approx": False}, "lang", 1)]

    def files(null_python: bool):
        rows = []
        for i in range(8):
            content = None if (null_python and i % 2 == 0) else f"body{i}"
            rows.append(("r", f"p{i}", f"c{i}", "python", content))
            rows.append(("r", f"g{i}", f"c{i}", "go", f"gg{i}"))
        return spark.createDataFrame(
            rows, "repo string, path string, commit string, lang string, content string"
        )

    clean = files(False)
    for i in range(3):
        res = run_with_manifest(clean, mdir, suite=suite, run_id=f"run{i}", revalidate=True)
        assert res.pending_partitions == 2, f"revalidate run {i} must re-run all partitions"
    # without revalidate the same input is a no-op (resume semantics intact)
    assert run_with_manifest(clean, mdir, suite=suite, run_id="noop").pending_partitions == 0
    run_with_manifest(files(True), mdir, suite=suite, run_id="run3", revalidate=True)

    manifest = read_manifest(spark, mdir)
    hist = metric_history(manifest)
    n_runs = hist.select("run_id").distinct().count()
    assert n_runs == 4

    flags = {
        (r["partition_key"], r["metric"]): r["is_anomalous"]
        for r in manifest_metric_anomalies(manifest).collect()
    }
    assert flags[("python", "null_rate")] is True
    assert flags[("python", "n_rows")] is False
    assert flags[("go", "null_rate")] is False


def _daily_hist(spark, values_by_day, pk="python", metric="n_rows"):
    # one run per day starting Mon 2026-01-05; values_by_day is ordered
    start = datetime.datetime(2026, 1, 5, 12, 0)  # a Monday
    rows = [
        (f"r{i}", start + datetime.timedelta(days=i), pk, "chk", metric, float(v))
        for i, v in enumerate(values_by_day)
    ]
    return spark.createDataFrame(rows, HIST_COLS)


def test_seasonal_baseline_kills_weekend_false_alarm(spark):
    # 4 weeks of daily counts: 100 every day except a low-traffic
    # Sunday (20). The latest run is a normal Sunday. A flat baseline
    # IQR-fences it (27 priors, only 3 of them Sundays -> q1 = q3 = 100,
    # any 20 sits below the fence); the dow-slotted baseline compares
    # Sundays to Sundays and does not.
    week = [100, 100, 100, 100, 100, 100, 20]  # Mon..Sun
    vals = week * 4
    hist = _daily_hist(spark, vals)
    flat = flag_metric_anomalies(hist).collect()[0]
    assert flat["is_anomalous"] is True  # the false alarm
    seasonal = flag_metric_anomalies(hist, season="dow").collect()[0]
    assert seasonal["is_anomalous"] is False
    assert seasonal["slot"] == 1  # Spark dayofweek: Sunday = 1
    assert seasonal["n_history"] == 3  # the three prior Sundays only
    assert seasonal["mean_prior"] == 20.0


def test_seasonal_baseline_still_catches_real_anomaly(spark):
    week = [100, 100, 100, 100, 100, 100, 20]
    vals = week * 4
    vals[-1] = 95  # latest Sunday looks like a weekday: genuinely wrong
    hist = _daily_hist(spark, vals)
    seasonal = flag_metric_anomalies(hist, season="dow").collect()[0]
    assert seasonal["is_anomalous"] is True
    # a custom Column expression works too and insufficient same-slot
    # history yields NULL, not a guess
    import pyspark.sql.functions as F

    two_weeks = _daily_hist(spark, week * 2)
    r = flag_metric_anomalies(two_weeks, season=F.dayofweek("committed_at")).collect()[0]
    assert r["is_anomalous"] is None and r["n_history"] == 1


def test_ewma_flags_step_change_and_recentering(spark):
    from anomaly_detector_spark.checks.history import ewma_metric_flags

    hist = mkhist(
        spark,
        {
            # step change on the newest run -> outside the control limit
            ("python", "spike"): [10, 11, 9, 10, 30],
            # legitimately shifted level after a long stable prefix: the
            # flat-prior IQR fences still hug the old level and flag 200
            # forever, but the EWMA has re-centered within ~1/alpha runs
            ("python", "shifted"): [10, 11, 9, 10, 11, 9, 10, 11, 9, 10,
                                    200, 201, 199, 200],
            ("python", "stable"): [10, 10.5, 9.5, 10, 10.2],
            ("go", "short"): [5, 50],
        },
    )
    out = {
        (r["partition_key"], r["metric"]): r.asDict()
        for r in ewma_metric_flags(hist).collect()
    }
    assert out[("python", "spike")]["is_anomalous"] is True
    assert out[("python", "stable")]["is_anomalous"] is False
    assert out[("go", "short")]["is_anomalous"] is None  # warm-up guard
    assert out[("python", "shifted")]["is_anomalous"] is False
    # ...while the flat-prior flagger still calls the shifted series
    # anomalous forever — the complementary-memory claim
    zout = {
        (r["partition_key"], r["metric"]): r["is_anomalous"]
        for r in flag_metric_anomalies(hist).collect()
    }
    assert zout[("python", "shifted")] is True


def test_ewma_closed_form_matches_iterative_replay(spark):
    from anomaly_detector_spark.checks.history import ewma_metric_flags

    values = [12.0, 15.0, 9.0, 14.0, 11.0, 13.0, 40.0]
    hist = mkhist(spark, {("python", "m"): values})
    r = ewma_metric_flags(hist).collect()[0]
    a = 0.3
    z = values[0]
    for x in values[1:-1]:
        z = a * x + (1 - a) * z
    assert r["ewma"] == round(z, 4)
    assert r["n_history"] == len(values) - 1


def test_ewma_zero_variance_history_flags_any_deviation(spark):
    from anomaly_detector_spark.checks.history import ewma_metric_flags

    hist = mkhist(
        spark,
        {("python", "flat"): [7, 7, 7, 7, 7.5], ("go", "still"): [3, 3, 3, 3, 3]},
    )
    out = {
        (r["partition_key"], r["metric"]): r["is_anomalous"]
        for r in ewma_metric_flags(hist).collect()
    }
    assert out[("python", "flat")] is True
    assert out[("go", "still")] is False
