"""Quantile-vector drift: exact backend, sketch backend, and their agreement."""

from pyspark.sql import functions as F

from anomaly_detector_spark.checks.base import CheckSpec
from anomaly_detector_spark.checks.quantiles import run_quantile_drift


def _frame(spark, shift_part="p4", shift=500.0):
    # 5 partitions x 400 rows, identical sawtooth value distribution;
    # one partition shifted by `shift` (~12 baseline IQRs for 0..99).
    df = spark.range(0, 2000).select(
        F.concat(F.lit("p"), (F.col("id") % 5).cast("string")).alias("part"),
        (F.col("id") % 100).cast("double").alias("v"),
    )
    return df.withColumn(
        "v", F.when(F.col("part") == shift_part, F.col("v") + F.lit(shift)).otherwise(F.col("v"))
    )


def _spec(backend, **cfg):
    return CheckSpec(
        name="quantile_drift",
        fn=run_quantile_drift,
        config={"column": "v", "use_length": False, "backend": backend, **cfg},
        partition_col="part",
        min_rows=10,
    )


def test_exact_backend_flags_shifted_partition(spark):
    res = run_quantile_drift(_frame(spark), _spec("exact"))
    v = {r["partition_key"]: r["verdict"] for r in res.verdicts.collect()}
    assert v == {"p0": "PASS", "p1": "PASS", "p2": "PASS", "p3": "PASS", "p4": "FAIL"}


def test_sketch_backend_agrees_with_exact(spark):
    exact = run_quantile_drift(_frame(spark), _spec("exact"))
    sketch = run_quantile_drift(_frame(spark), _spec("sketch"))
    ve = {r["partition_key"]: r["verdict"] for r in exact.verdicts.collect()}
    vs = {r["partition_key"]: r["verdict"] for r in sketch.verdicts.collect()}
    assert ve == vs
    # per-partition quantile estimates track the exact ones closely
    qe = {r["partition_key"]: dict(r["metrics"]) for r in exact.verdicts.collect()}
    qs = {r["partition_key"]: dict(r["metrics"]) for r in sketch.verdicts.collect()}
    for k in qe:
        assert abs(qe[k]["q_0_5"] - qs[k]["q_0_5"]) <= 2.0
        assert abs(qe[k]["q_0_99"] - qs[k]["q_0_99"]) <= 2.0
    for c in sketch.caches:
        c.unpersist()


def test_no_drift_all_pass(spark):
    res = run_quantile_drift(_frame(spark, shift=0.0), _spec("exact"))
    assert {r["verdict"] for r in res.verdicts.collect()} == {"PASS"}


def test_frozen_baseline_df(spark):
    # T2 semantics: score against an injected frozen baseline, not the
    # current pool — every partition of an identical input drifts only
    # if the BASELINE says so.
    base = spark.createDataFrame(
        [(600.0, 650.0, 700.0, 760.0)],
        "q_0_25 double, q_0_5 double, q_0_75 double, q_0_99 double",
    )
    res = run_quantile_drift(
        _frame(spark, shift=0.0), _spec("exact", baseline_df=base)
    )
    # all partitions sit ~6 baseline-IQRs (IQR=100) below the frozen
    # baseline -> everything drifts ... but the median gate requires
    # score > median + gap, and all scores are EQUAL -> only the
    # abs-threshold path with n_scored>1 is gated off; equal scores
    # cannot clear the median gate, mirroring run_drift's semantics for
    # a uniformly-shifted table (a global shift is a baseline problem,
    # not a partition anomaly).
    v = {r["verdict"] for r in res.verdicts.collect()}
    assert v == {"PASS"}


def test_quantile_drift_via_suite_config(spark):
    from anomaly_detector_spark.plans.config import suite_from_config

    suite = suite_from_config(
        {
            "checks": [
                {
                    "check": "quantile_drift",
                    "partition_col": "part",
                    "min_rows": 10,
                    "column": "v",
                    "use_length": False,
                }
            ]
        }
    )
    res = suite[0].run(_frame(spark))
    v = {r["partition_key"]: r["verdict"] for r in res.verdicts.collect()}
    assert v["p4"] == "FAIL" and v["p0"] == "PASS"
