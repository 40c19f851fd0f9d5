"""Metric-history anomaly check: flag a run's metrics against their own
run-over-run history.

The reference's core kernel is exactly this shape over device series — a
window of past values gating the newest one (z-score over reconstruction
errors with a median floor, /root/reference/algo/error_calculation.py:5-13,
applied per device as new points arrive). The engine re-aims it at its
own telemetry: ``run_with_manifest`` commits one metrics row per
(run, partition, check) (plans/manifest.py MANIFEST_SCHEMA), so every
metric value has a committed_at-ordered history, and the newest run is
anomalous for a series when it is a z-score or IQR outlier against the
PRIOR runs of that same series. This is how a scheduled validation
pipeline notices "the null-rate verdict still says PASS, but it tripled
since yesterday" without any per-run threshold tuning.

Scale shape: the history table is O(runs x partitions x checks x
metrics) — already-aggregated telemetry, tiny next to the data — but the
plan still avoids any global funnel: latest-vs-prior split is a window
partitioned BY SERIES (millions of independent series parallelize;
never a partitionBy(lit(1))), the prior-run baseline is one grouped
aggregate over the same hash partitioning (exchange reuse), and the
final comparison is a co-partitioned join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SERIES_KEY = ["partition_key", "check_id", "metric"]


def metric_history(manifest: DataFrame, suite_sid: str | None = None) -> DataFrame:
    """Long-form metric history from committed manifest rows:
    (run_id, committed_at, partition_key, check_id, metric, value)."""
    m = manifest if suite_sid is None else manifest.filter(F.col("suite_id") == suite_sid)
    return m.select(
        "run_id",
        "committed_at",
        "partition_key",
        "check_id",
        F.explode("metrics").alias("metric", "value"),
    )


def season_slot(kind: str, ts_col: str = "committed_at") -> F.Column:
    """Seasonal slot expression: 'hour' (0-23), 'dow' (1-7), or
    'dow_hour' (dow*100 + hour) of the commit timestamp."""
    if kind == "hour":
        return F.hour(ts_col)
    if kind == "dow":
        return F.dayofweek(ts_col)
    if kind == "dow_hour":
        return F.dayofweek(ts_col) * 100 + F.hour(ts_col)
    raise ValueError(f"unknown season kind {kind!r}: use hour | dow | dow_hour")


def flag_metric_anomalies(
    hist: DataFrame,
    order_cols: list[str] | None = None,
    z_thresh: float = 3.0,
    iqr_k: float = 1.5,
    min_history: int = 3,
    season: str | F.Column | None = None,
) -> DataFrame:
    """Flag each series' LATEST value against the distribution of its
    prior values.

    One row per series: (partition_key, check_id, metric, value,
    n_history, mean_prior, std_prior, z_score, is_anomalous).
    ``is_anomalous`` is NULL (insufficient history) when the series has
    fewer than ``min_history`` prior points — the T1 warm-up guard
    applied to the time dimension. Ordering within a series follows
    ``order_cols`` (default committed_at then run_id as the
    deterministic tiebreak for same-timestamp commits).

    z and IQR fences mirror drift.flag_outliers' relative gates, but the
    population here is the series' own past, not this run's sibling
    partitions — the two checks are complementary axes of the same
    median-gated outlier idea the reference applies per device.

    ``season``: slot-aware baseline for metrics with daily/weekly
    rhythm (row counts dip every weekend; a flat prior distribution
    z-flags every Saturday forever). Pass 'hour' | 'dow' | 'dow_hour'
    (derived from committed_at via ``season_slot``) or any Column
    expression: the latest value is then compared ONLY against prior
    runs in the SAME slot, and ``n_history``/``min_history`` count
    same-slot priors — the warm-up guard automatically demands enough
    history of the right kind of day. Same plan shape (the slot just
    joins the series key for the baseline aggregate); the latest row
    is still the newest overall, seasonality only changes its peers.

    Note: the latest/prior split filters the ranked frame twice, so the
    input plan executes twice (union branches never share work — see
    CheckResult.shared_verdicts). Fine here by construction: the input
    is the already-tiny manifest/metric frame, never the data table.
    """
    order_cols = order_cols or ["committed_at", "run_id"]
    if isinstance(season, str):
        season = season_slot(season)
    key = SERIES_KEY + (["_slot"] if season is not None else [])
    if season is not None:
        hist = hist.withColumn("_slot", season)
    w = Window.partitionBy(*SERIES_KEY).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    ranked = hist.withColumn("_rn", F.row_number().over(w))
    latest = ranked.where(F.col("_rn") == 1).select(*key, "value")
    prior = (
        ranked.where(F.col("_rn") > 1)
        .groupBy(*key)
        .agg(
            F.count("value").alias("n_history"),
            F.avg("value").alias("mean_prior"),
            F.stddev_samp("value").alias("std_prior"),
            F.expr("percentile(value, 0.25)").alias("_q1"),
            F.expr("percentile(value, 0.75)").alias("_q3"),
        )
    )
    # null-safe: NULL partition_key series must find their own history,
    # or they are permanently "insufficient history" and never flagged
    from .base import null_safe_join

    j = null_safe_join(latest, prior, key, "left")
    v = F.col("value")
    z = F.when(
        F.col("std_prior") > 0, F.abs(v - F.col("mean_prior")) / F.col("std_prior")
    ).otherwise(F.lit(0.0))
    iqr = F.col("_q3") - F.col("_q1")
    outlier = (
        (z > z_thresh)
        | (v > F.col("_q3") + iqr_k * iqr)
        | (v < F.col("_q1") - iqr_k * iqr)
    )
    flagged = F.when(
        F.coalesce(F.col("n_history"), F.lit(0)) < min_history, F.lit(None).cast("boolean")
    ).otherwise(outlier)
    return (
        j.withColumn("z_score", F.round(z, 4))
        .withColumn("is_anomalous", flagged)
        .withColumn("n_history", F.coalesce(F.col("n_history"), F.lit(0)))
        .withColumn("mean_prior", F.round("mean_prior", 4))
        .withColumn("std_prior", F.round("std_prior", 4))
        .withColumnRenamed("_slot", "slot")  # no-op when season is None
        .drop("_q1", "_q3")
    )


def ewma_metric_flags(
    hist: DataFrame,
    order_cols: list[str] | None = None,
    alpha: float = 0.3,
    L: float = 3.0,
    min_history: int = 3,
) -> DataFrame:
    """EWMA control chart per metric series: flag the LATEST value when
    it falls outside ewma_prior +- L * sigma_prior * sqrt(a / (2 - a)).

    The complementary memory model to :func:`flag_metric_anomalies`'
    flat prior distribution: the EWMA weights recent runs geometrically
    (weight a(1-a)^age), so a series that has LEGITIMATELY drifted to a
    new level re-centers within ~1/a runs instead of flagging forever,
    while a step change still exceeds the control limit immediately —
    the classic Roberts/Hunter EWMA chart, run over the manifest's own
    committed telemetry.

    No iterative state: the EWMA of the priors has the closed form
    ``a * sum_t (1-a)^(n-t) x_t + (1-a)^(n-1) x_1`` (priors ordered
    oldest->newest, initialized at the first observation), which is one
    weighted-sum aggregate per series — the same shuffle-by-series
    plan shape as the z/IQR flagger, no window wider than the series.

    One row per series: (partition_key, check_id, metric, value,
    n_history, ewma, sigma_prior, ucl, lcl, is_anomalous).
    ``is_anomalous`` is NULL under ``min_history`` (T1 warm-up on the
    time axis); a zero-variance history flags any deviation."""
    order_cols = order_cols or ["committed_at", "run_id"]
    w_desc = Window.partitionBy(*SERIES_KEY).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    ranked = hist.withColumn("_rn", F.row_number().over(w_desc))
    latest = ranked.where(F.col("_rn") == 1).select(*SERIES_KEY, "value")
    priors = ranked.where(F.col("_rn") > 1)
    # ascending age: t = 1 oldest .. n newest; _rn descends so t = n - _rn + 2
    a = float(alpha)
    n_w = Window.partitionBy(*SERIES_KEY)
    pr = priors.withColumn("_n", F.count(F.lit(1)).over(n_w)).withColumn(
        "_t", F.col("_n") - F.col("_rn") + 2
    )
    weight = F.when(
        F.col("_t") == 1, F.pow(F.lit(1 - a), F.col("_n") - 1)
    ).otherwise(F.lit(a) * F.pow(F.lit(1 - a), F.col("_n") - F.col("_t")))
    agg = pr.groupBy(*SERIES_KEY).agg(
        F.count("value").alias("n_history"),
        F.sum(F.col("value") * weight).alias("ewma"),
        F.stddev_samp("value").alias("sigma_prior"),
    )
    from .base import null_safe_join

    j = null_safe_join(latest, agg, SERIES_KEY, "left")
    spread = F.lit(L) * F.col("sigma_prior") * F.lit((a / (2 - a)) ** 0.5)
    ucl, lcl = F.col("ewma") + spread, F.col("ewma") - spread
    dev = F.abs(F.col("value") - F.col("ewma"))
    # zero-variance history: any REAL deviation flags, but the closed-form
    # weight sum carries ~1ulp of dust ((0.7)^3 + 0.3*(0.49+0.7+1) !=
    # exactly 1 in floats), so "deviation" needs a relative epsilon or a
    # constant series flags itself
    eps = F.greatest(F.lit(1e-9) * F.abs(F.col("value")), F.lit(1e-12))
    outside = F.when(
        F.coalesce(F.col("sigma_prior"), F.lit(0.0)) > 0,
        (F.col("value") > ucl) | (F.col("value") < lcl),
    ).otherwise(dev > eps)
    flagged = F.when(
        F.coalesce(F.col("n_history"), F.lit(0)) < min_history,
        F.lit(None).cast("boolean"),
    ).otherwise(outside)
    return (
        j.withColumn("is_anomalous", flagged)
        .withColumn("n_history", F.coalesce(F.col("n_history"), F.lit(0)))
        # limits derive from the UNROUNDED ewma (computed before the
        # display rounding below; the oracle mirrors this order)
        .withColumn("ucl", F.round(ucl, 4))
        .withColumn("lcl", F.round(lcl, 4))
        .withColumn("ewma", F.round("ewma", 4))
        .withColumn("sigma_prior", F.round("sigma_prior", 4))
    )


def manifest_metric_anomalies(
    manifest: DataFrame,
    suite_sid: str | None = None,
    **kwargs,
) -> DataFrame:
    """Convenience: explode + flag straight off a manifest frame."""
    return flag_metric_anomalies(metric_history(manifest, suite_sid), **kwargs)
