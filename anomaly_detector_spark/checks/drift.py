"""Distribution-drift check: PSI + two-sample KS with z-score/IQR flagging.

Replaces the reference's autoencoder-reconstruction-error outlier kernel
(/root/reference/algo/cont_device.py:110-205) with distribution tests,
keeping its decision *shape*:

* a frozen baseline (the reference trains once then freezes the model,
  algo/operator.py:169 + retrain cadence :106-118 → here: a baseline
  histogram, either supplied/frozen in the manifest or the global
  distribution of the current run),
* a per-partition drift score (PSI and KS replace area/PCM/DTW curve
  distances, algo/cont_device.py:110-153),
* outlier flagging of the scores with a MEDIAN GATE — the reference
  flags window i iff IsolationForest says -1 AND error_i > median(errors)
  (/root/reference/algo/error_calculation.py:5-12). We flag partition p
  iff (|z_p| > z_k OR score outside IQR fence) AND score_p > median.

Scale design: content length is histogrammed with a fixed bucket width
via ``groupBy(partition, bucket).count()`` — one partial-aggregated
shuffle whose size is O(partitions x buckets), independent of row count.
The PSI/KS kernel then runs inside ``applyInPandas`` (Arrow-vectorized,
per input_hint) over those tiny histogram frames — the UDF never sees a
raw content row. The final flagging pass operates on one row per
partition (driver-scale) but stays in Spark for composability.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .base import CheckResult, CheckSpec, empty_violations, null_safe_join, verdict_frame

HIST_SCHEMA = "partition_key string, bucket long, n long"
SCORE_SCHEMA = "partition_key string, psi double, ks double, n_obs long, n_buckets long"


def length_histogram(
    df: DataFrame,
    partition_col: str,
    col: str = "content",
    bucket_width: int = 100,
    mode: str = "length",
) -> DataFrame:
    """Pre-aggregated histogram: one row per (partition, bucket).

    ``mode='length'`` buckets ``length(col)`` (the reference's content
    dimension); ``mode='value'`` buckets the NUMERIC column itself —
    PSI/KS drift over telemetry values, the shape-sensitive complement
    to quantile-vector drift (a multi-modal redistribution can leave
    every quantile in place; the binned histogram moves). Negative
    values floor into negative buckets — no clamping."""
    if mode == "length":
        measure = F.length(F.col(col))
    elif mode == "value":
        measure = F.col(col)
    else:
        raise ValueError(f"mode must be 'length' or 'value', got {mode!r}")
    return (
        df.filter(F.col(col).isNotNull())
        .select(
            F.col(partition_col).cast("string").alias("partition_key"),
            (F.floor(measure / bucket_width)).cast("long").alias("bucket"),
        )
        .groupBy("partition_key", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def global_baseline(hist: DataFrame) -> DataFrame:
    """Default baseline = pooled histogram over all partitions (first-run freeze)."""
    return hist.groupBy("bucket").agg(F.sum("n").alias("base_n"))


def psi_ks(obs, base) -> tuple[float, float]:
    """PSI and binned two-sample KS between two aligned count vectors.

    Laplace smoothing keeps log-ratios of empty buckets bounded so a
    partition that simply lacks a rare bucket is not scored as drifted.
    Pure numpy — shared by the Spark kernel and the test oracle.
    """
    import numpy as np

    obs = np.asarray(obs, dtype=np.float64)
    base = np.asarray(base, dtype=np.float64)
    p = (obs + 0.5) / (obs.sum() + 0.5 * len(obs))
    q = (base + 0.5) / (base.sum() + 0.5 * len(base))
    psi = float(np.sum((p - q) * np.log(p / q)))
    ks = float(np.max(np.abs(np.cumsum(p) - np.cumsum(q))))
    return psi, ks


def _make_kernel():
    """Build the per-partition scoring kernel as a closure.

    A closure is cloudpickled BY VALUE, so the plan is self-contained and
    executes on workers that don't have this package on their PYTHONPATH
    (spark-submit without --py-files, notebook clusters, etc.). A
    module-level function would be pickled by reference and fail with
    ModuleNotFoundError on the Python workers.
    """
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        # NOTE: keeps all logic inline (no references to module globals)
        # so cloudpickle ships it fully by value. Must stay numerically
        # identical to psi_ks() above, which the tests oracle against.
        import numpy as np

        pdf = pdf.sort_values("bucket")  # shuffle does not preserve order
        key = pdf["partition_key"].iloc[0]
        obs = pdf["n"].fillna(0.0).to_numpy(dtype=np.float64)
        base = pdf["base_n"].fillna(0.0).to_numpy(dtype=np.float64)
        p = (obs + 0.5) / (obs.sum() + 0.5 * len(obs))
        q = (base + 0.5) / (base.sum() + 0.5 * len(base))
        psi = float(np.sum((p - q) * np.log(p / q)))
        ks = float(np.max(np.abs(np.cumsum(p) - np.cumsum(q))))
        return pd.DataFrame(
            {
                "partition_key": [key],
                "psi": [psi],
                "ks": [ks],
                "n_obs": [int(obs.sum())],
                "n_buckets": [len(obs)],
            }
        )

    return kernel


def drift_scores(hist: DataFrame, baseline: DataFrame) -> DataFrame:
    """Join partition histograms with the baseline and score in Arrow batches.

    Builds the full (partition x bucket) grid first so every partition's
    frame carries the complete bucket support of both its own histogram
    and the baseline — otherwise missing buckets silently drop baseline
    mass and understate drift. All inputs here are pre-aggregated and
    tiny (O(partitions x buckets)), so the crossJoin is broadcast-cheap.
    """
    parts = hist.select("partition_key").distinct()
    buckets = (
        hist.select("bucket").union(baseline.select("bucket")).distinct()
    )
    grid = parts.crossJoin(F.broadcast(buckets))
    # A baseline carrying partition_key is per-partition history
    # (plans/manifest.py rolling_baseline(per_partition=True)): each
    # partition is compared to ITS OWN past distribution, so the join is
    # keyed on both columns. A partition with no history rows scores
    # against the all-smoothing (uniform) null — gate new partitions with
    # min_rows / warm-up semantics upstream if that is not wanted.
    # null-safe on partition_key: a NULL partition's histogram must land
    # on its own grid rows, or the kernel scores it as all-zero mass.
    from .base import null_safe_join

    if "partition_key" in baseline.columns:
        joined = null_safe_join(
            null_safe_join(grid, hist, ["partition_key", "bucket"], "left"),
            baseline, ["partition_key", "bucket"], "left", broadcast_right=True,
        )
    else:
        joined = null_safe_join(
            grid, hist, ["partition_key", "bucket"], "left"
        ).join(F.broadcast(baseline), on="bucket", how="left")
    return joined.groupBy("partition_key").applyInPandas(_make_kernel(), SCORE_SCHEMA)


def flag_outliers(
    scores: DataFrame,
    score_col: str = "psi",
    z_thresh: float = 3.0,
    iqr_k: float = 1.5,
    abs_thresh: float | None = 0.25,
    min_gap: float = 0.1,
    noise_c: float = 3.0,
    gate_mode: str = "relative",
    by: list[str] | None = None,
) -> DataFrame:
    """z-score / IQR / absolute outlier flags over per-partition scores,
    gated by the median plus a sampling-noise floor.

    ``by``: optional grouping columns — peer statistics (mean/std/median/
    quartiles) are computed WITHIN each group instead of globally, so one
    call flags a whole (partition x column) sweep with per-column peers
    (run_drift_sweep). Empty/None keeps the global 1-row aggregate.

    The gate generalizes the reference's median gate (K4): a partition is
    flagged only if its score exceeds median + max(min_gap, noise_c *
    (n_buckets-1) / n_obs). The second term is the chi-square expectation
    of PSI under the null for a partition with n_obs samples over
    n_buckets bins — small partitions have genuinely noisy histograms and
    must clear a proportionally higher bar, large partitions a lower one.

    ``gate_mode='relative'`` (default) is the K4 semantic and is RIGHT
    when partitions baseline against their own run's pooled distribution
    — each partition is judged against its peers. It is structurally
    BLIND to a wholesale shift (every partition drifting together stays
    at the median). ``gate_mode='absolute'`` drops the peer-relative
    machinery and flags any partition with score > abs_thresh (noise
    floor still applies) — the right gate when a TRUSTED external
    baseline is injected (frozen T2 or rolling history), where "all
    partitions moved" is exactly the signal, not the null.
    """
    # Global stats via a 1-row aggregate broadcast-joined back — NOT a
    # Window.partitionBy(lit(1)), which funnels every score row into one
    # task for a single-partition sort. With a low-cardinality partition
    # column the difference is invisible; with millions of partition keys
    # (per-repo drift at web scale) the window variant serializes the
    # whole flagging pass through one reducer.
    s = F.col(score_col)
    aggs = [
        F.avg(s).alias("_mean"),
        F.stddev_samp(s).alias("_std"),
        F.expr(f"percentile({score_col}, 0.5)").alias("_med"),
        F.expr(f"percentile({score_col}, 0.25)").alias("_q1"),
        F.expr(f"percentile({score_col}, 0.75)").alias("_q3"),
        F.count(s).alias("_n_scored"),
    ]
    if gate_mode not in ("relative", "absolute"):
        raise ValueError(f"gate_mode must be 'relative' or 'absolute', got {gate_mode!r}")
    if by:
        from .base import null_safe_join

        g = scores.groupBy(*by).agg(*aggs)
        stats = null_safe_join(scores, g, list(by), broadcast_right=True)
    else:
        g = scores.agg(*aggs)
        stats = scores.crossJoin(F.broadcast(g))
    z = F.when(F.col("_std") > 0, F.abs(s - F.col("_mean")) / F.col("_std")).otherwise(F.lit(0.0))
    iqr = F.col("_q3") - F.col("_q1")
    relative = (z > z_thresh) | (s > F.col("_q3") + iqr_k * iqr) | (s < F.col("_q1") - iqr_k * iqr)
    noise_floor = noise_c * (F.col("n_buckets") - 1) / F.greatest(F.col("n_obs"), F.lit(1))
    if gate_mode == "absolute":
        flagged = (s > F.lit(abs_thresh if abs_thresh is not None else 0.25)) & (s > noise_floor)
        return stats.withColumn("z_score", z).withColumn("is_drifted", flagged).drop(
            "_mean", "_std", "_q1", "_q3", "_n_scored"
        ).withColumnRenamed("_med", "median_score")
    # All outlier paths must clear the median gate (K4 semantics) — EXCEPT
    # when the run scored a single partition (e.g. one new partition on an
    # incremental resume against a frozen baseline): there the median IS
    # the score and no relative gate can ever fire, so the absolute
    # threshold decides alone (noise floor still applies).
    outlier = relative
    if abs_thresh is not None:
        outlier = outlier | (s > abs_thresh)
    gate = s > F.col("_med") + F.greatest(F.lit(min_gap), noise_floor)
    flagged = outlier & gate
    if abs_thresh is not None:
        flagged = flagged | ((F.col("_n_scored") == 1) & (s > abs_thresh) & (s > noise_floor))
    return stats.withColumn("z_score", z).withColumn("is_drifted", flagged).drop(
        "_mean", "_std", "_q1", "_q3", "_n_scored"
    ).withColumnRenamed("_med", "median_score")


def count_histogram(df: DataFrame, partition_col: str) -> DataFrame:
    """Per-partition row counts — the categorical 'file-count histogram'
    (north_star: drift on per-lang file-count histograms, complementing
    the content-length histograms above). One partial-aggregated shuffle
    of O(partitions) rows."""
    return df.groupBy(F.col(partition_col).cast("string").alias("partition_key")).agg(
        F.count(F.lit(1)).alias("n")
    )


def run_count_drift(df: DataFrame, spec: CheckSpec) -> CheckResult:
    """Categorical drift of the partition-count distribution.

    Compares each partition's SHARE of rows against a baseline share
    (``baseline_df`` = frozen (partition_key, base_n) from a reference
    run; default: uniform across observed partitions). Per-partition
    score = |ln(p/q)| of Laplace-smoothed shares — symmetric, unitless;
    the global PSI = sum (p-q)ln(p/q) lands in the metrics map. Flagging
    reuses the K4 median-gate machinery (flag_outliers) with the same
    chi-square noise floor, so small partitions must clear a higher bar.
    """
    part = spec.partition_col
    cid = spec.id
    # cur is O(partitions) rows but computing it scans the input; it feeds
    # both the totals aggregate and the share join below, so cache it and
    # hand the cache to the caller for release (matching run_drift).
    cur = count_histogram(df, part).cache()
    baseline = spec.config.get("baseline_df")
    if baseline is None:
        # Uniform default baseline derived INSIDE the plan: q is the same
        # smoothed constant (tn/k) for every partition, so no baseline
        # frame, no self-join, and no driver actions (the former
        # cur.count() + collect() pair cost two extra Spark jobs per run).
        joined = cur.select("partition_key", F.col("n").cast("double").alias("n"))
        tot = joined.agg(F.sum("n").alias("_tn"), F.count(F.lit(1)).alias("_k"))
        sm = joined.crossJoin(F.broadcast(tot)).select(
            "partition_key",
            "n",
            ((F.col("n") + 0.5) / (F.col("_tn") + 0.5 * F.col("_k"))).alias("p"),
            ((F.col("_tn") / F.col("_k") + 0.5) / (F.col("_tn") + 0.5 * F.col("_k"))).alias("q"),
        )
    else:
        # Null-SAFE full outer join: with plain equality a NULL
        # partition_key never matches its own baseline row, so one NULL
        # partition emitted TWO verdict rows (a spurious FAIL with
        # inflated psi from the unmatched cur side, plus a SKIPPED row
        # from the unmatched baseline side) and corrupted manifest
        # accounting for the extended suite.
        b = baseline.select(F.col("partition_key").alias("_bkey"), "base_n")
        joined = cur.join(
            b, cur["partition_key"].eqNullSafe(b["_bkey"]), "full_outer"
        ).select(
            F.coalesce(cur["partition_key"], F.col("_bkey")).alias("partition_key"),
            F.coalesce(F.col("n"), F.lit(0)).cast("double").alias("n"),
            F.coalesce(F.col("base_n"), F.lit(0)).cast("double").alias("base_n"),
        )
        tot = joined.agg(
            F.sum("n").alias("_tn"), F.sum("base_n").alias("_tb"), F.count(F.lit(1)).alias("_k")
        )
        sm = joined.crossJoin(F.broadcast(tot)).select(
            "partition_key",
            "n",
            ((F.col("n") + 0.5) / (F.col("_tn") + 0.5 * F.col("_k"))).alias("p"),
            ((F.col("base_n") + 0.5) / (F.col("_tb") + 0.5 * F.col("_k"))).alias("q"),
        )
    scores = sm.select(
        "partition_key",
        F.abs(F.log(F.col("p") / F.col("q"))).alias("psi"),
        ((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))).alias("psi_term"),
        F.col("n").cast("long").alias("n_obs"),
        F.lit(2).alias("n_buckets"),
    )
    flagged = flag_outliers(
        scores,
        score_col="psi",
        z_thresh=spec.config.get("z_thresh", 3.0),
        iqr_k=spec.config.get("iqr_k", 1.5),
        abs_thresh=spec.config.get("abs_thresh", 0.7),  # |ln p/q| 0.7 ~ 2x share shift
        min_gap=spec.config.get("min_gap", 0.1),
        noise_c=spec.config.get("noise_c", 3.0),
    )
    verdicts = verdict_frame(
        flagged,
        cid,
        "partition_key",
        fail_when=F.col("is_drifted"),
        skip_when=F.col("n_obs") < spec.min_rows,
        metric_cols=["psi", "psi_term", "n_obs", "z_score", "median_score"],
    )
    return CheckResult(
        violations=empty_violations(df), verdicts=verdicts, metrics=flagged, caches=[cur]
    )


def run_drift(df: DataFrame, spec: CheckSpec) -> CheckResult:
    part = spec.partition_col
    cid = spec.id
    col = spec.config.get("column", "content")
    bucket_width = spec.config.get("bucket_width", 100)
    mode = spec.config.get("mode", "length")  # 'length' | 'value' histogram
    score_col = spec.config.get("score", "psi")
    baseline = spec.config.get("baseline_df")  # frozen baseline (manifest) or None

    # The histogram is the ONLY thing that scans the big table, and the
    # score plan references it ~5x (partition list, bucket grid, baseline,
    # broadcast, join). It is O(partitions x buckets) rows — cache it so
    # the heavy aggregation runs exactly once; likewise the per-partition
    # scores (O(partitions) rows) feed both the verdict and metrics
    # branches. Without these two caches the check re-scanned the input
    # five times and anti-scaled with parallelism.
    hist = length_histogram(df, part, col, bucket_width, mode=mode).cache()
    if baseline is None and spec.config.get("require_baseline", False):
        # T1 warm-up semantics for external-baseline configs: with no
        # history yet (first rolling-baseline run / missing frozen
        # table), emit SKIPPED for every partition instead of silently
        # self-baselining — under gate_mode='absolute' a self-pooled
        # mixture would flag every heterogeneous partition on day one.
        per_part = hist.groupBy("partition_key").agg(F.sum("n").alias("n_obs"))
        verdicts = verdict_frame(
            per_part,
            cid,
            "partition_key",
            fail_when=F.lit(False),
            skip_when=F.lit(True),
            metric_cols=["n_obs"],
        )
        return CheckResult(
            violations=empty_violations(df),
            verdicts=verdicts,
            metrics=per_part,
            caches=[hist],
            hist=hist,
        )
    base = baseline if baseline is not None else global_baseline(hist)
    scores = drift_scores(hist, base).cache()
    flagged = flag_outliers(
        scores,
        score_col=score_col,
        z_thresh=spec.config.get("z_thresh", 3.0),
        iqr_k=spec.config.get("iqr_k", 1.5),
        abs_thresh=spec.config.get("abs_thresh", 0.25),
        min_gap=spec.config.get("min_gap", 0.1),
        noise_c=spec.config.get("noise_c", 3.0),
        gate_mode=spec.config.get("gate_mode", "relative"),
    )

    verdicts = verdict_frame(
        flagged,
        cid,
        "partition_key",
        fail_when=F.col("is_drifted"),
        skip_when=F.col("n_obs") < spec.min_rows,
        metric_cols=["psi", "ks", "n_obs", "z_score", "median_score"],
    )
    # Drift is a partition-level property — no per-file violation rows.
    # hist/scores caches are handed to the caller for unpersist once the
    # outputs are materialized (SuiteResult.unpersist) — without that,
    # every suite invocation (each streaming micro-batch, each bench
    # pass) leaked two cached plans for the session lifetime.
    return CheckResult(
        violations=empty_violations(df),
        verdicts=verdicts,
        metrics=flagged,
        caches=[hist, scores],
        hist=hist,
    )


def drift_attribution(
    hist: DataFrame, baseline: DataFrame, top_k: int = 3
) -> DataFrame:
    """Per-partition top-k buckets by PSI contribution — the WHY behind
    a drift FAIL (which length range gained/lost mass vs the baseline).

    Decomposes the exact PSI the scoring kernel computes: with the same
    (partition x bucket) grid and the same Laplace smoothing,
    term_b = (p_b - q_b) * ln(p_b / q_b) and sum_b term_b == psi
    (internal consistency pinned in tests). Everything is JVM column
    arithmetic over the pre-aggregated O(partitions x buckets) frame —
    no UDF, no scan of the source table; the ranking window partitions
    by partition_key (bounded by the bucket count, never a global
    funnel).

    CACHE THE INPUTS: this plan references ``hist`` four ways (partition
    list, bucket grid, join side, baseline derivation) and Spark does
    not reuse the aggregation exchange across differently-pruned
    references — an uncached hist re-scans the SOURCE table per
    reference. run_drift already passes its cached histogram; standalone
    callers should ``.cache()`` both frames first (they are
    O(partitions x buckets) rows — KBs by construction).
    """
    from .base import null_safe_join

    parts = hist.select("partition_key").distinct()
    buckets = hist.select("bucket").union(baseline.select("bucket")).distinct()
    grid = parts.crossJoin(F.broadcast(buckets))
    joined = (
        null_safe_join(grid, hist, ["partition_key", "bucket"], "left")
        .join(F.broadcast(baseline), on="bucket", how="left")
        .select(
            "partition_key",
            "bucket",
            F.coalesce(F.col("n"), F.lit(0)).cast("double").alias("n"),
            F.coalesce(F.col("base_n"), F.lit(0)).cast("double").alias("base_n"),
        )
    )
    # per-partition totals _tn and grid width _k mirror the kernel's
    # obs.sum() / len(obs); the baseline total _tb is global (the grid
    # carries every baseline bucket for every partition, so the kernel's
    # base.sum() is the same constant per partition).
    tot = joined.groupBy("partition_key").agg(
        F.sum("n").alias("_tn"), F.count(F.lit(1)).alias("_k")
    )
    btot = baseline.agg(F.sum("base_n").alias("_tb"))
    sm = (
        null_safe_join(joined, tot, ["partition_key"])
        .crossJoin(F.broadcast(btot))
        .select(
            "partition_key",
            "bucket",
            "n",
            "base_n",
            ((F.col("n") + 0.5) / (F.col("_tn") + 0.5 * F.col("_k"))).alias("p"),
            ((F.col("base_n") + 0.5) / (F.col("_tb") + 0.5 * F.col("_k"))).alias("q"),
        )
    )
    terms = sm.select(
        "partition_key",
        "bucket",
        "n",
        "base_n",
        ((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))).alias("psi_term"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("partition_key").orderBy(
        F.col("psi_term").desc(), F.col("bucket").asc()
    )
    return (
        terms.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            "partition_key", "rank", "bucket",
            F.col("n").cast("long").alias("n"),
            F.col("base_n").cast("long").alias("base_n"),
            "psi_term",
        )
    )


def drift_examples(
    df: DataFrame,
    attribution: DataFrame,
    partition_col: str,
    col: str = "content",
    bucket_width: int = 100,
    per_bucket: int = 5,
    mode: str = "length",
    id_cols: tuple[str, str, str] = ("repo", "path", "commit"),
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Deterministic example ROWS for the buckets drift_attribution blames
    — the last link of the triage chain (scorecard → incidents →
    attribution → concrete files a human can open).

    Drift is a partition-level check and emits no violation rows; this
    recovers row evidence with ONE extra pruned scan: rows re-bucketed
    exactly as length_histogram, inner-joined (broadcast — attribution is
    O(partitions x top_k) rows) to the blamed buckets, then sampled with
    the same map-only hash-threshold rule as plans/manifest.py
    sample_violations: keep iff draw(identity) < per_bucket / n_bucket.
    No per-group rank window — a 10^10-row blamed bucket costs the same
    per row as a 10-row one; groups with n <= per_bucket keep every row;
    retries/speculation/repartitioning keep the SAME rows.

    ``hash_fn='xxhash64'`` is the production draw; ``'sha256'`` (first 13
    hex digits / 16^13 — 52 bits, exact in a double) is the
    cross-engine-reproducible twin the DuckDB oracle mirrors, same plan
    shape (the minhash/split-leakage precedent).

    A blamed bucket can be one the partition LOST mass from (p << q,
    positive psi_term, zero matching rows) — by nature it has no rows to
    exemplify; filter the attribution to gained-mass buckets (n > 0) if
    every returned group must be non-empty.
    """
    if mode == "length":
        measure = F.length(F.col(col))
    elif mode == "value":
        measure = F.col(col)
    else:
        raise ValueError(f"mode must be 'length' or 'value', got {mode!r}")
    ids = list(id_cols)
    rows = df.filter(F.col(col).isNotNull()).select(
        *ids,
        F.col(partition_col).cast("string").alias("partition_key"),
        F.floor(measure / bucket_width).cast("long").alias("bucket"),
        measure.cast("long").alias("measured"),
    )
    att = attribution.select(
        "partition_key", "bucket", F.col("n").alias("_n_bucket"), "psi_term"
    )
    joined = null_safe_join(
        rows, att, ["partition_key", "bucket"], "inner", broadcast_right=True
    )
    rate = F.least(
        F.lit(1.0), F.lit(float(per_bucket)) / F.greatest(F.col("_n_bucket"), F.lit(1))
    )
    if hash_fn == "xxhash64":
        draw = F.pmod(F.xxhash64(*ids), F.lit(1_000_000)) / F.lit(1_000_000.0)
    elif hash_fn == "sha256":
        hex13 = F.substring(F.sha2(F.concat_ws("|", *ids), 256), 1, 13)
        draw = F.conv(hex13, 16, 10).cast("double") / F.lit(float(16**13))
    else:
        raise ValueError(f"hash_fn must be 'xxhash64' or 'sha256', got {hash_fn!r}")
    return joined.where(draw < rate).select(
        *ids, "partition_key", "bucket", "measured", "psi_term"
    )


def sweep_baseline(
    df: DataFrame, cols: dict[str, float], materialize: bool = False
) -> DataFrame:
    """Pooled multi-column histogram (column, bucket, base_n) — the
    persistable external baseline for multi_column_drift. Rows are
    ADDITIVE across runs (sum base_n per (column, bucket)), so a parquet
    store of per-run rows merges by plain aggregation — the same
    mergeable-sketch story as the drift hist_store / embedding_histogram.
    One scan (the same exploded histogram shuffle as the sweep)."""
    hist = _sweep_histogram(df, None, cols)
    out = hist.groupBy("column", "bucket").agg(F.sum("n").alias("base_n"))
    return out.localCheckpoint() if materialize else out


def _sweep_histogram(
    df: DataFrame, partition_col: str | None, cols: dict[str, float]
) -> DataFrame:
    """(partition_key?, column, bucket, n) from one exploded scan; the
    measure is profile_table's _value_expr (value / length / epoch) so
    suggest_sweep's widths bucket consistently."""
    from .profile import _value_expr

    fields = {f.name: f for f in df.schema.fields}
    entries = []
    for c in sorted(cols):
        w = cols[c]
        measure = _value_expr(fields[c])
        if measure is None:
            raise ValueError(f"column {c!r} has an unmeasurable type for drift bucketing")
        entries.append(
            F.struct(
                F.lit(c).alias("column"),
                F.when(
                    F.col(c).isNotNull(),
                    F.floor(measure / F.lit(float(w))).cast("long"),
                ).alias("bucket"),
            )
        )
    keys = (
        [F.col(partition_col).cast("string").alias("partition_key")]
        if partition_col is not None
        else []
    )
    return (
        df.select(*keys, F.explode(F.array(*entries)).alias("_e"))
        .select(
            *([c for c in ("partition_key",) if partition_col is not None]),
            F.col("_e.column").alias("column"),
            F.col("_e.bucket").alias("bucket"),
        )
        .filter(F.col("bucket").isNotNull())
        .groupBy(*([c for c in ("partition_key",) if partition_col is not None]), "column", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def multi_column_drift(
    df: DataFrame,
    partition_col: str,
    cols: dict[str, float],
    baseline: DataFrame | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Per-(partition, column) PSI for MANY columns from ONE scan.

    Running the single-column drift check per column costs one full
    table pass each — at 100 TB a 10-column sweep is 10 scans. This
    sweep explodes a k-entry (column, bucket) struct array per row
    (map-side, k small) into ONE partial-aggregated shuffle of
    O(partitions x columns x buckets) rows; every downstream frame is
    derived from that histogram, never the source. String columns are
    bucketed by length (the content dimension), numeric columns by
    value; NULLs drop per column (a column's null-rate is the stats
    check's concern). The histogram feeds four differently-pruned
    consumers, so it is localCheckpoint-ed under the same rule as
    checks/fd.py (``materialize=False`` keeps the pure plan).

    Smoothing/PSI arithmetic matches the drift kernel per column
    (same grid, same Laplace terms — the drift_attribution identity);
    psi is rounded to 6dp so results are engine- and
    partitioning-exact. Returns (partition_key, column, n_obs,
    n_buckets, psi).

    ``baseline``: optional external (column, bucket, base_n) frame
    (sweep_baseline rows, summed across runs) — each column scores
    against the PERSISTED distribution instead of this run's pool,
    which is REQUIRED to catch a wholesale shift (every partition of a
    column moving together leaves the in-batch pool centered on the
    shifted data and the relative gate blind — same argument as
    run_embedding_drift's external mode); pair with
    gate_mode='absolute' in run_drift_sweep. The grid support is the
    UNION of today's and the baseline's buckets, so brand-new mass is
    never invisible.
    """
    hist = _sweep_histogram(df, partition_col, cols)
    if materialize:
        hist = hist.localCheckpoint()
    if baseline is not None:
        base = baseline.groupBy("column", "bucket").agg(F.sum("base_n").alias("base_n"))
        grid = (
            hist.select("column", "bucket")
            .unionByName(base.select("column", "bucket"))
            .distinct()
        )
    else:
        base = hist.groupBy("column", "bucket").agg(F.sum("n").alias("base_n"))
        grid = base.select("column", "bucket")  # pooled support covers every partition's
    parts = hist.select("partition_key").distinct()
    nobs = hist.groupBy("partition_key", "column").agg(F.sum("n").alias("n_obs"))
    btot = base.groupBy("column").agg(F.sum("base_n").alias("n_total"))
    bcols = grid.groupBy("column").agg(F.count(F.lit(1)).alias("b"))
    f = (
        null_safe_join(
            parts.crossJoin(F.broadcast(grid)),
            hist, ["partition_key", "column", "bucket"], "left",
        )
        .join(F.broadcast(base), ["column", "bucket"], "left")
        .na.fill({"n": 0, "base_n": 0})
        .join(F.broadcast(bcols), "column")
        .transform(lambda d: null_safe_join(d, nobs, ["partition_key", "column"], "left"))
        .na.fill({"n_obs": 0})
        .join(F.broadcast(btot), "column")
    )
    p = (F.col("n") + 0.5) / (F.col("n_obs") + 0.5 * F.col("b"))
    q = (F.col("base_n") + 0.5) / (F.col("n_total") + 0.5 * F.col("b"))
    return (
        f.select(
            "partition_key", "column", "n_obs", "b",
            ((p - q) * F.log(p / q)).alias("term"),
        )
        .groupBy("partition_key", "column", "n_obs", F.col("b").alias("n_buckets"))
        .agg(F.round(F.sum("term"), 6).alias("psi"))
    )


def run_drift_sweep(df: DataFrame, spec: CheckSpec) -> CheckResult:
    """Declarable multi-column drift sweep: one scan for every declared
    column, verdict per partition from its flagged columns.

    Flagging is the single-column check's K4 machinery applied per
    column — ``flag_outliers(by=['column'])`` computes peer statistics
    (median/quartiles/z) WITHIN each column, so a partition is flagged
    only where it is an outlier among its peers on that column AND
    clears the median + chi-square noise gate. An absolute gate on the
    pooled in-batch baseline would mark every partition that merely
    differs from the pool mixture (a clean partition next to one
    extreme partition fails — caught by the fixture); the relative gate
    is the correct default for self-baselined sweeps, with
    ``gate_mode='absolute'`` available for external-baseline semantics.

    Columns with fewer than ``min_rows`` non-null values in a partition
    are excluded before flagging; a partition with NO eligible column
    is SKIPPED. Verdict FAILs when ANY column is flagged; metrics carry
    n_flagged + the worst flagged column (ties break to the
    lexicographically first column, engine-exact on the 6dp psi).

    config: ``columns`` ({name: bucket_width}, required), plus the
    flag_outliers knobs (``z_thresh``/``iqr_k``/``abs_thresh``/
    ``min_gap``/``noise_c``/``gate_mode``) and ``materialize`` (True).
    """
    part = spec.partition_col
    cols = dict(spec.config["columns"])
    # baseline_df: runtime-injected external (column, bucket, base_n)
    # frame (sweep_baseline rows summed across runs) — excluded from the
    # check id like every injected frame; pair with gate_mode='absolute'
    # to catch wholesale shifts the in-batch relative gate cannot see.
    scores = multi_column_drift(
        df,
        part,
        cols,
        baseline=spec.config.get("baseline_df"),
        materialize=spec.config.get("materialize", True),
    )
    eligible = scores.where(F.col("n_obs") >= spec.min_rows)
    flagged = flag_outliers(
        eligible,
        score_col="psi",
        z_thresh=spec.config.get("z_thresh", 3.0),
        iqr_k=spec.config.get("iqr_k", 1.5),
        abs_thresh=spec.config.get("abs_thresh", 0.25),
        min_gap=spec.config.get("min_gap", 0.1),
        noise_c=spec.config.get("noise_c", 3.0),
        gate_mode=spec.config.get("gate_mode", "relative"),
        by=["column"],
    )
    bad = flagged.where(F.col("is_drifted"))
    worst = bad.groupBy("partition_key").agg(F.max("psi").alias("worst_psi"))
    agg = (
        null_safe_join(bad, worst, ["partition_key"])
        .groupBy("partition_key")
        .agg(
            F.count(F.lit(1)).alias("n_flagged"),
            F.max("psi").alias("worst_psi"),
            F.min(F.when(F.col("psi") == F.col("worst_psi"), F.col("column"))).alias(
                "worst_column"
            ),
        )
    )
    parts = eligible.groupBy("partition_key").agg(F.max("n_obs").alias("n_obs"))
    all_parts = scores.select("partition_key").distinct()
    per_part = null_safe_join(
        all_parts,
        null_safe_join(parts, agg, ["partition_key"], "left"),
        ["partition_key"],
        "left",
    ).select(
        "partition_key",
        "n_obs",
        F.coalesce("n_flagged", F.lit(0)).alias("n_flagged"),
        "worst_psi",
    )
    verdicts = verdict_frame(
        per_part,
        spec.id,
        "partition_key",
        fail_when=F.col("n_flagged") > 0,
        skip_when=F.col("n_obs").isNull(),
        metric_cols=["n_flagged", "worst_psi", "n_obs"],
    )
    return CheckResult(violations=empty_violations(df), verdicts=verdicts, metrics=flagged)


def run_embedding_drift(df: DataFrame, spec: CheckSpec) -> CheckResult:
    """Embedding-space distribution drift as a declarable check.

    Wraps ``operators/similarity.py embedding_drift`` (fixed ±1
    hyperplane projections, integer-micro quantized; per-partition
    worst-plane PSI vs the pooled baseline) in the verdict envelope: a
    partition whose vector distribution shifted — a model version bump,
    re-normalization, or corpus change — FAILs when its psi exceeds
    ``max_psi``. Absolute gate by design: embedding drift is usually
    GLOBAL (every partition moves when the model changes), which the
    peer-relative median gate is structurally blind to — same argument
    as drift's gate_mode='absolute'.

    config: ``vec_col`` (default 'embedding'), ``dim`` (64),
    ``n_planes`` (8), ``bucket_micro`` (500000), ``table`` (7),
    ``max_psi`` (0.25), ``baseline_df`` (runtime-injected external
    (plane, bucket, base_n) frame from ``embedding_histogram`` — the
    run-over-run mode that catches GLOBAL drift; without it the pooled
    in-batch baseline only sees same-batch divergence). ``spec.min_rows``
    guards the per-partition vector count.
    """
    from ..operators.similarity import embedding_drift

    c = spec.config
    scores = embedding_drift(
        df,
        spec.partition_col,
        vec_col=c.get("vec_col", "embedding"),
        dim=int(c.get("dim", 64)),
        n_planes=int(c.get("n_planes", 8)),
        bucket_micro=int(c.get("bucket_micro", 500_000)),
        table=int(c.get("table", 7)),
        baseline=c.get("baseline_df"),
    )
    verdicts = verdict_frame(
        scores,
        spec.id,
        "partition_key",
        fail_when=F.col("psi") > float(c.get("max_psi", 0.25)),
        skip_when=F.col("n_obs") < spec.min_rows,
        metric_cols=["psi", "worst_plane", "n_obs"],
    )
    return CheckResult(violations=empty_violations(df), verdicts=verdicts, metrics=scores)
