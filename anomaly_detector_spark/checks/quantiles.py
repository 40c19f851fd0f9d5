"""Mergeable quantile sketches (t-digest) behind the stats interface.

``percentile_approx`` answers "p50/p99 within this run"; the t-digest
SKETCH answers the incremental question — store one tiny centroid-array
sketch per partition next to the manifest, then merge sketches across
runs / partitions for global quantiles WITHOUT rescanning committed
history. The mergeable form is what keeps the reference's median-gate
semantics (/root/reference/algo/error_calculation.py:10 — flag only
errors above the median) tractable at 10^12 rows with incremental
resume: the same design this repo already ships for distinct counts
(checks/stats.py hll_sketches — SURVEY §4.2's promised quantile twin).

Scale design: a two-level reduction, all Python vectorized over Arrow
batches —

1. ``mapInPandas`` builds one partial digest per (partition value,
   Arrow batch): the big column never shuffles; what rides the exchange
   is O(partitions x delta) centroid doubles per batch;
2. ``groupBy(partition_key).applyInPandas`` merges the partials into
   one digest per partition (sketch rows are KB-sized regardless of
   data volume).

The digest is the classic MERGING t-digest (Dunning & Ertl,
"Computing extremely accurate quantiles using t-digests") with the k1
(arcsin) scale function: centroid weight capacity shrinks near q=0/1,
so tail quantiles (p99) stay accurate while the middle compresses.
Pure-numpy, deterministic given the input centroid multiset (inputs
are sorted by mean before every merge pass).
"""

from __future__ import annotations

import sys
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .base import CheckResult, CheckSpec, empty_violations, verdict_frame

# Ship this module BY VALUE inside the kernels (same no-footgun
# guarantee as operators/loads.py): executors without the package on
# PYTHONPATH (spark-submit without --py-files) still run them.
try:  # pragma: no cover - trivial registration
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:
    pass

SKETCH_SCHEMA = (
    "partition_key string, means array<double>, weights array<double>, n_rows long"
)


def td_compress(means, weights, delta: float = 200.0):
    """Merge + compress centroid arrays into <= ~delta centroids (k1 scale).

    Shared by the Spark kernels and the test oracle — one implementation,
    two call sites, so the oracle IS the kernel's math.
    """
    import numpy as np

    m = np.asarray(means, dtype=np.float64)
    w = np.asarray(weights, dtype=np.float64)
    if m.size == 0:
        return m, w
    order = np.argsort(m, kind="mergesort")
    m, w = m[order], w[order]
    total = float(w.sum())
    if total <= 0:
        return np.empty(0), np.empty(0)

    two_pi = 2.0 * np.pi

    def k(q: float) -> float:  # k1 scale function
        return (delta / two_pi) * np.arcsin(2.0 * q - 1.0)

    def q_limit(q0: float) -> float:  # inverse: largest q with k(q) <= k(q0)+1
        target = k(q0) + 1.0
        if target >= (delta / two_pi) * (np.pi / 2.0):
            return 1.0
        return (np.sin(target * two_pi / delta) + 1.0) / 2.0

    out_m: list[float] = []
    out_w: list[float] = []
    q0 = 0.0
    lim = q_limit(q0)
    cur_m, cur_w = float(m[0]), float(w[0])
    for i in range(1, m.size):
        proposed = cur_w + float(w[i])
        if q0 + proposed / total <= lim:
            cur_m = (cur_m * cur_w + float(m[i]) * float(w[i])) / proposed
            cur_w = proposed
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            q0 += cur_w / total
            lim = q_limit(q0)
            cur_m, cur_w = float(m[i]), float(w[i])
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


def td_quantile(means, weights, q: float) -> float:
    """Quantile estimate from a compressed digest (midpoint interpolation)."""
    import numpy as np

    m = np.asarray(means, dtype=np.float64)
    w = np.asarray(weights, dtype=np.float64)
    if m.size == 0:
        return float("nan")
    if m.size == 1:
        return float(m[0])
    total = w.sum()
    target = q * total
    # cumulative weight at each centroid's midpoint
    mid = np.cumsum(w) - w / 2.0
    if target <= mid[0]:
        return float(m[0])
    if target >= mid[-1]:
        return float(m[-1])
    return float(np.interp(target, mid, m))


def tdigest_sketches(
    df: DataFrame,
    partition_col: str,
    col: str = "content",
    delta: float = 200.0,
    use_length: bool = True,
) -> DataFrame:
    """Per-partition t-digest sketches over ``length(col)`` (or ``col``
    itself with ``use_length=False`` for numeric columns).

    Returns (partition_key, means, weights, n_rows) — one row per
    partition, mergeable across runs via ``tdigest_union`` /
    ``global_quantiles`` exactly like the HLL sketch rows.
    """
    d = delta
    value = F.length(F.col(col)) if use_length else F.col(col)
    slim = df.filter(F.col(col).isNotNull()).select(
        F.col(partition_col).cast("string").alias("partition_key"),
        value.cast("double").alias("_v"),
    )

    def batch_kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one partial digest per (partition value, Arrow batch): the
        # values column never leaves the scan task.
        import numpy as np  # noqa: F401

        for pdf in it:
            if pdf.empty:
                continue
            rows = {"partition_key": [], "means": [], "weights": [], "n_rows": []}
            for key, grp in pdf.groupby("partition_key", dropna=False, sort=False):
                v = grp["_v"].to_numpy(dtype="float64")
                m, w = td_compress(v, [1.0] * len(v), d)
                rows["partition_key"].append(None if pd.isna(key) else key)
                rows["means"].append(list(m))
                rows["weights"].append(list(w))
                rows["n_rows"].append(len(v))
            yield pd.DataFrame(rows)

    partials = slim.mapInPandas(batch_kernel, SKETCH_SCHEMA)

    def merge_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        key = pdf["partition_key"].iloc[0]
        m = np.concatenate([np.asarray(x, dtype="float64") for x in pdf["means"]])
        w = np.concatenate([np.asarray(x, dtype="float64") for x in pdf["weights"]])
        cm, cw = td_compress(m, w, d)
        return pd.DataFrame(
            {
                "partition_key": [key],
                "means": [list(cm)],
                "weights": [list(cw)],
                "n_rows": [int(pdf["n_rows"].sum())],
            }
        )

    # Salted TREE merge, not a flat per-key merge: a 90%-hot partition
    # funnels O(scan tasks x batches) partial digests into one merge
    # task — measured 1.44x slower than uniform data at 32M rows
    # (tools/skew_bench.py), and unboundedly worse as the corpus grows.
    # Pre-merging by (key, scan-task-id % 64) keeps every merge task at
    # O(P/64) partials and caps the final per-key merge at 64 digests,
    # independent of corpus size. t-digest merging is associative up to
    # compression error; digest-vs-exact agreement stays pinned by the
    # 5% tolerance tests (tests/test_manifest.py, tests/test_checks.py).
    salted = partials.withColumn(
        "_salt", F.pmod(F.spark_partition_id(), F.lit(64))
    )

    def pre_merge(pdf: pd.DataFrame) -> pd.DataFrame:
        return merge_kernel(pdf.drop(columns=["_salt"]))

    pre = salted.groupBy("partition_key", "_salt").applyInPandas(
        pre_merge, SKETCH_SCHEMA
    )
    return pre.groupBy("partition_key").applyInPandas(merge_kernel, SKETCH_SCHEMA)


def tdigest_union(sketches: DataFrame, delta: float = 200.0) -> DataFrame:
    """Merge any frame of sketch rows into ONE global digest row.

    Sketch rows are KB-sized regardless of data volume, so the single
    final task is driver-scale by construction (same shape as
    hll_union_estimate's one-row aggregate).
    """
    d = delta

    def merge_all(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        m = np.concatenate(
            [np.asarray(x, dtype="float64") for x in pdf["means"]]
        ) if len(pdf) else np.empty(0)
        w = np.concatenate(
            [np.asarray(x, dtype="float64") for x in pdf["weights"]]
        ) if len(pdf) else np.empty(0)
        cm, cw = td_compress(m, w, d)
        return pd.DataFrame(
            {
                "partition_key": ["__global__"],
                "means": [list(cm)],
                "weights": [list(cw)],
                "n_rows": [int(pdf["n_rows"].sum()) if len(pdf) else 0],
            }
        )

    # a literal int in groupBy resolves as a COLUMN ORDINAL — group on an
    # explicit constant column instead
    return (
        sketches.withColumn("_g", F.lit(1)).groupBy("_g").applyInPandas(merge_all, SKETCH_SCHEMA)
    )


def quantiles_from_sketches(
    sketches: DataFrame, qs: list[float], delta: float = 200.0
) -> DataFrame:
    """One row of global quantile estimates (q_50, q_99, ...) + n_rows
    from any frame of sketch rows."""
    d, qs_b = delta, list(qs)
    out_schema = ", ".join(f"q_{str(q).replace('.', '_')} double" for q in qs_b)
    out_schema = f"{out_schema}, n_rows long"

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        m = np.concatenate(
            [np.asarray(x, dtype="float64") for x in pdf["means"]]
        ) if len(pdf) else np.empty(0)
        w = np.concatenate(
            [np.asarray(x, dtype="float64") for x in pdf["weights"]]
        ) if len(pdf) else np.empty(0)
        cm, cw = td_compress(m, w, d)
        row = {
            f"q_{str(q).replace('.', '_')}": [td_quantile(cm, cw, q)] for q in qs_b
        }
        row["n_rows"] = [int(pdf["n_rows"].sum()) if len(pdf) else 0]
        return pd.DataFrame(row)

    return sketches.withColumn("_g", F.lit(1)).groupBy("_g").applyInPandas(kernel, out_schema)


def partition_quantiles(sketches: DataFrame, qs: list[float]) -> DataFrame:
    """Per-ROW quantile estimates from sketch rows (one output row per
    input sketch row) — the per-partition companion of
    ``quantiles_from_sketches``. Sketch rows are KB-sized, so this is a
    narrow map over tiny data regardless of original volume."""
    qs_b = list(qs)
    cols = ", ".join(f"q_{str(q).replace('.', '_')} double" for q in qs_b)
    out_schema = f"partition_key string, {cols}, n_rows long"

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            if pdf.empty:
                continue
            rows = {"partition_key": list(pdf["partition_key"])}
            for q in qs_b:
                rows[f"q_{str(q).replace('.', '_')}"] = [
                    td_quantile(
                        np.asarray(m, dtype="float64"), np.asarray(w, dtype="float64"), q
                    )
                    for m, w in zip(pdf["means"], pdf["weights"])
                ]
            rows["n_rows"] = list(pdf["n_rows"])
            yield pd.DataFrame(rows)

    return sketches.mapInPandas(kernel, out_schema)


QD_QS = (0.25, 0.5, 0.75, 0.99)


def run_quantile_drift(df: DataFrame, spec: CheckSpec) -> CheckResult:
    """Quantile-vector drift: each partition's (p25, p50, p75, p99) of
    content length vs a baseline, scored as the max absolute quantile
    shift in units of the baseline IQR.

    The quantile twin of run_drift's histogram PSI/KS — sensitive to
    location/scale shifts that rebucket gently (a +30% length drift
    moves every quantile but can spread thinly over histogram buckets),
    and the constraint form Deequ/GE users express directly
    ("p99 length within X of baseline").

    Backends (config["backend"]):
      * "exact" (default): one groupBy aggregate of exact percentiles —
        SQL-oracle-able, but percentile buffers values per group
        (ObjectHashAggregate), so it is the small/medium-scale and
        oracle path;
      * "sketch": per-partition t-digest sketches (mapInPandas partials
        + per-key merge; the value column never rides a shuffle). The
        10^12-row path, and the INCREMENTAL one: persisted sketch rows
        from prior runs can serve as the frozen baseline without
        rescanning history. Digest-vs-exact agreement is pinned in
        tests.

    Baseline: config["baseline_df"] (a 1-row frame with q_* columns,
    e.g. frozen quantiles from a reference run), else the CROSS-PARTITION
    MEDIAN of each quantile. The robust default matters: a pooled
    (row-weighted) baseline is polluted by the very partition that
    drifted — one partition holding >1% of rows and shifted by S moves
    the pooled p99 by ~S, so every HEALTHY partition scores ~S/IQR too
    and the median gate correctly concludes nothing stands out (verified
    by construction in tests). The median-of-partitions baseline is
    what "which partitions deviate from the fleet?" actually asks.
    Flagging reuses the K4 median-gate machinery (drift.flag_outliers).
    """
    from .drift import flag_outliers

    part = spec.partition_col
    col = spec.config.get("column", "content")
    use_length = spec.config.get("use_length", True)
    backend = spec.config.get("backend", "exact")
    qnames = [f"q_{str(q).replace('.', '_')}" for q in QD_QS]

    caches: list[DataFrame] = []
    if backend == "sketch":
        sk = tdigest_sketches(df, part, col, use_length=use_length).cache()
        caches.append(sk)
        per = partition_quantiles(sk, list(QD_QS)).withColumnRenamed("n_rows", "n_obs")
        base_src = spec.config.get("baseline_df")
        if base_src is not None:
            base = base_src.select(*[F.col(qn).alias(f"b_{qn}") for qn in qnames])
        else:
            base = None  # derived from `per` below (cross-partition median)
    else:
        value = F.length(F.col(col)) if use_length else F.col(col)
        slim = df.filter(F.col(col).isNotNull()).select(
            F.col(part).cast("string").alias("partition_key"),
            value.cast("double").alias("_v"),
        )
        pexprs = [
            F.expr(f"percentile(_v, {q})").alias(qn) for q, qn in zip(QD_QS, qnames)
        ]
        per = slim.groupBy("partition_key").agg(*pexprs, F.count(F.lit(1)).alias("n_obs"))
        base_src = spec.config.get("baseline_df")
        if base_src is not None:
            base = base_src.select(*[F.col(qn).alias(f"b_{qn}") for qn in qnames])
        else:
            base = None
    if base is None:
        # robust default: cross-partition median of each quantile. `per`
        # is O(partitions) rows, so this 1-row aggregate is trivially
        # cheap; in the sketch backend it also never rescans the input.
        base = per.agg(
            *[F.expr(f"percentile({qn}, 0.5)").alias(f"b_{qn}") for qn in qnames]
        )

    joined = per.crossJoin(F.broadcast(base))
    iqr_b = F.greatest(F.col("b_q_0_75") - F.col("b_q_0_25"), F.lit(1.0))
    shift = F.greatest(*[F.abs(F.col(qn) - F.col(f"b_{qn}")) for qn in qnames])
    scores = joined.select(
        "partition_key",
        (shift / iqr_b).alias("qd"),
        F.col("q_0_5"),
        F.col("q_0_99"),
        F.col("n_obs").cast("long").alias("n_obs"),
        F.lit(2).alias("n_buckets"),
    )
    flagged = flag_outliers(
        scores,
        score_col="qd",
        z_thresh=spec.config.get("z_thresh", 3.0),
        iqr_k=spec.config.get("iqr_k", 1.5),
        abs_thresh=spec.config.get("abs_thresh", 0.5),  # half a baseline IQR
        min_gap=spec.config.get("min_gap", 0.1),
        noise_c=spec.config.get("noise_c", 3.0),
    )
    verdicts = verdict_frame(
        flagged,
        spec.id,
        "partition_key",
        fail_when=F.col("is_drifted"),
        skip_when=F.col("n_obs") < spec.min_rows,
        metric_cols=["qd", "q_0_5", "q_0_99", "n_obs", "z_score", "median_score"],
    )
    return CheckResult(
        violations=empty_violations(df), verdicts=verdicts, metrics=flagged, caches=caches
    )
