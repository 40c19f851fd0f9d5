"""K-Minimum-Values sketches: cross-run distinct-set ALGEBRA.

The sketch family so far answers union-distincts (HLL), quantiles
(t-digest), heavy hitters (top-k), and per-key membership (bloom). KMV
adds the missing SET operations: from two O(k)-row sketches of two key
sets — yesterday's run and today's — estimate |A|, |B|, |A ∪ B|,
|A ∩ B|, Jaccard, and the NOVELTY |B \\ A| ("how many of today's keys
are genuinely new"), all without rescanning either run. This is the
set-level complement to the bloom filter's per-key answer: bloom tells
you WHICH keys were seen before; KMV tells you HOW MANY, with a sound
estimator, from a fixed-size summary.

Method (classic KMV / bottom-k, Bar-Yossef et al.): hash every distinct
key to a uniform draw u in [0, 1) and keep the k smallest distinct
draws per partition. The k-th smallest value u_(k) estimates density:
D ≈ (k-1) / u_(k), with relative error ~ 1 / sqrt(k - 2). Set algebra
composes because the union's bottom-k is computable from the two
sketches alone (bottom-k of the merged rows), and each union-sketch
member can be tested for membership in either side's sketch exactly —
the matched fraction times the union estimate is the intersection
estimate. A partition with fewer than k distinct keys keeps them ALL:
the sketch degrades gracefully to exact set algebra (``exact`` flag).

Relational representation, same contract as the bloom store
(checks/membership.py): one row per retained draw
(partition_key, u, k, mode) — never a driver-side object. Parameters
ride the rows and MIXED-PARAMETER stores are rejected: merging sketches
built with different k or hash modes silently corrupts the estimator.
Merge = distinct + bottom-k over unioned rows (pure column ops,
idempotent — re-merging a sketch is a no-op, so at-least-once appended
store rows never corrupt estimates).

Determinism across engines: the draw is derived so any ANSI oracle
reproduces it bit-for-bit. In ``sha256`` mode u = int(first 13 hex
chars of sha256(key)) / 16^13 — 52 bits, exact in a double, and 16^13
is a power of two so the division is exact; DuckDB re-derives it with
the strpos digit-sum trick the bloom oracle uses. The ``xxhash64``
production mode maps the signed hash to [0, 1) by scale-and-shift —
deterministic in Spark, cheaper, not SQL-derivable (the sha mode is
its plan-identical oracle twin, the minhash/simhash pattern).

Scale shape: the build is one narrow projection + a distinct-style
map-side-combined aggregate + the engine's ``two_phase_topk`` bottom-k
(per-input-partition local bottom-k first — no single-reducer funnel;
result partitioning-invariant). With a PRIOR run's sketch available,
``prefilter_max_u`` pushes yesterday's u_(k) (times a safety factor)
down to the scan as a codegen'd predicate, so a rebuild over 10^12
keys ships only the ~k × safety survivors instead of every distinct
key — the cross-run sketch pays for its own refresh. All estimate /
merge / set-stats inputs are O(k) rows per partition; every join in
the algebra is sketch-vs-sketch.

Reference tie-in: the reference has no sketch machinery (single-node
pandas keeps raw series, /root/reference/algo/operator.py:130-152);
this exists for the 10^12-row reframing where "how much of today is
new" must come from summaries, not rescans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "kmv_u",
    "kmv_sketch",
    "kmv_estimate",
    "kmv_merge",
    "kmv_set_stats",
    "read_store",
    "run_novelty",
]

_SEP = "\x1f"  # unit separator, same key framing as checks/membership.py


def kmv_u(key: Column, hash_fn: str = "xxhash64") -> Column:
    """Uniform draw in [0, 1) from a key column. ``sha256`` mode is
    exact 52-bit and SQL-rederivable; ``xxhash64`` is the cheap
    production default (scale-and-shift of the signed hash)."""
    if hash_fn == "xxhash64":
        return F.xxhash64(key).cast("double") / F.lit(float(2**64)) + F.lit(0.5)
    if hash_fn == "sha256":
        hx = F.sha2(key.cast("string"), 256)
        return F.conv(F.substring(hx, 1, 13), 16, 10).cast("double") / F.lit(
            float(16**13)
        )
    raise ValueError(f"unknown hash_fn {hash_fn!r}: use xxhash64 | sha256")


def _check_params(sk: DataFrame, what: str) -> None:
    p = sk.select("k", "mode").distinct().collect()
    if len(p) > 1:
        raise ValueError(
            f"{what}: mixed KMV parameters {sorted((r['k'], r['mode']) for r in p)}; "
            "sketches built with different k or hash modes cannot be combined"
        )


def kmv_sketch(
    df: DataFrame,
    key_cols: list[str],
    partition_col: str | None = None,
    k: int = 256,
    hash_fn: str = "xxhash64",
    prefilter_max_u: float | None = None,
) -> DataFrame:
    """Build per-partition KMV sketches: (partition_key, u, k, mode),
    the k smallest distinct draws of the key set.

    ``prefilter_max_u``: scan-level pushdown for REBUILDS — pass a
    prior sketch's max u times a safety factor (>= the true final
    u_(k), e.g. 2x yesterday's unless the key set shrank by half) and
    the codegen'd ``u <= threshold`` predicate drops almost every row
    before the aggregate. Sound whenever the threshold is >= the final
    u_(k) (the kept rows are exactly the same); a too-tight threshold
    under-fills the sketch, which is detectable (n_kept < k while the
    unfiltered distinct count is >= k) — prefer generous factors.
    """
    from ..operators.similarity import two_phase_topk

    key = F.concat_ws(_SEP, *[F.col(c).cast("string") for c in key_cols])
    pk = (
        F.col(partition_col).cast("string")
        if partition_col
        else F.lit("_all")
    )
    base = df.select(pk.alias("partition_key"), kmv_u(key, hash_fn).alias("u"))
    if prefilter_max_u is not None:
        base = base.filter(F.col("u") <= float(prefilter_max_u))
    dedup = base.distinct()
    kept = two_phase_topk(
        dedup, k, group_col="partition_key", order_desc="u", tie_col="u",
        descending=False,
    ).drop("rank")
    return kept.select(
        "partition_key", "u", F.lit(int(k)).alias("k"), F.lit(hash_fn).alias("mode")
    )


def kmv_estimate(sk: DataFrame) -> DataFrame:
    """Distinct-count estimate per partition from sketch rows:
    (partition_key, n_kept, est_distinct, exact). ``exact`` partitions
    kept their whole key set (fewer than k distinct draws)."""
    _check_params(sk, "kmv_estimate")
    g = sk.groupBy("partition_key", "k").agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("u").alias("_umax")
    )
    est = F.when(
        F.col("n_kept") < F.col("k"), F.col("n_kept").cast("double")
    ).otherwise((F.col("k") - 1) / F.col("_umax"))
    return g.select(
        "partition_key",
        F.col("n_kept").cast("long").alias("n_kept"),
        F.round(est, 4).alias("est_distinct"),
        (F.col("n_kept") < F.col("k")).alias("exact"),
    )


def kmv_merge(*sketches: DataFrame) -> DataFrame:
    """Union sketches (runs, appends, replays) into one per-partition
    sketch: distinct draws, bottom-k again. Idempotent — duplicate rows
    from at-least-once appends collapse in the distinct."""
    from functools import reduce

    from ..operators.similarity import two_phase_topk

    merged = reduce(lambda a, b: a.unionByName(b), sketches)
    _check_params(merged, "kmv_merge")
    krow = merged.select("k", "mode").first()
    kept = two_phase_topk(
        merged.select("partition_key", "u").distinct(),
        int(krow["k"]),
        group_col="partition_key",
        order_desc="u",
        tie_col="u",
        descending=False,
    ).drop("rank")
    return kept.select(
        "partition_key", "u",
        F.lit(int(krow["k"])).alias("k"), F.lit(krow["mode"]).alias("mode"),
    )


def read_store(spark, kmv_dir: str, suite_sid: str | None = None):
    """Load a persisted KMV sketch store (parquet rows appended by
    run_with_manifest(kmv_sketches_dir=...)) and its build parameters.

    Returns (rows(partition_key, u, run_id), k, mode). Mixed (k, mode)
    stores — a config change between runs — are REJECTED rather than
    silently merged wrong (draws under different hash modes are not
    comparable; different k corrupts the (k-1)/u_(k) estimator).
    Rows are NOT yet bottom-k'd per partition: callers merge with
    kmv_merge (multi-run unions must re-take bottom-k before any
    estimate — a raw union's u_(k') with k' > k rows underestimates)."""
    rows = spark.read.parquet(kmv_dir)
    if suite_sid is not None:
        rows = rows.filter(F.col("suite_id") == suite_sid)
    params = rows.select("k", "mode").distinct().collect()
    if len(params) != 1:
        raise ValueError(
            f"KMV store holds {len(params)} (k, mode) parameter sets; "
            "set algebra is only sound within one — rebuild the store"
        )
    p = params[0]
    keep = ["partition_key", "u"] + (["run_id"] if "run_id" in rows.columns else [])
    return (
        rows.select(*keep, F.lit(int(p["k"])).alias("k"), F.lit(p["mode"]).alias("mode")),
        int(p["k"]),
        p["mode"],
    )


def run_novelty(df: DataFrame, spec) -> "CheckResult":
    """Declarable cross-run NOVELTY check: how much of this input's key
    set is genuinely new vs everything previous runs committed (per the
    persisted KMV store at ``config['store']``), and FAIL partitions
    outside the declared band. The set-level complement of
    membership.run_seen_before: bloom answers per-key, this answers
    per-set with a sound estimator from two O(k) sketches — the input
    is scanned once (its own sketch build); history is never rescanned.

    Config:
    * ``store`` (required) — kmv_sketches_dir a prior
      run_with_manifest(kmv_sketches_dir=...) appended to; k/mode are
      taken FROM the store so the two sides can never mismatch. The
      path participates in the check id.
    * ``key`` — composite key columns (default (repo, path, commit)).
    * ``min_new_frac`` — FAIL when est_new/est_cur <= this (default 0.0:
      flag pure replays — a feed re-sending only already-committed
      keys). Size it above the estimator noise ~1/sqrt(k-2) when
      partitions exceed k keys; below k keys the algebra is exact.
    * ``max_new_frac`` — optionally also FAIL when the novelty EXCEEDS
      this (key-space rotation / upstream id churn), default None (off).

    Verdicts: SKIPPED when the store has no sketch for the partition
    (warm-up — nothing to compare) or the input holds fewer than
    min(min_rows, k) distinct keys. Violations are empty by design:
    set-level estimates carry no row identity (pair with seen_before +
    history for exact offending keys)."""
    from .base import CheckResult, empty_violations, null_safe_join, verdict_frame

    spark = df.sparkSession
    keys = list(spec.config.get("key", ["repo", "path", "commit"]))
    rows, k, mode = read_store(spark, spec.config["store"])
    hist = kmv_merge(rows.select("partition_key", "u", "k", "mode"))
    cur = kmv_sketch(df, keys, spec.partition_col, k=k, hash_fn=mode)
    stats = (
        kmv_set_stats(hist, cur)
        # store partitions absent from THIS input get no verdict row
        # (they were not validated by this run), same as every check;
        # null-safe so a NULL partition present in the input IS validated
        .transform(
            lambda d: null_safe_join(
                d, cur.select("partition_key").distinct(),
                ["partition_key"], "left_semi",
            )
        )
        .withColumn(
            "new_frac",
            F.when(F.col("est_b") > 0, F.col("est_new_b") / F.col("est_b")),
        )
    )
    min_new = float(spec.config.get("min_new_frac", 0.0))
    max_new = spec.config.get("max_new_frac")
    fail = F.col("new_frac") <= F.lit(min_new)
    if max_new is not None:
        fail = fail | (F.col("new_frac") > F.lit(float(max_new)))
    per = stats.select(
        "partition_key",
        F.col("n_a").cast("double").alias("n_hist"),
        F.col("n_b").cast("double").alias("n_cur"),
        F.col("est_a").alias("est_hist"),
        F.col("est_b").alias("est_cur"),
        F.col("est_new_b").alias("est_new"),
        F.round("new_frac", 6).alias("new_frac"),
        "jaccard",
        F.col("exact").cast("double").alias("exact"),
    )
    verdicts = verdict_frame(
        per,
        spec.id,
        "partition_key",
        fail_when=fail,
        skip_when=(F.col("n_hist") == 0)
        | (F.col("n_cur") < min(spec.min_rows, k)),
        metric_cols=[
            "n_hist", "n_cur", "est_hist", "est_cur", "est_new",
            "new_frac", "jaccard", "exact",
        ],
    )
    return CheckResult(violations=empty_violations(df), verdicts=verdicts, metrics=per)


def kmv_set_stats(
    sk_a: DataFrame, sk_b: DataFrame, materialize: bool = True
) -> DataFrame:
    """Cross-sketch set algebra per partition: (partition_key, n_a, n_b,
    est_a, est_b, est_union, est_inter, jaccard, est_new_b, exact).

    ``est_new_b`` = est_b - est_inter is the NOVELTY: how many of B's
    keys (today) were not in A (history). ``exact`` means the union
    sketch held the entire union — every number is then exact set
    arithmetic, not an estimate. All inputs are O(k) sketch rows; the
    membership tests are sketch-vs-sketch semi-joins.

    Both sketches are eagerly localCheckpoint-ed (``materialize``):
    the algebra drives several driver actions (parameter validation,
    the merge's k lookup) plus a final multi-join plan, each of which
    would otherwise RE-RUN the full sketch build — for an in-plan
    sketch over a 100-TB table that is six scans instead of one. The
    frames are O(k) rows per partition; the jaccard_pairs rule.
    """
    from .base import null_safe_join

    if materialize:
        sk_a, sk_b = sk_a.localCheckpoint(), sk_b.localCheckpoint()
    _check_params(sk_a.unionByName(sk_b), "kmv_set_stats")
    su = kmv_merge(sk_a, sk_b)
    # null-safe on partition_key: a NULL partition's sketch must match
    # itself across runs, or its algebra degenerates to n=0 / jaccard 0.
    in_a = null_safe_join(
        su, sk_a.select("partition_key", "u"), ["partition_key", "u"], "left_semi"
    )
    in_both = null_safe_join(
        in_a, sk_b.select("partition_key", "u"), ["partition_key", "u"], "left_semi"
    )
    ug = su.groupBy("partition_key", "k").agg(
        F.count(F.lit(1)).alias("ku"), F.max("u").alias("_umax")
    )
    m = in_both.groupBy("partition_key").agg(F.count(F.lit(1)).alias("_m"))
    ea = kmv_estimate(sk_a).select(
        "partition_key", F.col("n_kept").alias("n_a"), F.col("est_distinct").alias("est_a")
    )
    eb = kmv_estimate(sk_b).select(
        "partition_key", F.col("n_kept").alias("n_b"), F.col("est_distinct").alias("est_b")
    )
    d_union = F.when(F.col("ku") < F.col("k"), F.col("ku").cast("double")).otherwise(
        (F.col("k") - 1) / F.col("_umax")
    )
    j = (
        null_safe_join(ug, m, ["partition_key"], "left")
        .na.fill({"_m": 0})
        .transform(lambda d: null_safe_join(d, ea, ["partition_key"], "left"))
        .transform(lambda d: null_safe_join(d, eb, ["partition_key"], "left"))
        .na.fill({"n_a": 0, "n_b": 0, "est_a": 0.0, "est_b": 0.0})
        .withColumn("_du", d_union)
        .withColumn("_di", F.col("_m") / F.col("ku") * F.col("_du"))
    )
    return j.select(
        "partition_key",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        "est_a",
        "est_b",
        F.round("_du", 4).alias("est_union"),
        F.round("_di", 4).alias("est_inter"),
        F.round(F.col("_di") / F.col("_du"), 6).alias("jaccard"),
        F.round(F.col("est_b") - F.col("_di"), 4).alias("est_new_b"),
        (F.col("ku") < F.col("k")).alias("exact"),
    )
