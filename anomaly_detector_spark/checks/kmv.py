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


def kmv_set_stats(sk_a: DataFrame, sk_b: DataFrame) -> DataFrame:
    """Cross-sketch set algebra per partition: (partition_key, n_a, n_b,
    est_a, est_b, est_union, est_inter, jaccard, est_new_b, exact).

    ``est_new_b`` = est_b - est_inter is the NOVELTY: how many of B's
    keys (today) were not in A (history). ``exact`` means the union
    sketch held the entire union — every number is then exact set
    arithmetic, not an estimate. All inputs are O(k) sketch rows; the
    membership tests are sketch-vs-sketch semi-joins.
    """
    _check_params(sk_a.unionByName(sk_b), "kmv_set_stats")
    su = kmv_merge(sk_a, sk_b)
    in_a = su.join(sk_a.select("partition_key", "u"), ["partition_key", "u"], "left_semi")
    in_both = in_a.join(
        sk_b.select("partition_key", "u"), ["partition_key", "u"], "left_semi"
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
        ug.join(m, "partition_key", "left")
        .na.fill({"_m": 0})
        .join(ea, "partition_key", "left")
        .join(eb, "partition_key", "left")
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
