"""Pre-flight equi-join forecasting: output size + skew from sketches.

At 100 TB the expensive mistake is LAUNCHING the wrong join — a
shuffle join whose output explodes, or a single hot key that funnels a
terabyte through one reducer task. Spark's CBO only helps when both
sides carry fresh statistics; this module answers the planning
questions from the engine's own sketch machinery instead, BEFORE any
wide shuffle runs:

* **how many output rows** — |A ⋈ B| = Σ_v cA(v)·cB(v). The top-k
  heavy-hitter sketch (checks/profile.py topk_sketches) stores EXACT
  counts for each side's k most frequent keys, so the heavy∩heavy
  contribution is exact, and it is a SOUND LOWER BOUND on the total
  (those pairs provably co-occur). The residual populations (all mass
  not matched heavy-to-heavy) are estimated with the System-R uniform
  assumption est = n_res_A · n_res_B / max(d_res_A, d_res_B) — the
  same rule Spark's CBO applies to the WHOLE join, here confined to
  the tail where uniformity is least wrong (the skewed head is exact).
* **which key dominates** — the matched heavy pairs rank output
  contributions per key (cA·cB), giving max_key / skew_share: the
  salting decision input. A key pair the forecast says will emit 30%
  of all output rows is the AQE-skew-split / salt-by-hand signal.
* **which strategy** — broadcast when a side's row count clears the
  threshold, salt when skew_share does; otherwise shuffle.

Profiles are one narrow scan each (groupBy key + two_phase_topk — the
same shape as the profiler) and can equally be read back from a
persisted topk-sketch store, so a scheduled pipeline forecasts
tomorrow's join from yesterday's sketches with ZERO scans. Every
frame after the profile is O(k) rows; the forecast itself never
shuffles anything wider than the sketches.

Rows with a NULL in any join-key column are excluded from both
profiles: an equi-join can never match them (SQL NULL semantics), so
counting them would inflate every estimate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SEP = "\x1f"

__all__ = ["join_profile", "forecast_equijoin", "forecast_join_tables"]


def join_profile(df: DataFrame, key_cols: list[str], k: int = 64) -> DataFrame:
    """One-scan join-side profile: the k heaviest join-key values with
    EXACT counts plus side totals riding every row — (item, n, bound,
    n_rows, n_distinct). ``bound`` is the count at rank k+1: no dropped
    key can exceed it (the undercount-soundness argument of
    topk_sketches). Exact distincts for oracle parity; swap in
    approx_count_distinct at scale if the key space is extreme."""
    from ..operators.similarity import two_phase_topk

    key = F.concat_ws(_SEP, *[F.col(c).cast("string") for c in key_cols])
    nn = df
    for c in key_cols:
        nn = nn.filter(F.col(c).isNotNull())
    counts = nn.groupBy(key.alias("item")).agg(F.count(F.lit(1)).alias("n"))
    totals = counts.agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
    )
    ranked = two_phase_topk(
        counts.withColumn("_pk", F.lit("_all")),
        k + 1,
        group_col="_pk",
        order_desc="n",
        tie_col="item",
    )
    bound = ranked.filter(F.col("rank") == k + 1).agg(
        F.coalesce(F.max("n"), F.lit(0)).cast("long").alias("bound")
    )
    heavy = ranked.filter(F.col("rank") <= k).select(
        "item", F.col("n").cast("long").alias("n")
    )
    return heavy.crossJoin(F.broadcast(bound)).crossJoin(F.broadcast(totals))


def forecast_equijoin(
    prof_a: DataFrame,
    prof_b: DataFrame,
    broadcast_rows: int = 10_000_000,
    skew_share_thresh: float = 0.2,
) -> DataFrame:
    """Forecast |A ⋈ B| from two join_profile frames — one output row:

    (n_a, n_b, d_a, d_b, n_heavy_matched, exact_heavy_rows, est_rows,
    lower_rows, max_key, max_key_rows, skew_share, strategy).

    ``lower_rows`` = exact heavy∩heavy output (sound — those pairs
    exist). ``est_rows`` adds the System-R residual term. ``skew_share``
    = the single heaviest matched key's output over est_rows.
    ``strategy``: 'broadcast_a'/'broadcast_b' when a side's rows clear
    ``broadcast_rows`` (smaller side wins ties), else 'salt' when
    skew_share clears ``skew_share_thresh``, else 'shuffle'. All inputs
    are O(k)-row frames; the forecast runs without touching either
    table."""
    ta = prof_a.select("n_rows", "n_distinct").distinct()
    tb = prof_b.select("n_rows", "n_distinct").distinct()
    a = prof_a.select("item", F.col("n").alias("n_a_key"))
    b = prof_b.select("item", F.col("n").alias("n_b_key"))
    matched = a.join(b, "item").withColumn(
        "out_rows", F.col("n_a_key") * F.col("n_b_key")
    )
    magg = matched.agg(
        F.count(F.lit(1)).cast("long").alias("n_heavy_matched"),
        F.coalesce(F.sum("out_rows"), F.lit(0)).cast("long").alias("exact_heavy_rows"),
        F.coalesce(F.sum("n_a_key"), F.lit(0)).cast("long").alias("_ma"),
        F.coalesce(F.sum("n_b_key"), F.lit(0)).cast("long").alias("_mb"),
        F.max_by("item", F.struct("out_rows", "item")).alias("max_key"),
        F.coalesce(F.max("out_rows"), F.lit(0)).cast("long").alias("max_key_rows"),
    )
    j = (
        magg.crossJoin(
            F.broadcast(
                ta.select(
                    F.col("n_rows").alias("n_a"), F.col("n_distinct").alias("d_a")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                tb.select(
                    F.col("n_rows").alias("n_b"), F.col("n_distinct").alias("d_b")
                )
            )
        )
        .withColumn("_nra", F.col("n_a") - F.col("_ma"))
        .withColumn("_nrb", F.col("n_b") - F.col("_mb"))
        .withColumn("_dra", F.col("d_a") - F.col("n_heavy_matched"))
        .withColumn("_drb", F.col("d_b") - F.col("n_heavy_matched"))
        .withColumn(
            "_res",
            F.when(
                (F.col("_dra") > 0) & (F.col("_drb") > 0),
                F.col("_nra") * F.col("_nrb") / F.greatest("_dra", "_drb"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "est_rows", F.round(F.col("exact_heavy_rows") + F.col("_res"), 1)
        )
        .withColumn(
            "skew_share",
            F.when(
                F.col("est_rows") > 0,
                F.round(F.col("max_key_rows") / F.col("est_rows"), 6),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "strategy",
            F.when(
                (F.col("n_a") <= broadcast_rows) & (F.col("n_a") <= F.col("n_b")),
                F.lit("broadcast_a"),
            )
            .when(F.col("n_b") <= broadcast_rows, F.lit("broadcast_b"))
            .when(F.col("skew_share") > skew_share_thresh, F.lit("salt"))
            .otherwise(F.lit("shuffle")),
        )
    )
    return j.select(
        "n_a", "n_b", "d_a", "d_b",
        "n_heavy_matched",
        "exact_heavy_rows",
        "est_rows",
        F.col("exact_heavy_rows").alias("lower_rows"),
        "max_key", "max_key_rows", "skew_share", "strategy",
    )


def forecast_join_tables(
    df_a: DataFrame,
    df_b: DataFrame,
    key_cols: list[str],
    k: int = 64,
    broadcast_rows: int = 10_000_000,
    skew_share_thresh: float = 0.2,
) -> DataFrame:
    """Convenience: profile both sides (one narrow scan each) and
    forecast. Still far cheaper than a blown join — the scans are
    column-pruned to the key and the heavy frames are k rows."""
    return forecast_equijoin(
        join_profile(df_a, key_cols, k),
        join_profile(df_b, key_cols, k),
        broadcast_rows=broadcast_rows,
        skew_share_thresh=skew_share_thresh,
    )
