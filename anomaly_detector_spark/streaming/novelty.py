"""Online novelty tracking — applyInPandasWithState over bottom-k state.

The batch novelty check (checks/kmv.py run_novelty) scores one run's
key set against the persisted history store once per run. This is the
streaming-native counterpart: per-partition KMV bottom-k state
accumulates across micro-batches (bounded: k doubles per partition,
EXACTLY the batch sketch's size), and every trigger emits the
partition's CURRENT set algebra against a frozen history sketch — the
running answer to "how much of what this stream has delivered so far
is genuinely new", without ever rescanning the stream's past (the
bottom-k IS the sufficient statistic, and bottom-k merge is
order-insensitive, so batch splits cannot change the final state).

Shuffle discipline: rows are projected to (partition_key, u) — one
xxhash64/sha256 draw, computed JVM-side by checks.kmv.kmv_u — BEFORE
the stateful exchange, so keys and payloads never ride the state
shuffle (16 bytes/row, same rule as streaming/drift.py).

Estimator arithmetic is IDENTICAL to checks/kmv.py kmv_set_stats,
including its 4dp/6dp rounding points: after any prefix of triggers,
the emitted row for a partition equals what the batch path would
compute over the same rows (pinned by the batch==stream equivalence
test). State is checkpointed by the engine — crash-restart resumes
the sketch exactly (T8).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checks.kmv import kmv_u

_SEP = "\x1f"

STATE_SCHEMA = "draws array<double>"
OUT_SCHEMA = (
    "partition_key string, n_batch long, n_kept long, est_cur double, "
    "est_new double, new_frac double, exact boolean"
)


def history_draws(
    spark, kmv_dir: str, suite_sid: str | None = None, max_partitions: int = 1_000_000
):
    """Collect a persisted KMV store into the frozen-baseline dict a
    novelty stream ships in its closure: {partition_key: sorted bottom-k
    draws}, plus (k, mode). Driver-side by design — the store is
    O(partitions x k) doubles (KB), the same footprint drift_stream's
    baseline dict accepts — and multi-run rows are re-merged to bottom-k
    here (the raw union would underestimate history, checks/kmv.py).
    ``max_partitions`` bounds the driver footprint (~8 B x k per key ->
    ~2 GB at k=256 and the 1M default); over budget raises rather than
    OOMs."""
    from ..checks.kmv import read_store

    rows, k, mode = read_store(spark, kmv_dir, suite_sid)
    # same refusal as topk/quantiles warm-starts: two suites sharing a
    # partition_key would union draws from different key domains
    if suite_sid is None:
        from pyspark.sql import functions as F  # noqa: F811 (closure-local)

        store = spark.read.parquet(kmv_dir)
        sids = [r[0] for r in store.select("suite_id").distinct().limit(2).collect()]
        if len(sids) > 1:
            raise ValueError(
                f"history_draws: store holds multiple suite_ids ({sids[0]!r}, "
                f"{sids[1]!r}, ...); pass suite_sid to select one"
            )
    from .topk import _require_partition_budget

    _require_partition_budget(
        rows.select("partition_key").distinct().count(), max_partitions, "history_draws"
    )
    per: dict[str, list[float]] = {}
    for r in rows.select("partition_key", "u").distinct().collect():
        per.setdefault(r["partition_key"], []).append(r["u"])
    return {pk: sorted(us)[:k] for pk, us in per.items()}, k, mode


def novelty_stream(
    stream_df: DataFrame,
    history: dict[str, list[float]],
    k: int,
    partition_col: str = "lang",
    key_cols: list[str] | None = None,
    hash_fn: str = "xxhash64",
    idle_ttl_ms: int | None = None,
) -> DataFrame:
    """Per-partition running set algebra vs a frozen history sketch.

    ``history``/``k``/``hash_fn``: from history_draws(...) so the two
    sides can never mismatch (pass the SAME k and mode the store was
    built with; a partition absent from the dict is all-new —
    new_frac 1.0 — the stream-side warm-up analog of the batch check's
    SKIP). Emits one row per (partition, trigger): ``est_cur`` is the
    running estimate of every distinct key the stream has delivered,
    ``est_new``/``new_frac`` score it against history with the exact
    batch estimator, ``exact`` marks sketches still below k (exact set
    arithmetic, no estimation error yet).

    ``idle_ttl_ms``: same state-hygiene layer as drift_stream — a
    partition silent for this long is evicted at the next trigger and
    restarts fresh if it ever returns (ProcessingTimeTimeout rides the
    checkpoint). Default None keeps state forever (k doubles per
    partition — bounded for bounded key spaces).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    base = {pk: sorted(us) for pk, us in history.items()}
    # broadcast, not closure capture — same rule as topk_stream: the
    # frozen-baseline dict is read every batch and would otherwise be
    # re-deserialized per task per micro-batch
    base_bc = stream_df.sparkSession.sparkContext.broadcast(base) if base else None
    kk = int(k)
    ttl = idle_ttl_ms

    def _est(draws: list[float]) -> float:
        if len(draws) < kk:
            return float(len(draws))
        return round((kk - 1) / draws[-1], 4)

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if ttl is not None and state.hasTimedOut:
            state.remove()
            return
        cur = set(state.get[0]) if state.exists else set()
        n_batch = 0
        for pdf in pdfs:
            n_batch += len(pdf)
            cur.update(float(u) for u in pdf["_u"])
        if not cur:
            return
        kept = sorted(cur)[:kk]
        state.update((kept,))
        if ttl is not None:
            state.setTimeoutDuration(ttl)

        hist = (base_bc.value if base_bc is not None else {}).get(key[0], [])
        est_b = _est(kept)
        if not hist:
            est_new, new_frac = est_b, 1.0
            exact = len(kept) < kk
        else:
            # kmv_set_stats verbatim: union bottom-k, matched fraction,
            # and its exact rounding points (est_new subtracts the
            # ALREADY-4dp-ROUNDED est_b)
            union = sorted(set(hist) | set(kept))[:kk]
            ku = len(union)
            du = float(ku) if ku < kk else (kk - 1) / union[-1]
            hs, ks_ = set(hist), set(kept)
            m = sum(1 for u in union if u in hs and u in ks_)
            di = m / ku * du
            est_new = round(est_b - di, 4)
            new_frac = round(est_new / est_b, 6) if est_b > 0 else None
            exact = ku < kk
        yield pd.DataFrame(
            {
                "partition_key": [key[0]],
                "n_batch": [n_batch],
                "n_kept": [len(kept)],
                "est_cur": [est_b],
                "est_new": [est_new],
                "new_frac": [new_frac],
                "exact": [exact],
            }
        )

    keys = key_cols or ["repo", "path", "commit"]
    key_expr = F.concat_ws(_SEP, *[F.col(c).cast("string") for c in keys])
    slim = stream_df.select(
        F.col(partition_col).cast("string").alias("partition_key"),
        kmv_u(key_expr, hash_fn).alias("_u"),
    )
    return slim.groupBy("partition_key").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
