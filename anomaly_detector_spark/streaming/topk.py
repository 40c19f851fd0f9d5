"""Online heavy hitters — applyInPandasWithState over truncated counts.

The batch top-k sketches (checks/profile.py topk_sketches / topk_union)
persist one exact truncated-count frame per run and merge across runs
with sound undercount bounds. This is the streaming-native counterpart:
per-partition truncated counts accumulate across micro-batches (bounded:
<= k items + one scalar bound per partition), and every trigger emits
the partition's CURRENT top-k with the same (est lower bound, upper
sound bound) interval semantics — continuous "most frequent values"
without recomputing history.

Soundness (the SpaceSaving argument, mirrored from topk_union):
``est`` counts only occurrences observed while the item was stored, so
est <= true always. An item (re-)entering the store may have been
dropped before with at most ``bound`` unobserved occurrences, so it
carries err = bound-at-insertion and true <= est + err = ``upper``.
Truncation raises bound to max(dropped est + err) — the most any
dropped item could truly have — so the invariant survives every
trigger. When a partition's distinct items never exceed k, bound stays
0 and est == true == upper (exact mode, like the batch sketch's
bound=0 case).

Shuffle discipline: rows project to (partition_key, _item) JVM-side
before the stateful exchange (same rule as drift/novelty/quantiles).
Determinism: counting within a trigger is a multiset fold (order cannot
show); the final state after any micro-batch split equals the
driver-side replay oracle (replay_topk_stream). State is checkpointed
by the engine — crash-restart resumes exactly (T8).
"""

from __future__ import annotations

import sys
from collections import Counter
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - trivial registration
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:
    pass

STATE_SCHEMA = (
    "items array<string>, ests array<long>, errs array<long>, bound long, n_rows long"
)
OUT_SCHEMA = (
    "partition_key string, n_rows long, rank long, item string, est long, upper long"
)


def _merge_batch(
    d: dict[str, tuple[int, int]], bound: int, batch: Counter, k: int
) -> tuple[dict[str, tuple[int, int]], int]:
    """One trigger's state transition: fold exact batch counts into the
    truncated store, then re-truncate to k. Shared by the Spark kernel
    and the replay oracle — one implementation, two call sites."""
    for it, c in batch.items():
        if it in d:
            e, r = d[it]
            d[it] = (e + c, r)
        else:
            # may have been dropped before with <= bound unobserved hits
            d[it] = (c, bound)
    ranked = sorted(d.items(), key=lambda kv: (-kv[1][0], kv[0]))
    kept, dropped = ranked[:k], ranked[k:]
    if dropped:
        bound = max(bound, max(e + r for _, (e, r) in dropped))
    return dict(kept), bound


def _require_single_suite(df, where: str) -> None:
    """Warm-start stores are keyed {partition_key: state}: rows from two
    different suite_ids sharing a partition_key would silently interleave
    (items merged, bound overwritten by whichever row came last) and the
    documented 'intervals bracket history + stream totals' claim would no
    longer hold. Refuse instead: the caller must pass ``suite_sid`` to
    pick which suite seeds the stream. O(1) driver cost — two short rows."""
    from pyspark.sql import functions as F  # noqa: F811 (closure-local)

    sids = [r[0] for r in df.select("suite_id").distinct().limit(2).collect()]
    if len(sids) > 1:
        raise ValueError(
            f"{where}: store holds multiple suite_ids ({sids[0]!r}, {sids[1]!r}, ...); "
            "pass suite_sid to select which suite seeds the warm start"
        )


def _require_partition_budget(n_parts: int, max_partitions: int, where: str) -> None:
    """Warm-start dicts are driver-resident by design (they ship in the
    stream kernel's closure); the cap keeps that deliberate collect from
    becoming an accidental driver OOM at extreme store cardinality.
    Raise loudly with the two outs: filter (suite_sid) or raise the cap."""
    if n_parts > max_partitions:
        raise ValueError(
            f"{where}: store holds {n_parts} partition keys, over the "
            f"max_partitions={max_partitions} driver-memory budget for a "
            "warm-start dict; filter the store (suite_sid) or pass a higher "
            "max_partitions if the driver has the headroom"
        )


def history_hitters(
    spark,
    topk_sketches_dir: str,
    suite_sid: str | None = None,
    max_partitions: int = 1_000_000,
) -> dict[str, tuple[list[str], list[int], list[int], int]]:
    """Collect a persisted top-k store into the warm-start dict a topk
    stream ships in its closure: {partition_key: (items, ests, errs,
    bound)} — the heavy-hitter twin of quantiles.history_digests.
    Latest-run dedupe per (suite_id, partition_key), global_topk's
    rule. Stored counts are EXACT for that run's input, so seeded errs
    are 0 and the seeded ``bound`` (the run's rank-k+1 count) soundly
    caps anything the stored sketch dropped — the stream's intervals
    then bracket history + stream totals. ``max_partitions`` bounds the
    driver footprint (~150 B x k per key at k=16 -> ~2.4 GB at the 1M
    default); over budget raises rather than OOMs. Driver-side by design:
    O(partitions x k) rows."""
    from pyspark.sql import functions as F  # noqa: F811 (closure-local)

    df = spark.read.parquet(topk_sketches_dir)
    if suite_sid is not None:
        df = df.filter(F.col("suite_id") == suite_sid)
    _require_single_suite(df, "history_hitters")
    latest = df.groupBy("suite_id", "partition_key").agg(F.max("run_id").alias("run_id"))
    _require_partition_budget(latest.count(), max_partitions, "history_hitters")
    from ..checks.base import null_safe_join

    surviving = null_safe_join(df, latest, ["suite_id", "partition_key", "run_id"])
    out: dict[str, tuple[list[str], list[int], list[int], int]] = {}
    for r in surviving.select("partition_key", "item", "n", "bound").collect():
        items, ests, errs, _b = out.setdefault(r["partition_key"], ([], [], [], 0))
        items.append(r["item"])
        ests.append(int(r["n"]))
        errs.append(0)
        out[r["partition_key"]] = (items, ests, errs, int(r["bound"]))
    return out


def topk_stream(
    stream_df: DataFrame,
    partition_col: str = "lang",
    col: str = "repo",
    k: int = 16,
    emit: int | None = None,
    idle_ttl_ms: int | None = None,
    history: dict[str, tuple[list[str], list[int], list[int], int]] | None = None,
) -> DataFrame:
    """Per-partition running heavy hitters over micro-batches.

    Emits up to ``emit`` (default k) rows per (partition, trigger):
    (rank, item, est, upper) ordered by est desc with item tie-break —
    the batch family's interval semantics, continuously. ``n_rows`` is
    cumulative, so the latest emission per key is the max-n_rows rows.

    ``idle_ttl_ms``: same state-hygiene layer as drift/novelty/quantile
    streams (ProcessingTimeTimeout rides the checkpoint); default None
    keeps state forever (<= k items + 2 longs per partition).

    ``history``: warm-start dict from :func:`history_hitters` — a
    partition's first contact seeds the committed store's truncated
    counts (exact, err 0) and its bound, so emitted intervals bracket
    history + stream totals. ``n_rows`` stays STREAM-side accounting
    only (the store carries no per-partition row count); a partition
    absent from the dict — or restarting after TTL eviction — starts
    from zero.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    kk = int(k)
    out_n = int(emit) if emit is not None else kk
    ttl = idle_ttl_ms
    hist0 = {
        key: ({i: (int(e), int(r)) for i, e, r in zip(items, ests, errs)}, int(b))
        for key, (items, ests, errs, b) in (history or {}).items()
    }
    # ship the warm-start dict as a BROADCAST, not closure state: captured
    # directly, every task re-deserializes the whole dict each micro-batch
    # (measured: a 100k-key dict tripled the seeded first trigger,
    # tools/streaming_scale_bench.py); broadcast fetches once per executor
    hist_bc = (
        stream_df.sparkSession.sparkContext.broadcast(hist0) if hist0 else None
    )

    slim = stream_df.select(
        F.coalesce(F.col(partition_col).cast("string"), F.lit("<null>")).alias(
            "partition_key"
        ),
        F.col(col).cast("string").alias("_item"),
    ).filter(F.col("_item").isNotNull())

    def fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if ttl is not None and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            items, ests, errs, bound, n_rows = state.get
            d = {i: (int(e), int(r)) for i, e, r in zip(items, ests, errs)}
            bound, n_rows = int(bound), int(n_rows)
        else:
            h = hist_bc.value if hist_bc is not None else {}
            d0, bound = h.get(key[0], ({}, 0))
            d, n_rows = dict(d0), 0
        batch: Counter = Counter()
        for pdf in pdfs:
            batch.update(str(x) for x in pdf["_item"])
        if not batch:
            return
        n_rows += sum(batch.values())
        d, bound = _merge_batch(d, bound, batch, kk)
        ranked = sorted(d.items(), key=lambda kv: (-kv[1][0], kv[0]))
        state.update(
            (
                [i for i, _ in ranked],
                [int(e) for _, (e, _) in ranked],
                [int(r) for _, (_, r) in ranked],
                int(bound),
                int(n_rows),
            )
        )
        if ttl is not None:
            state.setTimeoutDuration(ttl)
        top = ranked[:out_n]
        yield pd.DataFrame(
            {
                "partition_key": [key[0]] * len(top),
                "n_rows": [n_rows] * len(top),
                "rank": list(range(1, len(top) + 1)),
                "item": [i for i, _ in top],
                "est": [e for _, (e, _) in top],
                "upper": [e + r for _, (e, r) in top],
            }
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl is not None
        else GroupStateTimeout.NoTimeout
    )
    return slim.groupBy("partition_key").applyInPandasWithState(
        fn, OUT_SCHEMA, STATE_SCHEMA, "append", timeout
    )


def replay_topk_stream(
    batches: list[list[str]],
    k: int,
    emit: int | None = None,
    init: tuple[list[str], list[int], list[int], int] | None = None,
) -> list[tuple[int, str, int, int]]:
    """Driver-side replay of the stream's state updates over an explicit
    micro-batch split — the determinism oracle for topk_stream: the
    final emission must EQUAL this (rank, item, est, upper) list.
    ``init``: a warm-start entry (the history_hitters tuple)."""
    if init is not None:
        items, ests, errs, b = init
        d = {i: (int(e), int(r)) for i, e, r in zip(items, ests, errs)}
        bound = int(b)
    else:
        d, bound = {}, 0
    for vals in batches:
        d, bound = _merge_batch(d, bound, Counter(str(v) for v in vals), int(k))
    ranked = sorted(d.items(), key=lambda kv: (-kv[1][0], kv[0]))
    top = ranked[: (int(emit) if emit is not None else int(k))]
    return [(i + 1, it, e, e + r) for i, (it, (e, r)) in enumerate(top)]
