"""Online quantile tracking — applyInPandasWithState over t-digest state.

The batch quantile sketches (checks/quantiles.py) persist one t-digest
row per partition per run; cross-run p50/p99 come from merging stored
digests. This is the streaming-native counterpart: per-partition digest
state accumulates across micro-batches (bounded: <= ~delta centroids
per partition, EXACTLY the batch sketch's footprint), and every trigger
emits the partition's CURRENT quantile estimates — continuous p99
content-length monitoring without recomputing history, because the
digest IS the sufficient statistic.

Shuffle discipline: rows are projected to (partition_key, _v) — one
double, computed JVM-side — BEFORE the stateful exchange, so content
never rides the state shuffle (same rule as streaming/drift.py and
streaming/novelty.py).

Determinism contract (weaker than novelty's, stated honestly): t-digest
merge is ORDER-SENSITIVE across triggers, so stream output after N
triggers is not bit-identical to one batch pass over the union. What IS
pinned: (1) given the same micro-batch split, the stream's digest is a
deterministic function of it — state update is one td_compress over
[state centroids, sorted batch values], so intra-batch arrival order
and Spark partitioning cannot show (pinned by a driver-side replay
test); (2) estimates carry the t-digest accuracy guarantee, tightest
at the tails (pinned against exact percentiles in tests). State is
checkpointed by the engine — crash-restart resumes the digest exactly
(T8).
"""

from __future__ import annotations

import sys
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checks.quantiles import td_compress, td_quantile

try:  # pragma: no cover - trivial registration
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:
    pass

STATE_SCHEMA = "means array<double>, weights array<double>, n_rows long"
# long format: one row per (partition, q) per trigger — works for any
# qs list without dynamic column names, and "latest emission" is just
# the max-n_rows row per (partition_key, q).
OUT_SCHEMA = "partition_key string, n_rows long, n_centroids long, q double, est double"


def history_digests(
    spark,
    quantile_sketches_dir: str,
    suite_sid: str | None = None,
    max_partitions: int = 250_000,
) -> dict[str, tuple[list[float], list[float], int]]:
    """Collect a persisted t-digest store into the warm-start dict a
    quantile stream ships in its closure: {partition_key: (means,
    weights, n_rows)} — the stream then CONTINUES the committed
    history's digests instead of starting from zero, the quantile twin
    of novelty's history_draws. Driver-side by design: the store is
    O(partitions x delta) doubles (KB-MB, the drift-baseline-dict
    footprint rule). Multi-run rows dedupe to the latest run per
    (suite_id, partition_key), exactly global_quantiles' rule, so
    at-least-once retry rows never double-seed. ``max_partitions``
    bounds the driver footprint (~3.2 KB per key at delta=200 -> ~800 MB
    at the 250k default); over budget raises rather than OOMs."""
    from pyspark.sql import functions as F  # noqa: F811 (closure-local)

    df = spark.read.parquet(quantile_sketches_dir)
    if suite_sid is not None:
        df = df.filter(F.col("suite_id") == suite_sid)
    from .topk import _require_partition_budget, _require_single_suite

    _require_single_suite(df, "history_digests")
    grouped = df.groupBy("suite_id", "partition_key").agg(
        F.max_by("means", "run_id").alias("means"),
        F.max_by("weights", "run_id").alias("weights"),
        F.max_by("n_rows", "run_id").alias("n_rows"),
    )
    _require_partition_budget(
        grouped.select("partition_key").count(), max_partitions, "history_digests"
    )
    rows = grouped.collect()
    return {
        r["partition_key"]: (
            [float(x) for x in r["means"]],
            [float(x) for x in r["weights"]],
            int(r["n_rows"]),
        )
        for r in rows
    }


def quantile_stream(
    stream_df: DataFrame,
    partition_col: str = "lang",
    col: str = "content",
    qs: list[float] | None = None,
    delta: float = 200.0,
    mode: str = "length",
    idle_ttl_ms: int | None = None,
    history: dict[str, tuple[list[float], list[float], int]] | None = None,
) -> DataFrame:
    """Per-partition running quantile estimates over micro-batches.

    ``mode``: ``"length"`` tracks length(col) — the engine's standard
    content-length distribution axis — ``"value"`` tracks the numeric
    column itself. ``delta``: t-digest compression (same default as
    checks/quantiles.py, so stream state and persisted batch sketches
    have the same size/accuracy class). Emits one row per (partition,
    q) per trigger; ``n_rows`` is cumulative, so the latest emission
    per key is the max-n_rows row.

    ``idle_ttl_ms``: same state-hygiene layer as drift_stream /
    novelty_stream — a partition silent for this long is evicted at the
    next trigger (ProcessingTimeTimeout rides the checkpoint). Default
    None keeps state forever (<= ~delta centroids per partition).

    ``history``: warm-start dict from :func:`history_digests` — a
    partition's FIRST batch merges into the committed history's digest
    instead of an empty one (match the store's value axis: the manifest
    writes length(content) digests, this stream's default ``length``
    mode). A partition absent from the dict starts from zero, the
    stream-side warm-up analog. Note the TTL eviction restart is also
    from zero — history seeds first contact only, it is not re-read.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    qlist = [float(q) for q in (qs if qs is not None else [0.5, 0.99])]
    dlt = float(delta)
    ttl = idle_ttl_ms
    hist0 = {k: (list(m), list(w), int(n)) for k, (m, w, n) in (history or {}).items()}
    # broadcast, not closure capture — same rule as topk_stream: a large
    # warm-start dict in the closure is re-deserialized per task per batch
    hist_bc = (
        stream_df.sparkSession.sparkContext.broadcast(hist0) if hist0 else None
    )

    v = F.length(F.col(col)).cast("double") if mode == "length" else F.col(col).cast("double")
    slim = stream_df.select(
        F.coalesce(F.col(partition_col).cast("string"), F.lit("<null>")).alias("partition_key"),
        v.alias("_v"),
    ).filter(F.col("_v").isNotNull())

    def fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if ttl is not None and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            means, weights, n_rows = state.get
            means, weights = list(means), list(weights)
        else:
            h = hist_bc.value if hist_bc is not None else {}
            means, weights, n_rows = h.get(key[0], ([], [], 0))
        vals: list[float] = []
        for pdf in pdfs:
            vals.extend(float(x) for x in pdf["_v"])
        if not vals:
            return
        # [state centroids, sorted batch values]: one compress, and the
        # result depends only on (state, batch multiset) — not on Spark
        # partitioning or pandas batch boundaries.
        vals.sort()
        m, w = td_compress(means + vals, weights + [1.0] * len(vals), delta=dlt)
        n_rows += len(vals)
        # plain Python floats: the state row round-trips through Pyrolite,
        # which rejects numpy scalars
        state.update(([float(x) for x in m], [float(x) for x in w], int(n_rows)))
        if ttl is not None:
            state.setTimeoutDuration(ttl)
        yield pd.DataFrame(
            {
                "partition_key": [key[0]] * len(qlist),
                "n_rows": [n_rows] * len(qlist),
                "n_centroids": [len(m)] * len(qlist),
                "q": qlist,
                "est": [round(td_quantile(m, w, q), 6) for q in qlist],
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


def replay_quantile_stream(
    batches: list[list[float]],
    qs: list[float],
    delta: float = 200.0,
    init: tuple[list[float], list[float], int] | None = None,
) -> tuple[list[float], list[float], dict[float, float]]:
    """Driver-side replay of the stream's state updates over an explicit
    micro-batch split — the determinism oracle for quantile_stream: the
    stream's final (means, weights) and estimates must EQUAL this.
    ``init``: a warm-start digest (the history_digests entry)."""
    means: list[float] = list(init[0]) if init else []
    weights: list[float] = list(init[1]) if init else []
    for vals in batches:
        vs = sorted(float(x) for x in vals)
        m, w = td_compress(means + vs, weights + [1.0] * len(vs), delta=delta)
        means, weights = list(m), list(w)
    return means, weights, {q: round(td_quantile(means, weights, q), 6) for q in qs}
