"""Continuous drift tracking — applyInPandasWithState over running histograms.

The batch drift check (checks/drift.py) scores a partition's
content-length histogram against a baseline once per run. This is the
streaming-native counterpart: per-partition histogram state accumulates
across micro-batches (bounded: one count per occupied bucket), and every
trigger emits the partition's CURRENT PSI against a frozen baseline —
the reference's "score after every message" cadence
(/root/reference/algo/operator.py:174-175) without recomputing history,
because the running histogram IS the sufficient statistic for PSI.

Shuffle discipline: rows are projected to (partition, bucket) BEFORE the
stateful exchange — content never rides the state shuffle. (A pre-
aggregation would be better still, but Structured Streaming allows one
stateful operator per query; the projection keeps the shuffle at 16
bytes/row.) State is two parallel arrays (buckets, counts), checkpointed
by the engine — crash-restart resumes the histogram exactly (T8).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATE_SCHEMA = "buckets array<long>, counts array<long>"
OUT_SCHEMA = (
    "partition_key string, psi double, ks double, n_obs long, n_buckets long, is_drifted boolean"
)


def drift_stream(
    stream_df: DataFrame,
    baseline: dict[int, float],
    partition_col: str = "lang",
    col: str = "content",
    bucket_width: int = 100,
    abs_thresh: float = 0.25,
    idle_ttl_ms: int | None = None,
    mode: str = "length",
) -> DataFrame:
    """Per-partition running PSI/KS vs a frozen baseline histogram.

    ``baseline``: {bucket -> count} (e.g. collected from
    checks.drift.global_baseline of a reference run) — shipped in the
    closure, identical semantics to the batch scorer's frozen-baseline
    mode. Emits one row per (partition, trigger); ``is_drifted`` is the
    absolute-threshold decision (the relative z/IQR gates need the
    cross-partition population, which a per-key stateful op cannot see —
    run the batch flagger over the emitted scores for those).

    ``idle_ttl_ms``: state-hygiene layer for adversarial/unbounded key
    spaces — a partition that receives no data for this long
    (processing time) has its histogram EVICTED at the next trigger
    (ProcessingTimeTimeout; the deadline rides the checkpointed state,
    so it survives query restarts). Data arriving for an evicted key
    later starts a fresh histogram — pick a TTL comfortably above the
    slowest partition's arrival cadence. Default None keeps state
    forever (bounded by distinct-keys x occupied-buckets, fine for
    bounded key spaces like langs).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    base_items = sorted(baseline.items())
    bw = bucket_width
    ttl = idle_ttl_ms

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        import numpy as np

        if ttl is not None and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            buckets, counts = state.get
            hist = dict(zip(buckets, counts))
        else:
            hist = {}
        for pdf in pdfs:
            for b, c in pdf["_bucket"].value_counts().items():
                hist[int(b)] = hist.get(int(b), 0) + int(c)
        if not hist:
            return
        bks = sorted(set(hist) | {b for b, _ in base_items})
        obs = np.array([hist.get(b, 0) for b in bks], dtype=np.float64)
        base = np.array([dict(base_items).get(b, 0.0) for b in bks], dtype=np.float64)
        # identical smoothing/scoring to checks.drift.psi_ks
        p = (obs + 0.5) / (obs.sum() + 0.5 * len(obs))
        q = (base + 0.5) / (base.sum() + 0.5 * len(base))
        psi = float(np.sum((p - q) * np.log(p / q)))
        ks = float(np.max(np.abs(np.cumsum(p) - np.cumsum(q))))
        state.update((sorted(hist), [hist[b] for b in sorted(hist)]))
        if ttl is not None:
            state.setTimeoutDuration(ttl)
        yield pd.DataFrame(
            {
                "partition_key": [key[0]],
                "psi": [psi],
                "ks": [ks],
                "n_obs": [int(obs.sum())],
                "n_buckets": [len(bks)],
                "is_drifted": [psi > abs_thresh],
            }
        )

    if mode == "length":
        measure = F.length(F.col(col))
    elif mode == "value":
        measure = F.col(col)
    else:
        raise ValueError(f"mode must be 'length' or 'value', got {mode!r}")
    slim = stream_df.filter(F.col(col).isNotNull()).select(
        F.col(partition_col).cast("string").alias("partition_key"),
        F.floor(measure / bw).cast("long").alias("_bucket"),
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
