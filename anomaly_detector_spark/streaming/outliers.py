"""Streaming per-key robust outlier flagging — the reference's core
loop, re-expressed as bounded t-digest state.

This is the closest structural analog in the engine to what
anomaly-detector actually does per device: new points arrive, each is
scored against that key's OWN history, flagged when it stands out, and
then absorbed into the history (/root/reference/algo/operator.py —
per-point processing as messages arrive; the z-over-history gate is
/root/reference/algo/error_calculation.py:5-13). The reference keeps
the raw series in memory per device; here history is a mergeable
t-digest (checks/quantiles.py td_compress), so state is O(delta)
centroids per key no matter how many rows the key has seen, and the
robust score is quantile-based:

    flagged(x)  <=>  |x - median| > threshold * IQR / 1.349

(IQR/1.349 estimates sigma for normal data — the quantile twin of the
MAD rule in checks/robust.py; both are resistant to the outliers they
hunt). Scoring uses the state as of the PREVIOUS trigger — a batch is
judged by history, not by itself — then the batch merges into state.
Warm-up (T1): while a key's history holds fewer than ``min_history``
values, nothing is flagged (n_flagged = 0, warmed_up = false).

Emits one row per (key, trigger): cumulative n_rows, batch size,
n_flagged, flag rate, and the history median / IQR used for scoring.
``replay_outlier_stream`` is the determinism oracle (stream == replay
over the same batch split, exactly like the quantile/topk twins).
"""

from __future__ import annotations

import sys
from collections.abc import Iterator

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
OUT_SCHEMA = (
    "partition_key string, n_rows long, n_batch long, n_flagged long, "
    "flag_rate double, med double, iqr double, warmed_up boolean"
)

SIGMA_K = 1.349  # IQR -> sigma consistency constant (normal data)


def _score_batch(
    means: list[float],
    weights: list[float],
    n_hist: int,
    vals: list[float],
    threshold: float,
    min_history: int,
) -> tuple[int, float, float, bool]:
    """Shared by the Spark kernel and the replay oracle: flag ``vals``
    against the PRIOR digest. Returns (n_flagged, med, iqr, warmed)."""
    if n_hist < min_history or not means:
        return 0, float("nan"), float("nan"), False
    med = td_quantile(means, weights, 0.5)
    iqr = td_quantile(means, weights, 0.75) - td_quantile(means, weights, 0.25)
    if iqr > 0:
        lim = threshold * iqr / SIGMA_K
        n = sum(1 for x in vals if abs(x - med) > lim)
    else:
        # zero-spread history: any real deviation flags (relative eps —
        # the same float-dust rule as checks/history.py ewma)
        n = sum(1 for x in vals if abs(x - med) > max(1e-9 * abs(x), 1e-12))
    return n, med, iqr, True


def outlier_stream(
    stream_df: DataFrame,
    partition_col: str = "lang",
    col: str = "content",
    mode: str = "length",
    threshold: float = 3.5,
    min_history: int = 100,
    delta: float = 200.0,
    idle_ttl_ms: int | None = None,
    history: dict[str, tuple[list[float], list[float], int]] | None = None,
) -> DataFrame:
    """Per-key streaming robust outlier monitor (see module docstring).

    ``mode``: 'length' scores length(col); 'value' scores col cast to
    double. ``threshold`` is in robust-sigma units (IQR/1.349).
    ``idle_ttl_ms``: the same state-hygiene TTL as the other streams.
    ``history``: warm-start dict from quantiles.history_digests — a
    key's FIRST batch is then scored against the COMMITTED digest
    instead of sitting in warm-up, so a scheduled batch pipeline hands
    its robust baseline straight to the live monitor. Shipped as a
    broadcast (the closure-capture cost rule, streaming/topk.py)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    dlt = float(delta)
    thr = float(threshold)
    min_h = int(min_history)
    ttl = idle_ttl_ms
    hist0 = {k: (list(m), list(w), int(n)) for k, (m, w, n) in (history or {}).items()}
    hist_bc = (
        stream_df.sparkSession.sparkContext.broadcast(hist0) if hist0 else None
    )

    v = (
        F.length(F.col(col)).cast("double")
        if mode == "length"
        else F.col(col).cast("double")
    )
    slim = stream_df.select(
        F.coalesce(F.col(partition_col).cast("string"), F.lit("<null>")).alias(
            "partition_key"
        ),
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
            means, weights = list(means), list(weights)
        vals: list[float] = []
        for pdf in pdfs:
            vals.extend(float(x) for x in pdf["_v"])
        if not vals:
            return
        n_flagged, med, iqr, warmed = _score_batch(
            means, weights, n_rows, vals, thr, min_h
        )
        vals.sort()
        m, w = td_compress(means + vals, weights + [1.0] * len(vals), delta=dlt)
        n_rows += len(vals)
        state.update(([float(x) for x in m], [float(x) for x in w], int(n_rows)))
        if ttl is not None:
            state.setTimeoutDuration(ttl)
        yield pd.DataFrame(
            {
                "partition_key": [key[0]],
                "n_rows": [n_rows],
                "n_batch": [len(vals)],
                "n_flagged": [n_flagged],
                "flag_rate": [round(n_flagged / len(vals), 6)],
                "med": [None if not warmed else round(med, 4)],
                "iqr": [None if not warmed else round(iqr, 4)],
                "warmed_up": [warmed],
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


def replay_outlier_stream(
    batches: list[list[float]],
    threshold: float = 3.5,
    min_history: int = 100,
    delta: float = 200.0,
) -> list[tuple[int, int, int, float, bool]]:
    """Driver-side replay over an explicit batch split — the determinism
    oracle for outlier_stream: per trigger (n_rows, n_batch, n_flagged,
    flag_rate, warmed_up) must EQUAL the stream's emissions."""
    means: list[float] = []
    weights: list[float] = []
    n_rows = 0
    out = []
    for vals in batches:
        vals = [float(x) for x in vals]
        n_flagged, _med, _iqr, warmed = _score_batch(
            means, weights, n_rows, vals, threshold, min_history
        )
        vs = sorted(vals)
        m, w = td_compress(means + vs, weights + [1.0] * len(vs), delta=delta)
        means, weights = list(m), list(w)
        n_rows += len(vs)
        out.append(
            (n_rows, len(vs), n_flagged, round(n_flagged / len(vs), 6), warmed)
        )
    return out
