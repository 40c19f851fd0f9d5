"""Streaming sequence-pathology alerts: decreases, gaps, flatlines AS
THEY HAPPEN — the online twin of checks/sequence.py, with O(1) state
per key.

Where the batch checks audit a table after the fact, this emits one
alert row per pathology TRANSITION per trigger: a reading below its
predecessor (counter reset), a reading arriving more than ``max_gap_s``
after its predecessor (the gap is attributed to the reading that ends
it — a silent device can't emit; compose the freshness/staleness layer
for still-silent keys), and a value run REACHING ``min_run`` identical
consecutive readings (fires exactly once per run — the run length
crosses min_run at one reading; it must break and re-form to fire
again, so no ``fired`` flag is needed in state).

State per key is five scalars (last value, last event-time, current
run value/length) — no buffer, no histogram: the whole keyspace of a
10^6-device fleet is a few MB of state store. ``idle_ttl_ms`` composes
the same ProcessingTimeTimeout eviction as streaming/drift.py.

Kernel is vectorized over each Arrow batch (prev-shift compares + a
last-change-index scan via ``np.maximum.accumulate`` — no per-row
Python): NULL/NaN values break runs, never compare, and clear the
last-value state, exactly the batch semantics.

Ordering contract: per-key event order across micro-batches (the
reference's Kafka-partition-per-device shape), in-batch rows sorted by
``order_col`` (ties by ``tiebreak_col``). Batch equivalence — the
union of emitted alerts across any micro-batch split equals the batch
derivation over the static union — is pinned by tests/test_sequence.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUT_SCHEMA = "key string, kind string, ts timestamp, value double, detail double"
STATE_SCHEMA = "last_v double, last_ts double, run_v double, run_len long"

# state tuple: (last_v, last_ts, run_v, run_len) — None/None/None/0 fresh
FRESH_STATE = (None, None, None, 0)


def scan_batch(v, t, state, max_gap_s: float, min_run: int):
    """Pure vectorized scan of ONE ordered batch of a key's readings.

    ``v``: float64 values (NaN = NULL), ``t``: epoch seconds, ``state``:
    (last_v, last_ts, run_v, run_len) carried from the previous batch
    (FRESH_STATE for a new key). Returns (alerts, new_state) where
    alerts is a list of (row_idx, kind, value, detail). Split-invariant:
    scanning any concatenation split of a series through the carried
    state yields the same alert sequence as one scan (pinned by a
    hypothesis property test against a naive row-loop reference)."""
    v = np.asarray(v, dtype="float64")
    t = np.asarray(t, dtype="float64")
    n = len(v)
    last_v, last_ts, run_v, run_len = state
    if n == 0:
        return [], state

    prev_v = np.concatenate(([np.nan if last_v is None else last_v], v[:-1]))
    prev_t = np.concatenate(([np.nan if last_ts is None else last_ts], t[:-1]))
    dec = v < prev_v  # NaN on either side -> False
    gaps = (t - prev_t) > max_gap_s

    # run lengths: rl[i] = length of the identical-value run ending at i
    # (NaN is never a run member). A change at i starts a run there;
    # positions before the first change continue the carried run.
    carry = (
        run_len
        if run_v is not None and not np.isnan(v[0]) and v[0] == run_v
        else 0
    )
    chg = np.empty(n, dtype=bool)
    chg[0] = carry == 0
    chg[1:] = ~(v[1:] == v[:-1])  # NaN != anything -> change
    idx = np.arange(n)
    last_chg = np.maximum.accumulate(np.where(chg, idx, -1))
    rl = np.where(last_chg >= 0, idx - last_chg + 1, idx + 1 + carry)
    rl = np.where(np.isnan(v), 0, rl)
    flat = rl == min_run

    alerts = []
    for mask, kind, detail in (
        (dec, "decrease", prev_v),
        (gaps, "gap", t - prev_t),
        (flat, "flatline", rl.astype("float64")),
    ):
        for i in np.flatnonzero(mask):
            alerts.append((int(i), kind, float(v[i]), float(detail[i])))

    if np.isnan(v[-1]):
        new_state = (None, float(t[-1]), None, 0)
    else:
        new_state = (float(v[-1]), float(t[-1]), float(v[-1]), int(rl[-1]))
    return alerts, new_state


def sequence_alerts_stream(
    stream_df: DataFrame,
    key_col: str = "user_id",
    order_col: str = "ts",
    value_col: str = "value",
    max_gap_s: float = 3600.0,
    min_run: int = 3,
    tiebreak_col: str | None = None,
    idle_ttl_ms: int | None = None,
) -> DataFrame:
    """Alert rows: (key, kind in decrease|gap|flatline, ts, value,
    detail) — detail is the previous value (decrease), the gap in
    seconds (gap), or the run length == min_run (flatline)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    sort_cols = [order_col] + ([tiebreak_col] if tiebreak_col else [])
    gap_b, run_b = float(max_gap_s), int(min_run)
    ord_b, val_b = order_col, value_col
    ttl = idle_ttl_ms

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if ttl is not None and state.hasTimedOut:
            state.remove()
            return
        st = tuple(state.get) if state.exists else FRESH_STATE

        frames = [pdf.sort_values(sort_cols, kind="mergesort") for pdf in pdfs]
        frames = [f for f in frames if len(f)]
        out_frames = []
        for pdf in frames:
            ts = pdf[ord_b]
            v = pdf[val_b].to_numpy(dtype="float64", na_value=np.nan)
            # epoch seconds via an explicit ns cast (pandas may hand the
            # kernel datetime64[ns] or [us] depending on Arrow version)
            t = ts.to_numpy().astype("datetime64[ns]").astype("int64") / 1e9
            alerts, st = scan_batch(v, t, st, gap_b, run_b)
            if alerts:
                out_frames.append(
                    pd.DataFrame(
                        {
                            "key": key[0],
                            "kind": [a[1] for a in alerts],
                            "ts": ts.iloc[[a[0] for a in alerts]].to_numpy(),
                            "value": [a[2] for a in alerts],
                            "detail": [a[3] for a in alerts],
                        }
                    )
                )

        state.update(st)
        if ttl is not None:
            state.setTimeoutDuration(ttl)
        yield from out_frames

    cols = [
        F.col(key_col).cast("string").alias(key_col),
        F.col(order_col),
        F.col(value_col).cast("double").alias(value_col),
    ]
    if tiebreak_col:
        cols.append(F.col(tiebreak_col))
    grouped = stream_df.select(*cols).groupBy(key_col)
    return grouped.applyInPandasWithState(
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
