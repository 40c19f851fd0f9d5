"""W4: value-threshold load-session extraction (reference `extract_loads`).

Reproduces the reference's state machine EXACTLY
(/root/reference/algo/load_device.py:8-34), including its quirks:

* a load STARTS when the detector is inactive and value > ``start_thresh``
  at (1-based) position t; the member list begins with the single
  lookback index s = max(1, t - ``lookback``) — positions s+1..t are NOT
  members (the reference appends only ``start_index``, then resumes
  appending from t+1);
* while active, every position is appended and sub-``end_thresh`` values
  are COUNTED CUMULATIVELY (the reference never resets ``end_check`` on
  a high value, despite its comment saying "consecutive");
* the load ENDS at the first position e where that count exceeds
  ``end_count``; the trailing ``trim`` members are dropped, so the final
  member set is {s} ∪ (t, e - trim];
* a load still active when the series ends is dropped.

Per-key sequential semantics are inherent (each load's end gates the
next load's start), so the scan runs per key inside ``applyInPandas`` —
Arrow-batched, one grouped task per key, embarrassingly parallel ACROSS
keys, which is where the scale is (10^6 devices x bounded series length,
the reference's own deployment shape). No per-row Python at the Spark
level.

Downstream of extraction, the reference normalizes each load by its max,
pads to a common length and flags length/shape outliers
(/root/reference/algo/load_device.py:36-50,66-76) — composed here from
``normalize_by_max`` (F9), ``windows.pad_or_truncate`` (O5) and the
suite's outlier flagging.
"""

from __future__ import annotations

import sys

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The applyInPandas kernel calls module-level extract_loads_series; ship
# this module BY VALUE inside the closure so executors without the
# package on PYTHONPATH (spark-submit without --py-files) still run it —
# the same no-footgun guarantee every other kernel keeps by being a
# self-contained closure.
try:  # pragma: no cover - trivial registration
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:
    pass


def normalize_by_max(arr: Column | str) -> Column:
    """F9: scale an array to [..1] by its max (reference
    preprocessing.normalize_data, /root/reference/algo/preprocessing.py:4-5).
    Max of 0 (or an empty array) leaves values unchanged."""
    c = F.col(arr) if isinstance(arr, str) else arr

    # (array, max) bound as a struct lambda variable: an inline
    # array_max(c) captured in the per-element lambda would re-scan the
    # array per element — O(n²) (see dedup.word_shingles)
    def mk(s: Column) -> Column:
        a, m = s["a"], s["m"]
        return F.when(
            m.isNotNull() & (m != 0), F.transform(a, lambda v: v / m)
        ).otherwise(a)

    return F.element_at(
        F.transform(F.array(F.struct(c.alias("a"), F.array_max(c).alias("m"))), mk), 1
    )


def extract_loads_series(
    v,
    start_thresh: float = 10.0,
    end_thresh: float = 1.5,
    end_count: int = 10,
    lookback: int = 10,
    trim: int = 10,
    start_cursor: int = 0,
) -> list[tuple[int, int, int, list[int]]]:
    """Pure per-series load extraction: list of (s0, t0, e0, members),
    all 0-based indices into ``v``.

    ``start_cursor``: first index eligible to TRIGGER a load (earlier
    indices can still be lookback members). Used by the streaming
    variant, whose retained buffer holds a lookback tail of
    already-processed values that must not re-trigger.

    Vectorized replay of the sequential semantics: iterate per LOAD (not
    per row) — the trigger is the next above-threshold index after the
    previous load's end (searchsorted over the precomputed trigger
    positions), and the end is where the CUMULATIVE below-threshold
    count since the trigger reaches end_count+1 (searchsorted over the
    cumsum, which steps by at most 1 so first-geq == exact hit). ~10x
    less Python than a row loop; equivalence with the reference state
    machine is pinned by the replay fixtures in test_loads and a
    hypothesis property test over random series.

    Constraint: ``trim <= end_count``. The member formula {s} ∪ (t, e-trim]
    matches the reference's ``new_load[:-trim]`` list slice only while the
    trim stays within the appended (t, e] range (length >= end_count + 1);
    a larger trim would slice into/past the lookback element s — the
    reference yields [] there, this formula would yield [s]. Rejected
    explicitly rather than silently diverging.
    """
    import numpy as np

    if trim > end_count:
        raise ValueError(
            f"trim ({trim}) must be <= end_count ({end_count}): larger trims "
            "slice into the lookback element in the reference state machine "
            "(load_device.py new_load[:-trim]) and are not reproduced here"
        )

    v = np.asarray(v, dtype="float64")
    n = len(v)
    cum_lows = np.cumsum(v < end_thresh)  # inclusive count of lows up to i
    trig_idx = np.flatnonzero(v > start_thresh)
    loads: list[tuple[int, int, int, list[int]]] = []
    cursor = start_cursor  # 0-based: first index eligible to trigger
    while True:
        pos = np.searchsorted(trig_idx, cursor)
        if pos >= len(trig_idx):
            break
        t0 = int(trig_idx[pos])
        # first e0 > t0 with cum_lows[e0] - cum_lows[t0] == end_count+1
        e0 = int(np.searchsorted(cum_lows, cum_lows[t0] + end_count + 1))
        if e0 >= n:
            break  # still active at series end -> incomplete load dropped
        s0 = max(0, t0 - lookback)
        loads.append((s0, t0, e0, [s0] + list(range(t0 + 1, e0 - trim + 1))))
        cursor = e0 + 1
    return loads


def extract_loads(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    start_thresh: float = 10.0,
    end_thresh: float = 1.5,
    end_count: int = 10,
    lookback: int = 10,
    trim: int = 10,
    tiebreak_col: str | None = None,
    include_order: bool = False,
    packed: bool = True,
) -> DataFrame:
    """One row per completed load:
    (key, load_id, start_rn, trigger_rn, end_rn, n_points, values).

    Row order within a key is (order_col, tiebreak_col) — a pinned total
    order, because the reference's pandas sort is stable on arrival order
    and a distributed table has none. ``values`` is the member-value
    array ({v[s]} ++ v[(t, e-trim]]), ready for normalize/pad/outlier
    stages; positions are 1-based ranks within the key.

    ``include_order=True`` adds ``member_ord array<T(order_col)>`` — the
    member rows' order values — because the reference's downstream
    consumes a datetime-INDEXED series per load
    (/root/reference/algo/load_device.py:54-63), not just the values.

    Constraints / failure modes:
    * ``trim <= end_count`` (validated — see extract_loads_series).
    * One key's WHOLE series is replayed by one Python kernel call (the
      sequential semantics are inherent: each load's end gates the next
      trigger). Scale is across keys (10^6 devices x bounded history);
      a single key with an unbounded (10^9-row) history pins one task —
      pre-slice such histories by a coarse time range if that shape
      ever appears.

    Execution (``packed=True``, default): repartition by key + sort
    within partitions + ``mapInPandas`` with a cross-batch carry buffer
    — MANY keys share one Arrow batch, so the per-group Python/Arrow
    overhead (a pandas frame + kernel dispatch per group) is amortized.
    ``applyInPandas`` pays that overhead per KEY, which dominates when
    groups are small: measured 7.0s -> 1.0s on 100k rows / 1500 keys at
    local[32], where the pure kernel work is 0.5s single-threaded.
    ``packed=False`` keeps the grouped-map form (simpler plan; fine
    when groups are large enough to fill Arrow batches). Both paths
    emit identical rows — pinned by the events_loads oracle and the
    grouped-vs-packed equivalence test.
    """
    if trim > end_count:
        raise ValueError(f"trim ({trim}) must be <= end_count ({end_count})")
    sort_cols = [order_col] + ([tiebreak_col] if tiebreak_col else [])
    ord_type = dict(df.dtypes)[order_col] if include_order else None
    schema = (
        f"{key_col} string, load_id long, start_rn long, trigger_rn long, "
        f"end_rn long, n_points long, values array<double>"
        + (f", member_ord array<{ord_type}>" if include_order else "")
    )
    key_b, val_b, sort_b, ord_b = key_col, value_col, sort_cols, order_col
    inc_b = include_order
    st_b, et_b, ec_b, lb_b, tr_b = start_thresh, end_thresh, end_count, lookback, trim

    out_fixed = ("load_id", "start_rn", "trigger_rn", "end_rn", "n_points")

    def scan_into(key, v, ords, sink: dict) -> None:
        """Run the state machine over one key's value array, appending
        output rows to the shared ``sink`` dict-of-lists (no per-key
        DataFrame construction — the packed path builds ONE frame per
        Arrow batch for all its keys)."""
        for load_id, (s0, t0, e0, members) in enumerate(
            extract_loads_series(v, st_b, et_b, ec_b, lb_b, tr_b), start=1
        ):
            sink[key_b].append(key)
            sink["load_id"].append(load_id)
            sink["start_rn"].append(s0 + 1)
            sink["trigger_rn"].append(t0 + 1)
            sink["end_rn"].append(e0 + 1)
            sink["n_points"].append(len(members))
            sink["values"].append([float(v[m]) for m in members])
            if inc_b:
                sink["member_ord"].append([ords[m] for m in members])

    def new_sink() -> dict:
        return {c: [] for c in (key_b, *out_fixed, "values", "member_ord")}

    def build(sink: dict) -> pd.DataFrame:
        # object dtype for key/list columns: an empty float64 column (the
        # pandas default for []) cannot be Arrow-cast to string/list<double>
        res = pd.DataFrame(
            {
                key_b: pd.Series(sink[key_b], dtype="object"),
                **{c: sink[c] for c in out_fixed},
                "values": pd.Series(sink["values"], dtype="object"),
            }
        )
        if inc_b:
            res["member_ord"] = pd.Series(sink["member_ord"], dtype="object")
        return res

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        srt = pdf.sort_values(sort_b, kind="mergesort")
        sink = new_sink()
        scan_into(
            pdf[key_b].iloc[0],
            srt[val_b].to_numpy(dtype="float64"),
            srt[ord_b].tolist() if inc_b else None,
            sink,
        )
        return build(sink)

    cols = [F.col(key_col).cast("string"), *[F.col(c) for c in sort_b], F.col(value_col)]
    prepared = df.select(*cols)
    if not packed:
        return prepared.groupBy(key_col).applyInPandas(kernel, schema)

    shuffled = prepared.repartition(F.col(key_col)).sortWithinPartitions(key_col, *sort_b)

    def fn(batches):
        import numpy as np

        _UNSET = object()

        def run(key, parts, ord_parts, sink):
            v = np.concatenate(parts) if len(parts) > 1 else parts[0]
            ords = None
            if inc_b:
                ords = [o for chunk in ord_parts for o in chunk]
            scan_into(key, v, ords, sink)

        pend_key, parts, ord_parts = _UNSET, [], []
        sink = new_sink()
        for pdf in batches:
            if len(pdf) == 0:
                continue
            keys = pdf[key_b].to_numpy()
            vals = pdf[val_b].to_numpy(dtype="float64")
            ords = pdf[ord_b].tolist() if inc_b else None
            change = np.flatnonzero(keys[1:] != keys[:-1]) + 1
            bounds = [0, *change.tolist(), len(pdf)]
            for s0, e0 in zip(bounds[:-1], bounds[1:]):
                k = keys[s0]
                same = pend_key is not _UNSET and (
                    k == pend_key or (k is None and pend_key is None)
                )
                if not same and pend_key is not _UNSET:
                    run(pend_key, parts, ord_parts, sink)
                    parts, ord_parts = [], []
                pend_key = k
                parts.append(vals[s0:e0])
                if inc_b:
                    ord_parts.append(ords[s0:e0])
            # one output frame per input Arrow batch (keys completed so far)
            if sink[key_b]:
                done = sink
                sink = new_sink()
                yield build(done)
        if pend_key is not _UNSET:
            run(pend_key, parts, ord_parts, sink)
        if sink[key_b]:
            yield build(sink)

    return shuffled.mapInPandas(fn, schema)
