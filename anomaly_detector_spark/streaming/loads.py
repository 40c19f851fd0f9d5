"""Streaming W4 load extraction — the reference's ONLINE consumption shape.

The reference runs load extraction as a Kafka consumer that re-scans the
device's FULL persisted history on every message
(/root/reference/algo/load_device.py:8-34 via operator.run's
full-history recompute). This operator keeps the same state-machine
semantics incrementally: per-key state via ``applyInPandasWithState``
holds only the *undecidable suffix* of the series — a ``lookback`` tail
when idle, or the in-flight load's values when one is open — so each
micro-batch does O(new values) work instead of O(history).

State invariants (per key):

* ``offset``  — global 0-based index of ``values[0]`` in the key's
  full series (so emitted ranks match the batch operator exactly);
* ``cursor_off`` — index within ``values`` where trigger eligibility
  starts (everything before it is lookback tail / already consumed —
  a high value there must NOT re-trigger);
* ``n_loads`` — loads emitted so far (continues ``load_id``);
* ``values`` — the retained suffix. Bounded by ``lookback`` when no
  load is pending; bounded by the open load's length when one is
  (inherent: the load's end is undecidable until seen — the reference
  holds the same data as a full history).

Ordering contract: rows must arrive per-key in event order across
micro-batches (the reference's Kafka-partition-per-device guarantee).
Within a batch, rows are sorted by ``order_col``; cross-batch
out-of-order data would need a watermark-delayed reorder buffer in
front (compose ``windowed.py``'s watermark stage for that).

Batch equivalence: the union of all emitted micro-batch rows equals
``operators.loads.extract_loads`` over the static union — pinned by
``tests/test_streaming.py`` across 1-file and per-file triggers.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.loads import extract_loads_series

OUT_COLS = ["key", "load_id", "start_rn", "trigger_rn", "end_rn", "n_points", "values"]
OUT_SCHEMA = (
    "key string, load_id long, start_rn long, trigger_rn long, end_rn long, "
    "n_points long, values array<double>"
)
STATE_SCHEMA = "offset long, cursor_off long, n_loads long, values array<double>"


def extract_loads_stream(
    stream_df: DataFrame,
    key_col: str = "user_id",
    order_col: str = "ts",
    value_col: str = "value",
    start_thresh: float = 10.0,
    end_thresh: float = 1.5,
    end_count: int = 10,
    lookback: int = 10,
    trim: int = 10,
) -> DataFrame:
    """Emit one row per COMPLETED load, as loads complete across
    micro-batches. Output schema matches the batch ``extract_loads``
    (key, load_id, start_rn, trigger_rn, end_rn, n_points, values)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if trim > end_count:
        raise ValueError(f"trim ({trim}) must be <= end_count ({end_count})")
    key_b, ord_b, val_b = key_col, order_col, value_col
    st_b, et_b, ec_b, lb_b, tr_b = start_thresh, end_thresh, end_count, lookback, trim

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            offset, cursor_off, n_loads, vals = state.get
            buf = list(vals) if vals is not None else []
        else:
            offset, cursor_off, n_loads, buf = 0, 0, 0, []
        for pdf in pdfs:
            srt = pdf.sort_values(ord_b, kind="mergesort")
            buf.extend(float(x) for x in srt[val_b])
        loads = extract_loads_series(
            buf, st_b, et_b, ec_b, lb_b, tr_b, start_cursor=cursor_off
        )
        rows = []
        for s0, t0, e0, members in loads:
            n_loads += 1
            rows.append(
                (
                    key[0],
                    n_loads,
                    offset + s0 + 1,
                    offset + t0 + 1,
                    offset + e0 + 1,
                    len(members),
                    [float(buf[m]) for m in members],
                )
            )
        n = len(buf)
        if loads:
            cursor_off = loads[-1][2] + 1
        # first still-pending trigger at/after the cursor, if any
        pend = next((i for i in range(cursor_off, n) if buf[i] > st_b), None)
        if pend is not None:
            keep = max(0, pend - lb_b)
        else:
            # nothing in [cursor_off, n) can trigger; future triggers are
            # new elements, whose lookback member lies within the last
            # ``lookback`` values — retain exactly those
            keep = max(0, n - lb_b)
            cursor_off = n
        offset += keep
        buf = buf[keep:]
        # values now in front of the cursor are all sub-threshold (pend was
        # the FIRST trigger) or pure lookback tail — clamp, never re-trigger
        cursor_off = max(0, cursor_off - keep)
        state.update((offset, cursor_off, n_loads, buf))
        if rows:
            yield pd.DataFrame(rows, columns=OUT_COLS)

    grouped = stream_df.select(
        F.col(key_col).cast("string").alias(key_b),
        F.col(order_col).alias(ord_b),
        F.col(value_col).cast("double").alias(val_b),
    ).groupBy(key_b)
    return grouped.applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
