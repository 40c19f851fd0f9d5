"""Stateful streaming anomaly debounce — applyInPandasWithState.

The reference's notification state machine keeps ``timestamp_last_anomaly``
per device and suppresses a new notification when the previous anomaly was
within the last 30 minutes (/root/reference/algo/cont_device.py:208-224;
see SURVEY.md T6 for the quirk analysis — we implement the *intended*
debounce: notify iff no anomaly fired within the window before this one).

Spark-native: per-key state via ``applyInPandasWithState`` — the state
holds one float (epoch seconds of the last notified anomaly) per key; each
micro-batch's rows for a key arrive as one pandas frame, are processed in
event order, and emit only the notified anomalies. State is bounded (8
bytes/key) and checkpointed by Structured Streaming, giving the reference's
crash-restart liveness (T8) without its per-message pickle rewrite.

Batch equivalence: `debounce_batch` expresses the same semantics over a
static frame with a running lag scan — used by the tests as the oracle
(single-batch streams must match it exactly).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUT_SCHEMA = "user_id string, ts timestamp, value double"
STATE_SCHEMA = "last_notified double"


def debounced_anomalies_stream(
    stream_df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    threshold: float = 400.0,
    window_s: int = 1800,
) -> DataFrame:
    """Streaming per-key debounce: emit anomalies (value > threshold) not
    preceded by a notified anomaly within ``window_s`` seconds.

    GroupStateTimeout is NoTimeout: the state is one float per key and
    never needs eviction for correctness (a watermark-based cleanup can be
    layered on for unbounded key spaces).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_b, ts_b, val_b = key_col, ts_col, value_col
    thr_b, win_b = threshold, window_s

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        last = state.get[0] if state.exists else None
        out_rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_b)
            for ts, val in zip(pdf[ts_b], pdf[val_b]):
                if val <= thr_b:
                    continue
                epoch = ts.timestamp()
                if last is None or (epoch - last) > win_b:
                    out_rows.append((key[0], ts, float(val)))
                last = epoch  # every anomaly (notified or not) refreshes the window
        state.update((float(last),) if last is not None else (float("-inf"),))
        if out_rows:
            yield pd.DataFrame(out_rows, columns=[key_b, ts_b, val_b])

    grouped = stream_df.select(
        F.col(key_col).cast("string").alias(key_b),
        F.col(ts_col).cast("timestamp").alias(ts_b),
        F.col(value_col).cast("double").alias(val_b),
    ).groupBy(key_b)
    return grouped.applyInPandasWithState(
        fn,
        outputStructType=f"{key_b} string, {ts_b} timestamp, {val_b} double",
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def notification_decision_as_written(
    ts_last_anomaly: float, ts_last_notification: float, ts: float, window_s: int = 1800
):
    """The reference's notification_decision EXACTLY as written
    (/root/reference/algo/cont_device.py:208-224): both
    ``anomaly_during_last_30_min`` and ``notification_during_last_30_min``
    are computed from the SAME ``timestamp_last_anomaly`` input (:209 and
    :213 are identical conditions), so the notify condition
    ``anomaly AND NOT notification`` is a contradiction and
    ``notification_now`` is ALWAYS False — the reference never notifies.

    Kept as an executable fidelity fixture (test_streaming pins that it
    never fires) so the deviation in ``debounced_anomalies_stream`` /
    ``debounce_batch`` — which implement the evidently *intended*
    debounce — is explicit and documented, per SURVEY.md §2.10 T6.
    Returns (ts_last_anomaly, ts_last_notification, notification_now).
    """
    anomaly_recent = ts <= ts_last_anomaly + window_s
    notification_recent = ts <= ts_last_anomaly + window_s  # sic — same input
    notification_now = anomaly_recent and not notification_recent
    if notification_now:  # pragma: no cover — unreachable by construction
        ts_last_notification = ts
    return ts, ts_last_notification, notification_now


def debounce_batch(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    threshold: float = 400.0,
    window_s: int = 1800,
) -> DataFrame:
    """Batch oracle for the same semantics.

    Every anomaly refreshes the suppression window (like the stream
    version's ``last``), so notified = anomalies whose gap to the PREVIOUS
    anomaly (any, not just notified) exceeds window_s, or first of key.
    """
    from pyspark.sql import Window

    anomalies = df.filter(F.col(value_col) > threshold).select(
        F.col(key_col).cast("string").alias(key_col),
        F.col(ts_col).cast("timestamp").alias(ts_col),
        F.col(value_col).cast("double").alias(value_col),
    )
    w = Window.partitionBy(key_col).orderBy(ts_col)
    prev = F.lag(F.col(ts_col).cast("double")).over(w)
    return (
        anomalies.withColumn("_gap", F.col(ts_col).cast("double") - prev)
        .filter(F.col("_gap").isNull() | (F.col("_gap") > window_s))
        .drop("_gap")
    )
