"""Windowed-computation operators (SURVEY.md §2.5 W1/W7/W8, §2.6 O5).

The reference slices each device's series into fixed-length windows
aligned to the TAIL (newest end) of the series, smooths with
Savitzky-Golay, and resamples irregular points onto a 1-minute grid
(/root/reference/algo/preprocessing.py). Re-expressed:

* tail_aligned_windows — pure window functions (one shuffle-sort per
  key); reproduces the reference's non-standard tail alignment
  (range(len, 0, -205) at preprocessing.py:17): windows count back from
  the newest row and the oldest remainder (< window length) is dropped.
* savgol_smooth — Savitzky-Golay inside applyInPandas. scipy is not a
  dependency: the FIR coefficients are derived once on the driver from
  the closed-form least-squares polynomial fit (the same math
  scipy.signal.savgol_coeffs implements) and shipped in the closure;
  the kernel is a numpy convolution per key.
* resample_interpolate — irregular series → fixed grid with linear
  interpolation, per key inside applyInPandas (pandas resample/
  interpolate verbatim, the reference's minute_resampling semantics).
* pad_or_truncate — O5: array → exactly n elements, zero-padded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tail_aligned_windows(
    df: DataFrame,
    key_col: str,
    order_col: str,
    window_len: int,
    value_col: str | None = None,
) -> DataFrame:
    """Assign each row a tail-aligned tumbling window id.

    window_id 0 holds the NEWEST ``window_len`` rows of each key, 1 the
    next-newest, ...; rows in the oldest partial remainder get
    window_id = -1 (the reference drops them). ``pos`` is the row's
    0-based position within its window, oldest first.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(order_col).desc())
    n = F.count(F.lit(1)).over(Window.partitionBy(key_col))
    rn = F.row_number().over(w)  # 1 = newest
    wid = F.floor((rn - 1) / window_len).cast("long")
    complete = (F.floor(n / window_len) * window_len) >= rn
    out = df.withColumn("window_id", F.when(complete, wid).otherwise(F.lit(-1))).withColumn(
        "pos",
        F.when(
            complete, (window_len - 1 - F.pmod(rn - 1, F.lit(window_len))).cast("long")
        ).otherwise(F.lit(-1)),
    )
    return out


def shifted_window_bank(
    df: DataFrame,
    key_col: str,
    order_col: str,
    window_len: int,
    shifts: int = 21,
    shift_step: int = 10,
) -> DataFrame:
    """W2: overlapping window bank — ``shifts`` copies of each key's series,
    copy s dropping its newest ``s * shift_step`` rows, each decomposed into
    tail-aligned windows (reference prepare_batches,
    /root/reference/algo/cont_device.py:88-96: 21 shifts of 10 steps).

    One shuffle-sort per key computes rn once; the bank fans out via a
    JVM-side explode of shift ids — no self-unions, no recomputation.
    Output: input columns + (shift, window_id, pos); rows whose shifted
    position falls in the dropped head or the oldest partial remainder are
    excluded (the reference drops both).
    """
    w = Window.partitionBy(key_col).orderBy(F.col(order_col).desc())
    n = F.count(F.lit(1)).over(Window.partitionBy(key_col))
    rn = F.row_number().over(w)  # 1 = newest
    base = df.withColumn("_rn", rn).withColumn("_n", n)
    fanned = base.withColumn(
        "shift", F.explode(F.sequence(F.lit(0), F.lit(shifts - 1)))
    )
    srn = F.col("_rn") - F.col("shift") * shift_step  # position within the shifted copy
    sn = F.col("_n") - F.col("shift") * shift_step    # shifted copy length
    complete = (srn >= 1) & ((F.floor(sn / window_len) * window_len) >= srn)
    out = (
        fanned.filter(complete)
        .withColumn("window_id", F.floor((srn - 1) / window_len).cast("long"))
        .withColumn("pos", (window_len - 1 - F.pmod(srn - 1, F.lit(window_len))).cast("long"))
        .drop("_rn", "_n")
    )
    return out


def savgol_coeffs(window_length: int, polyorder: int) -> list[float]:
    """Closed-form Savitzky-Golay FIR coefficients (central point).

    Least-squares fit of a degree-``polyorder`` polynomial over a
    centered window: coefficients = e_0^T (A^T A)^{-1} A^T with
    A[i, j] = x_i^j, x centered. Matches scipy.signal.savgol_coeffs
    (deriv=0) to float precision.
    """
    if window_length % 2 == 0 or window_length < 1:
        raise ValueError("window_length must be odd and positive")
    if polyorder >= window_length:
        raise ValueError("polyorder must be < window_length")
    half = window_length // 2
    x = np.arange(-half, half + 1, dtype=np.float64)
    a = np.vander(x, polyorder + 1, increasing=True)  # (win, order+1)
    # pinv row 0 = weights producing the fitted value at x=0
    pinv = np.linalg.pinv(a)  # (order+1, win)
    return pinv[0].tolist()


def savgol_smooth(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    window_length: int = 55,
    polyorder: int = 10,
    out_col: str = "smoothed",
    packed: bool = True,
) -> DataFrame:
    """Per-key Savitzky-Golay smoothing (reference W7: window 55, order 10).

    Arrow-vectorized grouped map; edges use reflect-padding (scipy's
    'interp' mode differs at edges — interior points are identical; the
    fixture tests pin interior values). ``packed=True`` (default) runs
    via ``grouped.packed_grouped_map`` — many keys per Arrow batch,
    amortizing per-group dispatch for small-series corpora.
    """
    coeffs = savgol_coeffs(window_length, polyorder)
    fields = ", ".join(
        f"{name} {dt}" for name, dt in df.select(key_col, order_col, value_col).dtypes
    )
    schema = f"{fields}, {out_col} double"
    half = window_length // 2
    # bind names into the closure (cloudpickled by value — workers
    # without this package on PYTHONPATH must still run the kernel)
    order_col_b, value_col_b, out_col_b = order_col, value_col, out_col
    coeffs_b, half_b = coeffs, half

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as _np

        pdf = pdf.sort_values(order_col_b).reset_index(drop=True)
        v = pdf[value_col_b].to_numpy(dtype=_np.float64)
        c = _np.asarray(coeffs_b, dtype=_np.float64)
        if len(v) >= len(c):
            padded = _np.concatenate([v[half_b:0:-1], v, v[-2 : -half_b - 2 : -1]])
            sm = _np.convolve(padded, c[::-1], mode="valid")
        else:
            sm = v.copy()
        pdf[out_col_b] = sm
        return pdf

    from .grouped import packed_grouped_map

    return packed_grouped_map(
        df.select(key_col, order_col, value_col),
        key_col,
        [order_col],
        kernel,
        schema,
        packed=packed,
    )


def resample_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    freq: str = "1min",
    packed: bool = True,
) -> DataFrame:
    """Per-key resample to a fixed grid + linear interpolation (W8).

    The reference upsamples to seconds, interpolates linearly, then takes
    minute points and drops leading/trailing NaNs
    (/root/reference/algo/preprocessing.py:7-9). pandas does it verbatim
    per key inside the Arrow UDF; keys are independent → embarrassingly
    parallel across executors. ``packed=True`` (default): many keys per
    Arrow batch via ``grouped.packed_grouped_map``.
    """
    schema = f"{key_col} string, {ts_col} timestamp, {value_col} double"
    ts_b, val_b, key_b, freq_b = ts_col, value_col, key_col, freq

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf[key_b].iloc[0]
        # sort by (ts, value) — NOT arrival order: rows reach the kernel
        # in shuffle order, so keep='first' below must break floored-
        # second ties on a pinned total order to stay deterministic
        # under partitioning (and reproducible by the SQL oracle)
        s = pdf.sort_values([ts_b, val_b]).set_index(ts_b)[val_b]
        # second-truncate first (reference F4, algo/operator.py:132):
        # sub-second offsets would otherwise leave every 1s bin empty and
        # interpolate() with no anchors → empty output.
        s.index = s.index.floor("s")
        s = s[~s.index.duplicated(keep="first")]
        out = s.resample("s").interpolate().resample(freq_b).asfreq().dropna()
        return pd.DataFrame({key_b: key, ts_b: out.index, val_b: out.to_numpy()})

    from .grouped import packed_grouped_map

    return packed_grouped_map(
        df.select(
            F.col(key_col).cast("string"),
            F.col(ts_col).cast("timestamp"),
            F.col(value_col).cast("double"),
        ),
        key_col,
        [ts_col, value_col],
        kernel,
        schema,
        packed=packed,
    )


def pad_or_truncate(arr: Column | str, n: int, fill: float = 0.0) -> Column:
    """Array → exactly ``n`` elements: truncate or zero-pad (O5,
    /root/reference/algo/load_device.py:36-43)."""
    c = F.col(arr) if isinstance(arr, str) else arr
    truncated = F.slice(c, 1, n)
    padding = F.array_repeat(F.lit(fill), n - F.size(truncated))
    return F.when(F.size(c) >= n, truncated).otherwise(F.concat(truncated, padding))
