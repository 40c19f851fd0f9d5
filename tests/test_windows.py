"""Windowed-operator tests: W1 tail alignment, W7 smoothing, W8 resample, O5 pad.

Oracles: numpy/pandas computed driver-side on the same small series —
the analog of the reference's golden fixtures (tests/_util.py:93-104).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from anomaly_detector_spark.operators.windows import (
    pad_or_truncate,
    resample_interpolate,
    savgol_coeffs,
    savgol_smooth,
    tail_aligned_windows,
)


def test_tail_aligned_windows_drop_oldest_remainder(spark):
    # 13 rows, window 5 → newest 10 rows form windows 0,1; oldest 3 dropped (-1)
    rows = [("k", i, float(i)) for i in range(13)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    out = tail_aligned_windows(df, "k", "t", 5).orderBy("t").collect()
    wids = [r["window_id"] for r in out]
    assert wids == [-1, -1, -1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
    # pos is 0-based oldest-first within each window
    w0 = [(r["t"], r["pos"]) for r in out if r["window_id"] == 0]
    assert w0 == [(8, 0), (9, 1), (10, 2), (11, 3), (12, 4)]
    # reference alignment (preprocessing.py:15-21): windows from the tail
    arr = np.arange(13, dtype=float)
    ref = [arr[i - 5 : i] for i in range(13, 0, -5) if i - 5 >= 0]
    got0 = [r["v"] for r in sorted(out, key=lambda r: r["t"]) if r["window_id"] == 0]
    assert got0 == list(ref[0])


def test_savgol_coeffs_match_polyfit_smoothing():
    # smoothing a polynomial of degree <= polyorder reproduces it exactly
    c = np.asarray(savgol_coeffs(7, 3))
    x = np.arange(20, dtype=float)
    y = 0.5 * x**3 - 2 * x**2 + x - 3
    interior = [np.dot(c, y[i - 3 : i + 4]) for i in range(3, 17)]
    assert np.allclose(interior, y[3:17])


def test_savgol_smooth_interior_matches_numpy(spark):
    rng = np.random.default_rng(7)
    vals = np.cumsum(rng.normal(size=40))
    df = spark.createDataFrame(
        [("a", i, float(v)) for i, v in enumerate(vals)], "k string, t long, v double"
    )
    out = savgol_smooth(df, "k", "t", "v", window_length=7, polyorder=3).orderBy("t").collect()
    c = np.asarray(savgol_coeffs(7, 3))
    expect = [np.dot(c, vals[i - 3 : i + 4]) for i in range(3, 37)]
    got = [r["smoothed"] for r in out][3:37]
    assert np.allclose(got, expect)


def test_resample_interpolate_linear_grid(spark):
    rows = [
        ("a", "2026-01-01 00:00:00", 0.0),
        ("a", "2026-01-01 00:02:00", 4.0),
        ("a", "2026-01-01 00:04:00", 8.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts string, v double").select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    out = {str(r["ts"]): r["v"] for r in resample_interpolate(df, "k", "ts", "v").collect()}
    assert out["2026-01-01 00:01:00"] == pytest.approx(2.0)
    assert out["2026-01-01 00:03:00"] == pytest.approx(6.0)
    assert len(out) == 5


def test_pad_or_truncate(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0],), ([1.0],)], "arr array<double>")
    out = df.select(pad_or_truncate("arr", 2).alias("p")).collect()
    assert [r["p"] for r in out] == [[1.0, 2.0], [1.0, 0.0]]


def test_savgol_and_resample_packed_equal_grouped(spark):
    # the generic packed_grouped_map path must emit exactly the grouped
    # rows for both per-key kernels (keys spanning Arrow batches included
    # at driver scale via the sf0.01 oracle; here: correctness + NULL-free
    # bounded fixture with several small keys)
    import datetime as dt

    from anomaly_detector_spark.operators.windows import (
        resample_interpolate,
        savgol_smooth,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for ki in range(7):
        for i in range(30):
            rows.append(
                (f"k{ki}", t0 + dt.timedelta(seconds=17 * i + ki), float((i * 13 + ki) % 29))
            )
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, value double").repartition(5)

    a = savgol_smooth(df, "user_id", "ts", "value", 7, 3, packed=False)
    b = savgol_smooth(df, "user_id", "ts", "value", 7, 3, packed=True)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb and len(ra) == 210

    c = resample_interpolate(df, "user_id", "ts", "value", packed=False)
    d = resample_interpolate(df, "user_id", "ts", "value", packed=True)
    rc = sorted(map(tuple, c.collect()))
    rd = sorted(map(tuple, d.collect()))
    assert rc == rd and len(rc) > 0
