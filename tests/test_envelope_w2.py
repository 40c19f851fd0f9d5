"""Tests: JSON envelope round-trip (S3/F14) and the W2 shifted window bank."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from anomaly_detector_spark.functions.envelope import from_envelope, to_envelope
from anomaly_detector_spark.operators.windows import shifted_window_bank, tail_aligned_windows


def test_envelope_round_trip(spark):
    df = spark.createDataFrame([("k1", 1.5), ("k2", 2.5)], "partition_key string, psi double")
    enc = to_envelope(df, ["partition_key", "psi"], "pipe-1", "op-1")
    raw = {r["partition_key"]: r["envelope"] for r in enc.collect()}
    env = json.loads(raw["k1"])
    assert env["pipeline_id"] == "pipe-1" and env["operator_id"] == "op-1"
    assert env["analytics"] == {"partition_key": "k1", "psi": 1.5}
    assert env["time"].endswith("Z") and "T" in env["time"]

    schema = T.StructType(
        [T.StructField("partition_key", T.StringType()), T.StructField("psi", T.DoubleType())]
    )
    dec = enc.select(from_envelope("envelope", schema).alias("e")).select(
        "e.pipeline_id", "e.analytics.partition_key", "e.analytics.psi"
    )
    rows = {r["partition_key"]: r for r in dec.collect()}
    assert rows["k2"]["psi"] == 2.5 and rows["k2"]["pipeline_id"] == "pipe-1"


def test_shifted_window_bank_matches_reference_decomposition(spark):
    # 30 rows, window 10, 3 shifts of 5: shift s drops the newest 5s rows,
    # then tail-aligned decomposition (oldest remainder dropped)
    rows = [("k", i, float(i)) for i in range(30)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    out = shifted_window_bank(df, "k", "t", 10, shifts=3, shift_step=5).collect()

    def ref_windows(series, win):
        # reference decompose_into_time_windows: range(len, 0, -win)
        return [series[i - win : i] for i in range(len(series), 0, -win) if i - win >= 0]

    series = list(range(30))
    for s in range(3):
        shifted = series[: 30 - 5 * s]
        expect = ref_windows(shifted, 10)
        got = {}
        for r in (r for r in out if r["shift"] == s):
            got.setdefault(r["window_id"], {})[r["pos"]] = r["t"]
        assert len(got) == len(expect)
        # window_id 0 = newest window = ref_windows()[0]
        for wid, win in enumerate(expect):
            assert [got[wid][p] for p in sorted(got[wid])] == win


def test_shift_zero_equals_tail_aligned(spark):
    rows = [("k", i, float(i)) for i in range(23)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    bank0 = {
        (r["t"], r["window_id"], r["pos"])
        for r in shifted_window_bank(df, "k", "t", 5, shifts=1, shift_step=7).collect()
    }
    plain = {
        (r["t"], r["window_id"], r["pos"])
        for r in tail_aligned_windows(df, "k", "t", 5).collect()
        if r["window_id"] >= 0
    }
    assert bank0 == plain
