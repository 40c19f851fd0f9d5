"""W4 load-session extraction: pins the reference's ACTUAL extract_loads
semantics (/root/reference/algo/load_device.py:8-34), quirks included:

* the lookback gap — positions between s=max(1, t-lookback) and the
  trigger t are NOT members (the reference appends only start_index);
* the cumulative (not consecutive) below-threshold end counter;
* the trailing ``trim`` members are dropped;
* a load still active at series end is dropped.

The expected values below were verified by executing the reference
function directly on the same series.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anomaly_detector_spark.operators.loads import extract_loads, normalize_by_max


def _series_df(spark, values, key="d1"):
    rows = [(key, i + 1, float(v)) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, "k string, pos long, v double")


def _reference_extract_loads(time_series):
    """Pure-python oracle re-implementing the reference state machine
    1:1 on a list (indices 0-based, as the reference iterates)."""
    list_of_load_inds, new_load, end_check = [], [], []
    active = False
    for i in range(len(time_series)):
        if active:
            new_load.append(i)
            if time_series[i] < 1.5:
                end_check.append(i)
            if len(end_check) > 10:
                active = False
                list_of_load_inds.append(new_load[:-10])
                new_load, end_check = [], []
        else:
            if time_series[i] > 10:
                active = True
                new_load.append(max(0, i - 10))
    return [[time_series[j] for j in load] for load in list_of_load_inds]


@pytest.mark.parametrize(
    "values",
    [
        # trigger at pos 2, lows accumulate non-consecutively (high spike
        # at pos 7 does NOT reset the counter), second load at the tail
        [5, 20, 30, 1, 1, 1, 25, 1, 0.5, 0.2, 0.3, 0.3, 0.9, 1.0, 1.1, 0.4, 50, 2],
        # immediate trigger at pos 1 (lookback clamps to 1), ends, done
        [15] + [0.1] * 12 + [3.0],
        # no trigger at all
        [1, 2, 3, 4, 5],
        # active at end of series -> incomplete load dropped
        [20, 0.1, 0.2, 0.3],
        # two full loads back to back
        [20] + [0.5] * 11 + [30] + [0.5] * 11 + [2],
    ],
)
def test_extract_loads_matches_reference_state_machine(spark, values):
    df = _series_df(spark, values)
    out = (
        extract_loads(
            df, "k", "pos", "v",
            start_thresh=10.0, end_thresh=1.5, end_count=10, lookback=10, trim=10,
        )
        .orderBy("load_id")
        .collect()
    )
    expected = _reference_extract_loads(list(values))
    assert [r["values"] for r in out] == expected
    assert [r["n_points"] for r in out] == [len(v) for v in expected]


def test_extract_loads_keys_independent(spark):
    vals = [20] + [0.5] * 11 + [2]
    rows = [(k, i + 1, float(v)) for k in ("a", "b", "c") for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, pos long, v double")
    out = extract_loads(df, "k", "pos", "v").collect()
    assert sorted(r["k"] for r in out) == ["a", "b", "c"]
    assert all(r["load_id"] == 1 for r in out)


def test_extract_loads_deterministic_under_partitioning(spark):
    vals = [20] + [0.5] * 11 + [30] + [0.5] * 11 + [2]
    df = _series_df(spark, vals)
    a = extract_loads(df.repartition(1), "k", "pos", "v").collect()
    b = extract_loads(df.repartition(8), "k", "pos", "v").collect()
    key = lambda r: (r["k"], r["load_id"])  # noqa: E731
    assert sorted(map(tuple, a), key=lambda t: (t[0], t[1])) == sorted(
        map(tuple, b), key=lambda t: (t[0], t[1])
    )


def test_normalize_by_max(spark):
    df = spark.createDataFrame(
        [([2.0, 4.0, 8.0],), ([0.0, 0.0],), ([],)], "arr array<double>"
    )
    out = [r["n"] for r in df.select(normalize_by_max("arr").alias("n")).collect()]
    assert out[0] == [0.25, 0.5, 1.0]
    assert out[1] == [0.0, 0.0]  # max 0 -> unchanged
    assert out[2] == []


def test_extract_loads_rejects_trim_beyond_end_count(spark):
    # ADVICE r2: the {s} ∪ (t, e-trim] member formula only reproduces the
    # reference's new_load[:-trim] slice while trim <= end_count; larger
    # trims slice into the lookback element (ref yields [], formula would
    # yield [s]) — rejected explicitly instead of silently diverging.
    from anomaly_detector_spark.operators.loads import extract_loads_series

    df = _series_df(spark, [20] + [0.5] * 11 + [2])
    with pytest.raises(ValueError, match="trim"):
        extract_loads(df, "k", "pos", "v", end_count=10, trim=11)
    with pytest.raises(ValueError, match="trim"):
        extract_loads_series([20.0] + [0.5] * 11 + [2.0], end_count=10, trim=11)


def test_extract_loads_member_ord_passthrough(spark):
    # include_order=True carries the member rows' order values — the
    # reference's downstream consumes a datetime-INDEXED series per load
    # (/root/reference/algo/load_device.py:54-63), not just values.
    import datetime as dt

    vals = [5, 20, 30, 1, 1, 1, 25, 1, 0.5, 0.2, 0.3, 0.3, 0.9, 1.0, 1.1, 0.4, 50, 2]
    t0 = dt.datetime(2026, 1, 1)
    rows = [("d1", t0 + dt.timedelta(minutes=i), float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = extract_loads(df, "k", "ts", "v", include_order=True).orderBy("load_id").collect()
    assert out, "expected at least one load"
    for r in out:
        assert len(r["member_ord"]) == r["n_points"] == len(r["values"])
        # member timestamps map back to the exact source rows of the values
        by_ts = {row[1]: row[2] for row in rows}
        assert [by_ts[ts] for ts in r["member_ord"]] == r["values"]


def test_extract_loads_packed_equals_grouped(spark):
    # the packed mapInPandas path (keys share Arrow batches, cross-batch
    # carry buffer) must emit exactly the grouped applyInPandas rows —
    # including member_ord passthrough and a NULL key
    import datetime as dt

    from anomaly_detector_spark.operators.loads import extract_loads

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for ki, key in enumerate(["a", "b", None, "c"]):
        vals = [0.5, 20.0, 5.0, 0.1, 0.2, 0.3, 0.4, 12.0, 3.0, 0.1, 0.2, 0.3, 0.9, 0.2]
        for i, v in enumerate(vals):
            rows.append((key, t0 + dt.timedelta(minutes=i), float(v) + ki * 0.001))
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double").repartition(5)
    kw = dict(start_thresh=10.0, end_thresh=1.5, end_count=3, lookback=2, trim=1,
              include_order=True)
    def rows_of(packed):
        out = extract_loads(df, "k", "ts", "value", packed=packed, **kw).collect()
        return sorted(map(tuple, out), key=repr)

    a, b = rows_of(False), rows_of(True)
    assert len(a) >= 8  # two loads per key, all four keys
    assert a == b
