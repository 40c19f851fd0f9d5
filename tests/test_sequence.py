"""Sequence checks (checks/sequence.py): monotonicity, gaps, flatlines."""

from pyspark.sql import functions as F

from anomaly_detector_spark.checks.base import CheckSpec
from anomaly_detector_spark.checks.sequence import (
    flatline_runs,
    run_flatline,
    run_gaps,
    run_monotonic,
)


def _series(spark):
    # device d1 (part A): 1,2,2,2,1(NULL ts gap),3 — one decrease (2->1),
    # one flatline run of three 2s; readings 600s apart except one 7200s gap.
    # device d2 (part B): clean increasing, no gaps, no runs.
    rows = []
    vals = [1.0, 2.0, 2.0, 2.0, 1.0, 3.0]
    t = 0
    for i, v in enumerate(vals):
        rows.append(("d1", "A", i, t, v))
        t += 7200 if i == 3 else 600
    t = 0
    for i, v in enumerate([1.0, 2.0, 3.0, 4.0]):
        rows.append(("d2", "B", 100 + i, t, v))
        t += 600
    df = spark.createDataFrame(
        rows, "device string, part string, event_id long, secs long, value double"
    )
    return df.withColumn("ts", F.timestamp_seconds("secs"))


def test_monotonic_counts_decreases(spark):
    df = _series(spark)
    spec = CheckSpec(
        "mono", run_monotonic,
        {"key": "device", "order": "ts", "value": "value", "tiebreak": "event_id"},
        "part", 1,
    )
    got = {r["partition_key"]: (r["verdict"], r["metrics"]["n_decreases"]) for r in run_monotonic(df, spec).verdicts.collect()}
    assert got == {"A": ("FAIL", 1.0), "B": ("PASS", 0.0)}


def test_gaps_flags_only_the_gap(spark):
    df = _series(spark)
    spec = CheckSpec(
        "gaps", run_gaps,
        {"key": "device", "order": "ts", "max_gap_s": 3600.0, "tiebreak": "event_id"},
        "part", 1,
    )
    got = {r["partition_key"]: (r["verdict"], r["metrics"]["n_gaps"], r["metrics"]["max_gap_s"]) for r in run_gaps(df, spec).verdicts.collect()}
    assert got == {"A": ("FAIL", 1.0, 7200.0), "B": ("PASS", 0.0, 600.0)}


def test_flatline_runs_and_check(spark):
    df = _series(spark)
    runs = flatline_runs(df, "device", "ts", "value", min_run=3, tiebreak="event_id").collect()
    assert len(runs) == 1
    r = runs[0]
    assert (r["device"], r["value"], r["run_len"]) == ("d1", 2.0, 3)

    spec = CheckSpec(
        "flat", run_flatline,
        {"key": "device", "order": "ts", "value": "value", "min_run": 3,
         "tiebreak": "event_id"},
        "part", 1,
    )
    got = {r["partition_key"]: (r["verdict"], r["metrics"]["n_stuck_runs"]) for r in run_flatline(df, spec).verdicts.collect()}
    assert got == {"A": ("FAIL", 1.0), "B": ("PASS", 0.0)}


def test_flatline_null_breaks_runs(spark):
    # 2,2,NULL,2,2 -> two runs of 2, neither reaching min_run 3
    rows = [("d", "A", i, i * 60, v) for i, v in enumerate([2.0, 2.0, None, 2.0, 2.0])]
    df = spark.createDataFrame(
        rows, "device string, part string, event_id long, secs long, value double"
    ).withColumn("ts", F.timestamp_seconds("secs"))
    assert flatline_runs(df, "device", "ts", "value", min_run=3, tiebreak="event_id").count() == 0


def test_sequence_checks_declarable_in_config(spark):
    from anomaly_detector_spark.plans.config import suite_from_config

    doc = {
        "min_rows": 1,
        "checks": [
            {"check": "monotonic", "name": "m", "key": "device", "order": "ts",
             "value": "value", "tiebreak": "event_id", "partition_col": "part"},
            {"check": "gaps", "name": "g", "key": "device", "order": "ts",
             "max_gap_s": 3600.0, "tiebreak": "event_id", "partition_col": "part"},
            {"check": "flatline", "name": "f", "key": "device", "order": "ts",
             "value": "value", "min_run": 3, "tiebreak": "event_id",
             "partition_col": "part"},
        ]
    }
    suite = suite_from_config(doc)
    df = _series(spark)
    verdicts = {(s.name, r["partition_key"]): r["verdict"] for s in suite for r in s.run(df).verdicts.collect()}
    assert verdicts[("m", "A")] == "FAIL" and verdicts[("m", "B")] == "PASS"
    assert verdicts[("g", "A")] == "FAIL" and verdicts[("f", "A")] == "FAIL"


def test_sequence_profile_matches_composed_checks(spark):
    from anomaly_detector_spark.checks.sequence import sequence_profile

    df = _series(spark)
    prof = {r["part"]: r for r in sequence_profile(
        df, key="device", order="ts", value="value", part="part",
        max_gap_s=3600.0, min_run=3, tiebreak="event_id",
    ).collect()}

    mono = {r[0]: r for r in run_monotonic(df, CheckSpec(
        "m", run_monotonic,
        {"key": "device", "order": "ts", "value": "value", "tiebreak": "event_id"},
        "part", 1)).metrics.collect()}
    gaps = {r[0]: r for r in run_gaps(df, CheckSpec(
        "g", run_gaps,
        {"key": "device", "order": "ts", "max_gap_s": 3600.0, "tiebreak": "event_id"},
        "part", 1)).metrics.collect()}
    flat = {r[0]: r for r in run_flatline(df, CheckSpec(
        "f", run_flatline,
        {"key": "device", "order": "ts", "value": "value", "min_run": 3,
         "tiebreak": "event_id"}, "part", 1)).metrics.collect()}

    for p in prof:
        assert prof[p]["n_rows"] == mono[p]["n_rows"]
        assert prof[p]["n_decreases"] == mono[p]["n_decreases"]
        assert prof[p]["n_gaps"] == gaps[p]["n_gaps"]
        assert prof[p]["max_gap_s"] == gaps[p]["max_gap_s"]
        assert prof[p]["n_stuck_runs"] == flat[p]["n_stuck_runs"]
        assert prof[p]["max_run_len"] == flat[p]["max_run_len"]


def _alert_rows(spark, tmp_path, files_per_trigger, rows, schema):
    """Drive sequence_alerts_stream over time-ordered parquet files
    (one micro-batch per file at files_per_trigger=1)."""
    import os
    import pathlib

    from anomaly_detector_spark.streaming.sequence import sequence_alerts_stream

    inp = tmp_path / f"seq_in_{files_per_trigger}"
    inp.mkdir()
    for bi, chunk in enumerate(rows):
        pdir = str(inp / f"b{bi}")
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(pdir)
        for p in pathlib.Path(pdir).rglob("*"):
            os.utime(p, (1700000000 + bi, 1700000000 + bi))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(str(inp) + "/*")
    )
    out = sequence_alerts_stream(
        stream, "device", "ts", "value",
        max_gap_s=3600.0, min_run=3, tiebreak_col="event_id",
    )
    sink = str(tmp_path / f"seq_sink_{files_per_trigger}")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / f"seq_ckpt_{files_per_trigger}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return sorted(
        (r["key"], r["kind"], r["ts"], r["value"], r["detail"])
        for r in spark.read.parquet(sink).collect()
    )


def test_sequence_alerts_stream_across_batches(spark, tmp_path):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)

    def r(minute, v, dev="d1", eid=None):
        return (dev, eid if eid is not None else minute, t0 + dt.timedelta(minutes=minute), v)

    schema = "device string, event_id long, ts timestamp, value double"
    # d1: flatline run of 2s spans b0->b1 (fires at minute 3), decrease at
    # minute 4, a >1h gap ending at minute 120, and a run of 1s spanning
    # b1->b2 (fires at minute 121). d2 stays clean.
    b0 = [r(0, 1.0), r(1, 2.0), r(2, 2.0), r(0, 10.0, "d2", 1000), r(1, 11.0, "d2", 1001)]
    b1 = [r(3, 2.0), r(4, 1.0), r(2, 12.0, "d2", 1002)]
    b2 = [r(120, 1.0), r(121, 1.0), r(3, 13.0, "d2", 1003)]

    expected = sorted([
        ("d1", "flatline", t0 + dt.timedelta(minutes=3), 2.0, 3.0),
        ("d1", "decrease", t0 + dt.timedelta(minutes=4), 1.0, 2.0),
        ("d1", "gap", t0 + dt.timedelta(minutes=120), 1.0, 116 * 60.0),
        ("d1", "flatline", t0 + dt.timedelta(minutes=121), 1.0, 3.0),
    ])

    got = _alert_rows(spark, tmp_path, 1, [b0, b1, b2], schema)
    assert got == expected

    # batch-split invariance: all files in ONE trigger -> same alerts
    got_one = _alert_rows(spark, tmp_path, 16, [b0, b1, b2], schema)
    assert got_one == expected


def test_sequence_alerts_null_clears_run_state(spark, tmp_path):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    schema = "device string, event_id long, ts timestamp, value double"
    # 2,2,NULL,2,2,2 -> the NULL breaks the first run; the second run of
    # three fires once at its third member
    rows = [[("d", i, t0 + dt.timedelta(minutes=i), v)
             for i, v in enumerate([2.0, 2.0, None, 2.0, 2.0, 2.0])]]
    got = _alert_rows(spark, tmp_path, 16, rows, schema)
    assert got == [("d", "flatline", t0 + dt.timedelta(minutes=5), 2.0, 3.0)]


def test_sequence_alerts_idle_state_evicted(spark, tmp_path):
    # idle_ttl_ms: an idle key's run state is evicted, so a 2-reading run
    # before the idle period plus 1 reading after does NOT fire a
    # min_run=3 flatline (the run restarts at 1 post-eviction) — and no
    # spurious gap/decrease fires either (last_v/last_ts evicted too).
    import datetime as dt
    import time as _time

    from anomaly_detector_spark.streaming.sequence import sequence_alerts_stream

    inp = str(tmp_path / "in")
    t0 = dt.datetime(2024, 1, 1)
    schema = "device string, event_id long, ts timestamp, value double"

    def rows_df(rows):
        return spark.createDataFrame(rows, schema)

    # NOTE: minute-spaced readings with max_gap_s=30 -> the FIRST batch
    # legitimately fires one gap alert (row 1 is 60s after row 0)
    rows_df([("d", 0, t0, 2.0), ("d", 1, t0 + dt.timedelta(minutes=1), 2.0)]).write.mode(
        "append"
    ).parquet(inp)

    stream = spark.readStream.schema(schema).parquet(inp)
    out = sequence_alerts_stream(
        stream, "device", "ts", "value",
        max_gap_s=30.0, min_run=3, tiebreak_col="event_id", idle_ttl_ms=1500,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("seq_evict")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        def alerts():
            return sorted(
                (r["kind"], r["detail"])
                for r in spark.sql("SELECT kind, detail FROM seq_evict").collect()
            )

        t_wait = _time.time()
        while not alerts() and _time.time() - t_wait < 60:
            _time.sleep(0.5)
        assert alerts() == [("gap", 60.0)]  # the first batch's own gap
        _time.sleep(4)  # idle >> 1.5s TTL -> state evicted
        # minute-2 reading: WITH surviving state it would fire run_len-3
        # flatline AND a second 60s gap; post-eviction it is a fresh key
        rows_df([("d", 2, t0 + dt.timedelta(minutes=2), 2.0)]).write.mode(
            "append"
        ).parquet(inp)
        t_wait = _time.time()
        while _time.time() - t_wait < 12:
            _time.sleep(1.0)
        assert alerts() == [("gap", 60.0)]
    finally:
        q.stop()


# ---------------------------------------------------------------------------
# scan_batch property tests: vectorized kernel == naive row loop, and
# split-invariance (any micro-batch split of a series yields the same
# alert sequence through the carried state).
# ---------------------------------------------------------------------------

def _naive_scan(v, t, max_gap_s, min_run):
    """Row-at-a-time reference for the full series from fresh state."""
    import math

    alerts = []
    last_v = last_ts = None
    run_v, run_len = None, 0
    for i, (x, tt) in enumerate(zip(v, t)):
        xn = float("nan") if x is None else float(x)
        if last_v is not None and not math.isnan(xn) and xn < last_v:
            alerts.append((i, "decrease", xn, last_v))
        if last_ts is not None and tt - last_ts > max_gap_s:
            alerts.append((i, "gap", xn, tt - last_ts))
        if math.isnan(xn):
            run_v, run_len = None, 0
        elif run_v is not None and xn == run_v:
            run_len += 1
        else:
            run_v, run_len = xn, 1
        if run_len == min_run:
            alerts.append((i, "flatline", xn, float(run_len)))
        last_v = None if math.isnan(xn) else xn
        last_ts = tt
    return alerts


def test_scan_batch_matches_naive_and_split_invariant():
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from anomaly_detector_spark.streaming.sequence import FRESH_STATE, scan_batch

    vals = st.lists(
        st.one_of(st.none(), st.sampled_from([0.0, 1.0, 2.0, 5.0])),
        min_size=1, max_size=24,
    )
    steps = st.lists(st.sampled_from([1.0, 50.0, 200.0]), min_size=24, max_size=24)
    cuts = st.lists(st.integers(0, 23), max_size=4)

    def norm(alerts):
        import math

        return sorted(
            (i, k, None if math.isnan(x) else x, d) for i, k, x, d in alerts
        )

    @settings(max_examples=200, deadline=None)
    @given(vals=vals, steps=steps, cuts=cuts)
    def prop(vals, steps, cuts):
        n = len(vals)
        t = list(np.cumsum(steps[:n]))
        ref = _naive_scan(vals, t, max_gap_s=100.0, min_run=3)
        vv = np.array([np.nan if x is None else x for x in vals])
        tt = np.asarray(t)

        one, _ = scan_batch(vv, tt, FRESH_STATE, 100.0, 3)
        assert norm(one) == norm(ref)

        bounds = sorted({c for c in cuts if 0 < c < n} | {0, n})
        got, state = [], FRESH_STATE
        for lo, hi in zip(bounds, bounds[1:]):
            alerts, state = scan_batch(vv[lo:hi], tt[lo:hi], state, 100.0, 3)
            got.extend((lo + i, k, x, d) for i, k, x, d in alerts)
        assert norm(got) == norm(ref)

    prop()
