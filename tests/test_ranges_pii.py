"""Tests: bucketized interval join, segment-level dedup, PII redaction."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from anomaly_detector_spark.operators.dedup import segment_dedup
from anomaly_detector_spark.operators.ranges import bucketized_interval_join
from anomaly_detector_spark.operators.text import redact_pii

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(sec: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=sec)


@pytest.fixture()
def points_intervals(spark):
    points = spark.createDataFrame(
        [
            (1, "u1", _ts(0)),      # == start of iv A (inclusive)
            (2, "u1", _ts(300)),    # inside iv A
            (3, "u1", _ts(600)),    # == end of iv A (inclusive), inside iv B
            (4, "u1", _ts(601)),    # outside iv A, inside iv B
            (5, "u1", _ts(5000)),   # matches nothing
            (6, "u2", _ts(300)),    # same time as p2 but other key
            (7, "u1", _ts(1800)),   # inside the long iv C (spans many buckets)
        ],
        "event_id long, user_id string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            ("A", "u1", _ts(0), _ts(600)),
            ("B", "u1", _ts(550), _ts(700)),
            ("C", "u1", _ts(100), _ts(2500)),   # spans 5 buckets at width=600
            ("D", "u2", _ts(250), _ts(350)),
            ("R", "u1", _ts(900), _ts(800)),    # reversed -> dropped
            ("N", "u1", None, _ts(100)),        # NULL start -> dropped
        ],
        "iv_id string, user_id string, w_start timestamp, w_end timestamp",
    )
    return points, intervals


def _expected_pairs(points, intervals):
    """Brute-force oracle: plain non-equi join."""
    p = points.alias("p")
    i = intervals.alias("i")
    rows = (
        p.join(i, on="user_id", how="inner")
        .filter(F.col("p.ts").between(F.col("i.w_start"), F.col("i.w_end")))
        .select("event_id", "iv_id")
        .collect()
    )
    return {(r["event_id"], r["iv_id"]) for r in rows}


def test_interval_join_matches_bruteforce(spark, points_intervals):
    points, intervals = points_intervals
    got = bucketized_interval_join(
        points, intervals, "ts", "w_start", "w_end", on=["user_id"], bucket_width=600
    )
    pairs = {(r["event_id"], r["iv_id"]) for r in got.collect()}
    assert pairs == _expected_pairs(points, intervals)
    # spot-check semantics: inclusive bounds, key isolation, span coverage
    assert (1, "A") in pairs and (3, "A") in pairs      # boundary inclusive
    assert (3, "B") in pairs and (4, "B") in pairs
    assert (7, "C") in pairs                             # multi-bucket interval
    assert (6, "D") in pairs and (2, "D") not in pairs   # per-key
    assert not any(iv == "R" or iv == "N" for _, iv in pairs)


@pytest.mark.parametrize("width", [1, 50, 600, 100000])
def test_interval_join_invariant_to_bucket_width(spark, points_intervals, width):
    points, intervals = points_intervals
    got = bucketized_interval_join(
        points, intervals, "ts", "w_start", "w_end", on=["user_id"], bucket_width=width
    )
    pairs = {(r["event_id"], r["iv_id"]) for r in got.collect()}
    assert pairs == _expected_pairs(points, intervals)
    # each pair appears exactly once (a point lives in exactly one bucket)
    assert got.count() == len(pairs)


def test_interval_join_numeric_axis_and_no_nested_loop(spark):
    points = spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (3, 17.5), (4, 100.0)], "pid long, x double"
    )
    intervals = spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 9.0, 20.0)], "iv string, lo double, hi double"
    )
    got = bucketized_interval_join(points, intervals, "x", "lo", "hi", on=None, bucket_width=10)
    pairs = {(r["pid"], r["iv"]) for r in got.collect()}
    assert pairs == {(1, "a"), (2, "a"), (2, "b"), (3, "b")}
    # the whole point of the operator: the physical plan is an equi-join,
    # never BroadcastNestedLoopJoin / CartesianProduct
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_join_rejects_colliding_columns(spark):
    df = spark.createDataFrame([(1, 2.0, 3.0)], "a long, lo double, hi double")
    with pytest.raises(ValueError, match="disjoint"):
        bucketized_interval_join(df, df, "a", "lo", "hi", on=None, bucket_width=1)


def test_segment_dedup(spark):
    seg_a = " ".join(f"a{i}" for i in range(4))
    seg_b = " ".join(f"b{i}" for i in range(4))
    seg_c = " ".join(f"c{i}" for i in range(4))
    docs = spark.createDataFrame(
        [
            (1, f"{seg_a} {seg_b}"),          # owns first copy of a and b
            (2, f"{seg_b} {seg_c}"),          # b deduped away, c kept
            (3, f"{seg_a} {seg_a}"),          # within-doc repeat: both deduped
            (4, ""),                            # empty doc survives
            (5, "tail only three"),             # short last segment (<seg_tokens)
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in segment_dedup(docs, "text", "doc_id", seg_tokens=4).collect()
    }
    assert len(out) == 5
    assert out[1]["clean_text"] == f"{seg_a} {seg_b}" and out[1]["n_kept"] == 2
    assert out[2]["clean_text"] == seg_c and out[2]["n_kept"] == 1
    assert out[2]["n_segments"] == 2
    assert out[3]["clean_text"] == "" and out[3]["n_kept"] == 0 and out[3]["n_segments"] == 2
    assert out[4]["clean_text"] == "" and out[4]["n_segments"] == 0
    assert out[5]["clean_text"] == "tail only three" and out[5]["n_kept"] == 1


def test_segment_dedup_preserves_segment_order(spark):
    docs = spark.createDataFrame(
        [(1, "x x x x"), (2, "q q q q x x x x z z z z")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in segment_dedup(docs, seg_tokens=4).collect()}
    # doc 2 keeps segments 0 and 2 in order; segment 1 ('x x x x') lost to doc 1
    assert out[2]["clean_text"] == "q q q q z z z z"
    assert out[1]["clean_text"] == "x x x x"


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@foo-bar.example.org then 192.168.0.1 and +4915112345678 done"),
            (2, "no pii here 1234"),
            (3, None),
        ],
        "id long, text string",
    )
    out = {r["id"]: r for r in redact_pii(df, "text").collect()}
    r1 = out[1]
    assert (r1["n_email"], r1["n_ipv4"], r1["n_phone"]) == (1, 1, 1)
    assert r1["redacted"] == "mail <EMAIL> then <IP> and <PHONE> done"
    assert (out[2]["n_email"], out[2]["n_ipv4"], out[2]["n_phone"]) == (0, 0, 0)
    assert out[2]["redacted"] == "no pii here 1234"
    assert out[3]["redacted"] == ""  # NULL-safe


# ---------------------------------------------------------------- asof_join


@pytest.fixture()
def asof_frames(spark):
    from anomaly_detector_spark.operators.ranges import asof_join  # noqa: F401

    left = spark.createDataFrame(
        [
            (1, "u1", _ts(100), 10.0),   # after r@50 -> 5.0
            (2, "u1", _ts(200), 20.0),   # == r@200 -> inclusive match 7.0
            (3, "u1", _ts(201), 30.0),   # just after r@200 -> 7.0
            (4, "u1", _ts(40), 40.0),    # before any right row -> NULL
            (5, "u2", _ts(500), 50.0),   # u2 has no right rows -> NULL
            (6, "u3", _ts(1000), 60.0),  # dup right instants -> greatest payload
        ],
        "event_id long, k string, ts timestamp, v double",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(50), 5.0),
            ("u1", _ts(200), 7.0),
            ("u1", _ts(300), 9.0),      # later than every left row -> never picked
            ("u3", _ts(900), 1.0),      # duplicate instant...
            ("u3", _ts(900), 3.0),      # ...greatest payload struct wins
        ],
        "k string, ts timestamp, rv double",
    )
    return left, right


def test_asof_join_backward_inclusive(asof_frames):
    from anomaly_detector_spark.operators.ranges import asof_join

    left, right = asof_frames
    out = asof_join(left, right, on="ts", by=["k"])
    rows = {r["event_id"]: r for r in out.collect()}
    assert len(rows) == 6
    assert rows[1]["rv"] == 5.0 and rows[1]["ts_asof"] == _ts(50)
    assert rows[2]["rv"] == 7.0          # inclusive at equality
    assert rows[3]["rv"] == 7.0
    assert rows[4]["rv"] is None and rows[4]["ts_asof"] is None
    assert rows[5]["rv"] is None
    assert rows[6]["rv"] == 3.0          # deterministic dup-instant tiebreak


def test_asof_join_tolerance_nulls_stale_match(asof_frames):
    from anomaly_detector_spark.operators.ranges import asof_join

    left, right = asof_frames
    out = asof_join(left, right, on="ts", by=["k"], tolerance=50.0)
    rows = {r["event_id"]: r for r in out.collect()}
    assert rows[1]["rv"] == 5.0          # gap 50s == tolerance -> kept
    assert rows[2]["rv"] == 7.0          # gap 0
    assert rows[3]["rv"] == 7.0          # gap 1s
    assert rows[6]["rv"] is None         # gap 100s > 50s -> nulled, NOT replaced


def test_asof_join_matches_pandas_merge_asof(spark):
    import pandas as pd

    from anomaly_detector_spark.operators.ranges import asof_join

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("pv")
    )
    got = (
        asof_join(clicks, purch, on="ts", by=["user_id"])
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    pev = ev.toPandas()
    lc = pev[pev.event_type == "click"][["event_id", "user_id", "ts", "value"]].sort_values("ts")
    rp = (
        pev[pev.event_type == "purchase"][["user_id", "ts", "value"]]
        .rename(columns={"value": "pv"})
        .sort_values("ts")
    )
    want = pd.merge_asof(lc, rp, on="ts", by="user_id", direction="backward").set_index(
        "event_id"
    ).sort_index()
    a, b = got["pv"].astype(float), want["pv"].astype(float)
    assert ((a == b) | (a.isna() & b.isna())).all()


def test_asof_join_rejects_unkeyed_and_collisions(asof_frames):
    from anomaly_detector_spark.operators.ranges import asof_join

    left, right = asof_frames
    with pytest.raises(ValueError, match="one task"):
        asof_join(left, right.withColumnRenamed("k", "k2"), on="ts")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("rv", "v"), on="ts", by=["k"])


def test_chunk_documents_overlap_and_edges(spark):
    from anomaly_detector_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [
            (1, "a b c d e"),        # 5 tokens
            (2, "a b c d e f"),      # 6 tokens
            (3, "a b"),              # shorter than one window
            (4, ""),                 # empty -> no rows
            (5, None),               # NULL -> no rows
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_tokens=3, stride=2)
    rows = {(r["doc_id"], r["chunk_idx"]): (r["n_tokens"], r["chunk"]) for r in out.collect()}
    assert rows[(1, 0)] == (3, "a b c") and rows[(1, 1)] == (3, "c d e")
    assert rows[(2, 0)] == (3, "a b c")
    assert rows[(2, 1)] == (3, "c d e")
    assert rows[(2, 2)] == (2, "e f")  # tail chunk, shorter
    assert rows[(3, 0)] == (2, "a b")
    assert not any(d in (4, 5) for d, _ in rows)
    assert len(rows) == 6
    # every token of every doc is covered by at least one chunk
    import pytest

    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=3, stride=4)
