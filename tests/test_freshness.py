"""Freshness check (checks/freshness.py)."""

import datetime

from anomaly_detector_spark.checks.base import CheckSpec, FAIL, PASS, SKIPPED
from anomaly_detector_spark.checks.freshness import partition_freshness, run_freshness


def _events(spark):
    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    rows = []
    for i in range(5):
        rows.append(("fresh", t0 + datetime.timedelta(minutes=i)))
        rows.append(("stale", t0 - datetime.timedelta(hours=2) + datetime.timedelta(minutes=i)))
    rows.append(("tiny", t0))
    return spark.createDataFrame(rows, "kind string, ts timestamp")


def test_self_relative_freshness(spark):
    df = _events(spark)
    spec = CheckSpec(
        "fresh", run_freshness, {"ts_col": "ts", "max_age_seconds": 3600}, "kind", 2
    )
    res = spec.run(df)
    v = {r["partition_key"]: r["verdict"] for r in res.verdicts.collect()}
    assert v == {"fresh": PASS, "stale": FAIL, "tiny": SKIPPED}
    ages = {r["kind"]: r["age_seconds"] for r in res.metrics.collect()}
    assert ages["fresh"] == 0  # the global-max partition is its own anchor
    assert ages["stale"] == 2 * 3600
    assert res.violations.count() == 0  # verdict-only check


def test_explicit_as_of(spark):
    df = _events(spark)
    per = {
        r["kind"]: r["age_seconds"]
        for r in partition_freshness(df, "kind", "ts", as_of="2026-01-01 13:00:00").collect()
    }
    assert per["fresh"] == 3600 - 4 * 60
    assert per["tiny"] == 3600


def test_wall_clock_mode_runs(spark):
    # as_of=None uses current_timestamp — just pin that it executes and
    # ages are non-negative (data is in the past)
    per = partition_freshness(_events(spark), "kind", "ts", as_of=None).collect()
    assert all(r["age_seconds"] >= 0 for r in per)


def _hourly(spark, kind, hours, t0=datetime.datetime(2026, 1, 1, 0, 0, 0)):
    # two rows per present hour (coverage counts SLOTS, not rows)
    rows = [
        (kind, t0 + datetime.timedelta(hours=h, minutes=m)) for h in hours for m in (5, 35)
    ]
    return spark.createDataFrame(rows, "kind string, ts timestamp")


def test_slot_coverage_self_span(spark):
    from anomaly_detector_spark.checks.freshness import slot_coverage

    full = _hourly(spark, "full", range(24))
    holey = _hourly(spark, "holey", [h for h in range(24) if h not in (3, 9, 10, 11)])
    per = {
        r["partition_key"]: r
        for r in slot_coverage(full.unionByName(holey), "kind", "ts", "hour").collect()
    }
    f, h = per["full"], per["holey"]
    assert (f["n_slots_expected"], f["n_missing"], f["coverage"], f["max_gap"]) == (24, 0, 1.0, 0)
    assert f["n_rows"] == 48
    assert (h["n_slots_expected"], h["n_slots_observed"], h["n_missing"]) == (24, 20, 4)
    assert h["max_gap"] == 3  # the 9-11 run, not the lone hour 3
    assert h["coverage"] == round(20 / 24, 6)


def test_slot_coverage_global_and_explicit_span(spark):
    from anomaly_detector_spark.checks.freshness import missing_slots, slot_coverage

    early = _hourly(spark, "early", range(0, 12))   # dies at noon
    late = _hourly(spark, "late", range(6, 24))     # starts late
    df = early.unionByName(late)
    per = {r["partition_key"]: r for r in slot_coverage(df, "kind", "ts", "hour", span="global").collect()}
    # global span = hours 0..23 for BOTH; edge gaps must count
    assert per["early"]["n_slots_expected"] == 24 and per["early"]["n_missing"] == 12
    assert per["early"]["max_gap"] == 12  # trailing run, invisible to the lag window
    assert per["late"]["max_gap"] == 6    # leading run
    # explicit declared window
    lo, hi = "2026-01-01 00:00:00", "2026-01-01 23:00:00"
    per2 = {r["partition_key"]: r for r in slot_coverage(df, "kind", "ts", "hour", span=(lo, hi)).collect()}
    assert per2["early"]["n_missing"] == 12 and per2["late"]["n_missing"] == 6
    # triage identity: exactly the absent hours come back
    miss = missing_slots(df, "kind", "ts", "hour", span="global")
    got = sorted(
        (r["partition_key"], r["slot"].hour) for r in miss.collect()
    )
    assert got == sorted(
        [("early", h) for h in range(12, 24)] + [("late", h) for h in range(0, 6)]
    )


def test_run_coverage_check_json_declarable(spark):
    from anomaly_detector_spark.plans.config import suite_from_config

    full = _hourly(spark, "full", range(24))
    holey = _hourly(spark, "holey", [h for h in range(24) if h != 7])
    tiny = spark.createDataFrame(
        [("tiny", datetime.datetime(2026, 1, 1, 0, 0, 0))], "kind string, ts timestamp"
    )
    df = full.unionByName(holey).unionByName(tiny)
    suite = suite_from_config(
        {
            "partition_col": "kind",
            "min_rows": 2,
            "checks": [{"check": "coverage", "ts_col": "ts", "granularity": "hour"}],
        }
    )
    res = suite[0].run(df)
    v = {r["partition_key"]: r["verdict"] for r in res.verdicts.collect()}
    assert v == {"full": PASS, "holey": FAIL, "tiny": SKIPPED}
    assert res.violations.count() == 0
    # a tolerance band passes the single missing hour; max_gap still gates
    lax = suite_from_config(
        {
            "partition_col": "kind",
            "min_rows": 2,
            "checks": [
                {"check": "coverage", "ts_col": "ts", "min_coverage": 0.9, "max_gap": 2}
            ],
        }
    )
    v2 = {r["partition_key"]: r["verdict"] for r in lax[0].run(df).verdicts.collect()}
    assert v2 == {"full": PASS, "holey": PASS, "tiny": SKIPPED}
    assert suite[0].id != lax[0].id
