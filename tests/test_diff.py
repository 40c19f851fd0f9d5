"""Violation diffing (plans/diff.py) + stamped violations sink."""

from anomaly_detector_spark.checks.base import CheckSpec
from anomaly_detector_spark.checks.rowrules import run_completeness
from anomaly_detector_spark.plans.diff import violations_diff, violations_diff_runs
from anomaly_detector_spark.plans.manifest import run_with_manifest

VIOL_COLS = (
    "repo string, path string, commit string, partition_key string, "
    "check_id string, observed string, expected string"
)


def mkviol(spark, rows):
    return spark.createDataFrame(
        [(r, p, c, "python", "chk", "o", "e") for r, p, c in rows], VIOL_COLS
    )


def test_diff_statuses(spark):
    prev = mkviol(spark, [("r", "a", "c1"), ("r", "b", "c1"), ("r", "b", "c1")])
    cur = mkviol(spark, [("r", "b", "c1"), ("r", "x", "c9")])
    out = {r["path"]: r.asDict() for r in violations_diff(cur, prev).collect()}
    assert out["a"]["status"] == "resolved" and out["a"]["n_cur"] == 0
    assert out["b"]["status"] == "persisting"
    assert (out["b"]["n_cur"], out["b"]["n_prev"]) == (1, 2)  # improving magnitude
    assert out["x"]["status"] == "new" and out["x"]["n_prev"] == 0


def test_diff_runs_from_stamped_sink(spark, tmp_path):
    mdir, vdir = str(tmp_path / "m"), str(tmp_path / "v")
    suite = [CheckSpec("cmp", run_completeness, {"column": "content"}, "lang", 1)]

    def files(with_null: bool):
        rows = [("r", f"p{i}", "c", "python", "x") for i in range(5)]
        rows.append(("r", "bad0", "c", "python", None))  # persists
        if with_null:
            rows.append(("r", "bad1", "c", "python", None))  # appears in run 2
        return spark.createDataFrame(
            rows, "repo string, path string, commit string, lang string, content string"
        )

    run_with_manifest(
        files(False), mdir, suite=suite, run_id="r1", revalidate=True, violations_sink=vdir
    )
    run_with_manifest(
        files(True), mdir, suite=suite, run_id="r2", revalidate=True, violations_sink=vdir
    )
    sink = spark.read.parquet(vdir)
    assert set(sink.columns) >= {"run_id", "suite_id", "repo", "check_id"}
    out = {
        r["path"]: r["status"]
        for r in violations_diff_runs(sink, cur_run="r2", prev_run="r1").collect()
    }
    assert out == {"bad0": "persisting", "bad1": "new"}
    # reversed direction: the extra violation reads as resolved
    back = {
        r["path"]: r["status"]
        for r in violations_diff_runs(sink, cur_run="r1", prev_run="r2").collect()
    }
    assert back == {"bad0": "persisting", "bad1": "resolved"}


def test_snapshot_diff_statuses(spark):
    from anomaly_detector_spark.plans.diff import snapshot_diff

    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d"), (4, "d2"), (5, "e"), (5, "e"), (None, "n")],
        "k int, v string",
    )
    right = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d2"), (4, "d"), (5, "e"), (6, "f"), (None, "n")],
        "k int, v string",
    )
    out = {r["k"]: r for r in snapshot_diff(left, right, ["k"]).collect()}
    assert len(out) == 7
    assert out[1]["status"] == "unchanged"
    assert out[2]["status"] == "changed"
    assert out[3]["status"] == "removed" and out[3]["n_right"] == 0
    # duplicate key, same multiset in a different order -> unchanged
    assert out[4]["status"] == "unchanged" and out[4]["n_left"] == 2
    # duplicate key, multiplicity 2 vs 1 of the same content -> changed
    assert out[5]["status"] == "changed"
    assert out[6]["status"] == "added" and out[6]["n_left"] == 0
    # a NULL key groups once like any other value
    assert out[None]["status"] == "unchanged"


def test_snapshot_diff_algebra(spark):
    """Algebraic invariants over a realistic table (synth planted dup
    keys exercise the multiset fingerprint): identity -> all unchanged,
    empty right -> all removed, argument swap flips added<->removed and
    transposes the per-side counts."""
    from pyspark.sql import functions as F

    from anomaly_detector_spark.plans.diff import snapshot_diff
    from anomaly_detector_spark.synth import synth_files

    df = synth_files(spark, 2000)
    keys = ["repo", "path", "commit"]
    assert snapshot_diff(df, df, keys).filter("status <> 'unchanged'").count() == 0
    assert (
        snapshot_diff(df, df.filter("1=0"), keys).filter("status <> 'removed'").count() == 0
    )
    mut = df.filter(F.xxhash64("repo", "path", "commit") % 5 != 0).withColumn(
        "content",
        F.when(
            F.xxhash64("path") % 7 == 0,
            F.concat(F.coalesce(F.col("content"), F.lit("")), F.lit("!")),
        ).otherwise(F.col("content")),
    )
    a = {
        (r["repo"], r["path"], r["commit"]): (r["status"], r["n_left"], r["n_right"])
        for r in snapshot_diff(df, mut, keys).collect()
    }
    b = {
        (r["repo"], r["path"], r["commit"]): (r["status"], r["n_left"], r["n_right"])
        for r in snapshot_diff(mut, df, keys).collect()
    }
    flip = {"added": "removed", "removed": "added", "changed": "changed", "unchanged": "unchanged"}
    assert a.keys() == b.keys()
    # the mutation really produced a mix of statuses
    assert {s for s, _, _ in a.values()} >= {"removed", "changed", "unchanged"}
    for k, (s, nl, nr) in a.items():
        assert b[k] == (flip[s], nr, nl)
