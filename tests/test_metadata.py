"""Metadata-only validation: footer stats vs full scan, per-file verdicts."""

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from anomaly_detector_spark.checks.base import CheckSpec
from anomaly_detector_spark.checks.metadata import (
    footer_stats,
    list_parquet_files,
    run_metadata_stats,
)


def _write_dataset(spark, path, n=5000):
    df = spark.range(0, n).select(
        "id",
        F.when(F.col("id") % 100 == 0, None).otherwise((F.col("id") % 997).cast("double")).alias("v"),
        F.concat(F.lit("s"), F.col("id")).alias("s"),
    )
    df.repartition(6).write.mode("overwrite").parquet(path)
    return df


def test_footer_stats_match_full_scan(spark, tmp_path):
    path = str(tmp_path / "ds")
    df = _write_dataset(spark, path)
    files = list_parquet_files(path)
    assert len(files) == 6
    st = footer_stats(spark, files, ["v", "id"]).toPandas()
    # aggregate the footer rows and compare to a real scan
    agg = st.groupby("column").agg(
        n_rows=("n_rows", "sum"), nulls=("null_count", "sum"),
        lo=("min_val", "min"), hi=("max_val", "max"),
    )
    scan = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").isNull().cast("long")).alias("v_nulls"),
        F.min("v").alias("v_min"), F.max("v").alias("v_max"),
        F.min("id").alias("id_min"), F.max("id").alias("id_max"),
    ).first()
    assert agg.loc["v", "n_rows"] == scan["n"] and agg.loc["id", "n_rows"] == scan["n"]
    assert agg.loc["v", "nulls"] == scan["v_nulls"] and agg.loc["id", "nulls"] == 0
    assert agg.loc["v", "lo"] == scan["v_min"] and agg.loc["v", "hi"] == scan["v_max"]
    assert agg.loc["id", "lo"] == scan["id_min"] and agg.loc["id", "hi"] == scan["id_max"]


def test_footer_stats_string_and_missing_columns(spark, tmp_path):
    path = str(tmp_path / "ds")
    _write_dataset(spark, path, n=500)
    st = footer_stats(spark, list_parquet_files(path), ["s", "nope"]).toPandas()
    s = st[st["column"] == "s"]
    # string stats exist (null_count exact) but min/max are NOT exposed
    assert (s["null_count"] == 0).all() and s["min_val"].isna().all()
    miss = st[st["column"] == "nope"]
    assert miss["null_count"].isna().all() and len(miss) == len(s)


def test_metadata_check_per_file_verdicts(spark, tmp_path):
    good = str(tmp_path / "good")
    _write_dataset(spark, good, n=2000)
    # plant one file violating the range bound and one violating null-rate
    bad = str(tmp_path / "extra")
    spark.createDataFrame(
        [(10**9, 5000.0, "x"), (10**9 + 1, None, "y")], "id long, v double, s string"
    ).coalesce(1).write.mode("overwrite").parquet(bad)
    files = list_parquet_files(good) + list_parquet_files(bad)
    spec = CheckSpec(
        name="meta_stats",
        fn=run_metadata_stats,
        config={
            "files": files, "column": "v",
            "max_null_rate": 0.05, "min_allowed": 0.0, "max_allowed": 1000.0,
        },
        partition_col="file",
    )
    res = run_metadata_stats(spark.range(1), spec)
    v = {r["partition_key"].rsplit("/", 2)[-2:][0] + "/" + r["partition_key"].rsplit("/", 1)[-1]:
         r["verdict"] for r in res.verdicts.collect()}
    by_dir = {}
    for k, verdict in v.items():
        by_dir.setdefault(k.split("/")[0], set()).add(verdict)
    assert by_dir["good"] == {"PASS"}
    assert by_dir["extra"] == {"FAIL"}  # 50% nulls AND max 5000 > 1000


def test_metadata_check_skips_statless_file(spark, tmp_path):
    # a footer WITHOUT statistics must yield SKIPPED, never a silent PASS
    f = str(tmp_path / "nostats.parquet")
    pq.write_table(
        pa.table({"v": [1.0, None, 3.0]}), f, write_statistics=False
    )
    spec = CheckSpec(
        name="meta_stats", fn=run_metadata_stats,
        config={"files": [f], "column": "v", "max_null_rate": 0.9},
        partition_col="file",
    )
    res = run_metadata_stats(spark.range(1), spec)
    assert [r["verdict"] for r in res.verdicts.collect()] == ["SKIPPED"]


def test_metadata_check_via_suite_config(spark, tmp_path):
    # metadata_stats is declarable in a JSON suite document and runs as a
    # regular spec (the df argument is only used for the Spark session)
    from anomaly_detector_spark.plans.config import suite_from_config

    path = str(tmp_path / "ds")
    _write_dataset(spark, path, n=1000)
    suite = suite_from_config(
        {
            "checks": [
                {
                    "check": "metadata_stats",
                    "partition_col": "file",
                    "path": path,
                    "column": "v",
                    "max_null_rate": 0.5,
                }
            ]
        }
    )
    res = suite[0].run(spark.range(1))
    verdicts = [r["verdict"] for r in res.verdicts.collect()]
    assert verdicts and set(verdicts) == {"PASS"}


def test_tiered_validate_escalates_only_uncleared_files(spark, tmp_path):
    """plans/tiered.py: footer tier clears healthy files without touching
    data pages; only the planted-violation file and the statistics-less
    file escalate to the scan suite, re-keyed per file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from anomaly_detector_spark.checks.rowrules import run_row_predicate
    from anomaly_detector_spark.plans.tiered import tiered_validate
    from anomaly_detector_spark.synth import synth_files

    base = synth_files(spark, 3000, skew=False).withColumn(
        "v", (F.coalesce(F.length("content"), F.lit(0)) % 500).cast("double")
    )
    good = str(tmp_path / "good")
    base.repartition(4).write.mode("overwrite").parquet(good)
    bad = str(tmp_path / "bad")
    base.limit(50).withColumn("v", F.lit(5000.0)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(bad)
    statless = str(tmp_path / "nostats.parquet")
    pq.write_table(
        pa.Table.from_pandas(base.limit(20).toPandas()), statless, write_statistics=False
    )

    files = list_parquet_files(good) + list_parquet_files(bad) + [statless]
    rule = CheckSpec("v_range", run_row_predicate, {"expr": "v <= 1000"}, "lang")
    res = tiered_validate(
        spark,
        files,
        {"column": "v", "min_allowed": 0.0, "max_allowed": 1000.0},
        [rule],
    )
    assert len(res.cleared_files) == 4
    assert sorted(res.escalated_files) == sorted(list_parquet_files(bad) + [statless])
    tiers = {r["partition_key"]: (r["tier"], r["verdict"]) for r in res.verdicts().collect()}
    for f in res.cleared_files:
        assert tiers[f] == ("metadata", "PASS")
    badfile = list_parquet_files(bad)[0]
    assert tiers[badfile] == ("scan", "FAIL")
    assert tiers[statless] == ("scan", "PASS")  # proved clean by scanning
    # every input file ends with exactly one authoritative verdict
    assert len(tiers) == len(files)
    # the scan tier saw ONLY the escalated files (one rule x two files)
    assert res.scan is not None and res.scan.verdicts.count() == 2


def test_layout_health_flat_fails_clustered_passes(spark, tmp_path):
    from anomaly_detector_spark.checks.metadata import run_layout_health
    from anomaly_detector_spark.operators.layout import cluster_write

    n = 20_000
    df = (
        spark.range(0, n)
        .select("id", F.xxhash64(F.col("id")).alias("h"))
        .select(
            "id",
            F.pmod(F.col("h"), F.lit(1000)).cast("double").alias("x"),
            F.pmod(F.xxhash64(F.col("h")), F.lit(1000)).cast("double").alias("y"),
        )
    )
    flat, z = str(tmp_path / "flat"), str(tmp_path / "z")
    df.repartition(16).write.parquet(flat)
    cluster_write(df, ["x", "y"], z, n_files=16)

    def verdicts(path):
        spec = CheckSpec(
            "layout", run_layout_health, {"path": path, "cols": ["x", "y"]}, "col_name", 2
        )
        res = run_layout_health(spark.range(1), spec)
        return {r["partition_key"]: r for r in res.verdicts.collect()}

    f, c = verdicts(flat), verdicts(z)
    # hash layout: depth_ratio near 1 on both dims -> FAIL the 0.5 gate
    assert {f["x"]["verdict"], f["y"]["verdict"]} == {"FAIL"}
    assert f["x"]["metrics"]["depth_ratio"] > 0.5
    # z-ordered: both dims prune -> PASS, measured amplification recorded
    assert {c["x"]["verdict"], c["y"]["verdict"]} == {"PASS"}
    assert c["x"]["metrics"]["avg_depth"] < f["x"]["metrics"]["avg_depth"]
    assert c["x"]["metrics"]["n_files"] == 16.0


def test_layout_health_gates_and_skip(spark, tmp_path):
    from anomaly_detector_spark.checks.metadata import run_layout_health
    from anomaly_detector_spark.plans.config import suite_from_config

    path = str(tmp_path / "two")
    spark.range(0, 100).select(F.col("id").cast("double").alias("x")).coalesce(
        2
    ).write.parquet(path)
    # 2 files < min_rows=25 -> SKIPPED regardless of layout
    suite = suite_from_config(
        {
            "checks": [
                {"check": "layout_health", "partition_col": "col_name",
                 "path": path, "cols": ["x"]}
            ]
        }
    )
    res = suite[0].run(spark.range(1))
    assert [r["verdict"] for r in res.verdicts.collect()] == ["SKIPPED"]
    # absolute gate: avg_depth of a 2-file range layout is 1.0 -> PASS at
    # max_avg_depth=1.5 with the relative gate disabled; FAIL at 0.9
    ok = CheckSpec(
        "layout", run_layout_health,
        {"path": path, "cols": ["x"], "max_avg_depth": 1.5}, "col_name", 2,
    )
    bad = CheckSpec(
        "layout", run_layout_health,
        {"path": path, "cols": ["x"], "max_avg_depth": 0.9}, "col_name", 2,
    )
    assert [r["verdict"] for r in run_layout_health(spark.range(1), ok).verdicts.collect()] == ["PASS"]
    assert [r["verdict"] for r in run_layout_health(spark.range(1), bad).verdicts.collect()] == ["FAIL"]


def test_file_inventory_reads_no_content(spark, tmp_path):
    # the inventory scan's ReadSchema must be listing-only — content
    # pruned, zero data bytes read
    from anomaly_detector_spark.checks.metadata import file_inventory

    _write_dataset(spark, str(tmp_path / "d"), n=500)
    inv = file_inventory(spark, str(tmp_path / "d"), glob="*.parquet")
    plan = inv._sc._jvm.PythonSQLUtils.explainString(
        inv._jdf.queryExecution(), "formatted"
    )
    assert "content" not in plan.split("ReadSchema")[1].splitlines()[0]
    rows = inv.collect()
    import os

    truth = {
        f: os.path.getsize(str(tmp_path / "d" / f))
        for f in os.listdir(str(tmp_path / "d"))
        if f.endswith(".parquet")
    }
    got = {r["path"].rsplit("/", 1)[1]: r["bytes"] for r in rows}
    assert got == truth  # sizes are the filesystem's, exactly


def test_run_small_files_gates_tiny_dirs(spark, tmp_path):
    # a dir of many tiny files FAILs, a healthy dir PASSes, and a dir
    # under the file-count guard is SKIPPED — one verdict per directory
    from anomaly_detector_spark.checks.metadata import run_small_files

    frag = spark.range(0, 2000)
    frag.repartition(40).write.parquet(str(tmp_path / "root" / "fragmented"))
    spark.range(0, 2000).coalesce(2).write.parquet(str(tmp_path / "root" / "healthy"))
    spark.range(0, 10).coalesce(1).write.parquet(str(tmp_path / "root" / "sparse"))

    spec = CheckSpec(
        "small_files",
        run_small_files,
        {
            "path": str(tmp_path / "root"),
            "glob": "*.parquet",
            # every test file is tiny in absolute terms; the RATIO of
            # sizes is the discriminator, so set the threshold between
            # the fragmented (~700 B) and healthy (~4.5 KB) file sizes
            "tiny_bytes": 2048,
            "max_tiny_share": 0.5,
        },
        partition_col="dir",
        min_rows=2,
    )
    res = spec.run(spark.range(1))
    v = {
        r["partition_key"].rsplit("/", 1)[1]: r["verdict"]
        for r in res.verdicts.collect()
    }
    assert v["fragmented"] == "FAIL"
    assert v["healthy"] == "PASS"
    assert v["sparse"] == "SKIPPED"  # 1 file < min_rows=2: not evidence
    m = {
        r["dir"].rsplit("/", 1)[1]: r for r in res.metrics.collect()
    }
    assert m["fragmented"]["n_files"] == 40 and m["fragmented"]["tiny_share"] == 1.0
    assert m["healthy"]["tiny_share"] == 0.0
