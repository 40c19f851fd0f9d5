"""Sketch-store compaction (plans/stores.py)."""

import glob

import pytest
from pyspark.sql import functions as F


def _files(spark, lo, hi, lang="py"):
    return spark.range(lo, hi).select(
        F.lit(lang).alias("lang"),
        F.concat(F.lit("r"), (F.col("id") % 7).cast("string")).alias("repo"),
        F.concat(F.lit("p"), F.col("id").cast("string")).alias("path"),
        F.concat(F.lit("c"), F.col("id").cast("string")).alias("commit"),
        F.concat(F.lit("body "), F.col("id").cast("string")).alias("content"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"),
    )


def test_compact_kmv_preserves_novelty(spark, tmp_path):
    from anomaly_detector_spark.plans.manifest import novelty_stats, run_with_manifest
    from anomaly_detector_spark.plans.stores import compact_store

    kmv = str(tmp_path / "kmv")
    md = str(tmp_path / "m")
    for i, (lo, hi) in enumerate([(0, 100), (50, 150), (100, 200), (120, 260)]):
        run_with_manifest(
            _files(spark, lo, hi), md, kmv_sketches_dir=kmv,
            run_id=f"r{i}", revalidate=i > 0,
        )
    before = {r["partition_key"]: r for r in novelty_stats(spark, kmv).collect()}
    files_before = len(glob.glob(f"{kmv}/part-*.parquet"))
    n = compact_store(spark, kmv, "kmv")
    after = {r["partition_key"]: r for r in novelty_stats(spark, kmv).collect()}
    assert before == after  # latest-vs-history algebra survives verbatim
    files_after = len(glob.glob(f"{kmv}/part-*.parquet"))
    assert files_after < files_before
    assert n == spark.read.parquet(kmv).count()
    # compacting an already-compacted store is a no-op for readers
    compact_store(spark, kmv, "kmv")
    assert {r["partition_key"]: r for r in novelty_stats(spark, kmv).collect()} == before


def test_compact_membership_and_hll_preserve_readers(spark, tmp_path):
    from anomaly_detector_spark.plans.manifest import (
        global_distinct,
        run_with_manifest,
        seen_before,
    )
    from anomaly_detector_spark.plans.stores import compact_store

    mb, hll, md = (str(tmp_path / d) for d in ("mb", "hll", "m"))
    for i, (lo, hi) in enumerate([(0, 120), (100, 240), (200, 360)]):
        run_with_manifest(
            _files(spark, lo, hi), md, membership_dir=mb, sketches_dir=hll,
            run_id=f"r{i}", revalidate=i > 0,
        )
    probe = _files(spark, 300, 420)
    b_seen = {
        r["path"]: r["maybe_seen"]
        for r in seen_before(spark, mb, probe, key_cols=["repo", "path", "commit"]).collect()
    }
    b_dist = global_distinct(spark, hll).collect()[0]
    compact_store(spark, mb, "membership")
    compact_store(spark, hll, "hll")
    a_seen = {
        r["path"]: r["maybe_seen"]
        for r in seen_before(spark, mb, probe, key_cols=["repo", "path", "commit"]).collect()
    }
    a_dist = global_distinct(spark, hll).collect()[0]
    assert b_seen == a_seen
    assert b_dist["distinct_estimate"] == a_dist["distinct_estimate"]
    # bad family is rejected, not guessed
    with pytest.raises(ValueError, match="unknown store family"):
        compact_store(spark, mb, "bloom")


def test_cli_compact_stores_flag(spark, tmp_path):
    from anomaly_detector_spark.cli import main
    from anomaly_detector_spark.plans.manifest import novelty_stats

    inp = str(tmp_path / "in")
    # union of the two runs = 250 keys < k=256: exact set algebra holds
    _files(spark, 0, 150).write.parquet(inp)
    kmv, md = str(tmp_path / "kmv"), str(tmp_path / "m")
    args = [
        "--input", inp, "--manifest", md, "--kmv-sketches", kmv,
        "--min-rows", "1",
    ]
    assert main(args + ["--run-id", "r1"]) == 0
    _files(spark, 100, 250).write.mode("overwrite").parquet(inp)
    assert main(args + ["--run-id", "r2", "--revalidate", "--compact-stores"]) == 0
    # the store was compacted AND the latest-vs-history answer survives
    st = novelty_stats(spark, kmv).collect()[0]
    assert st["run_id"] == "r2" and st["est_new_b"] == 100.0


def test_compact_quarantine_coalesces_files_rows_verbatim(spark, tmp_path):
    # per-batch quarantine appends accrete tiny files — exactly the
    # small-files problem run_small_files flags; compaction coalesces
    # the store and keeps every row byte-identical
    import os

    from anomaly_detector_spark.plans.stores import compact_store

    qdir = str(tmp_path / "corrupt")
    for b in range(5):
        rows = [(f"bad line {b}-{i}", f"file:/in/f{b}.jsonl", f"stream-{b:09d}")
                for i in range(3)]
        spark.createDataFrame(
            rows, "_corrupt_record string, source_file string, run_id string"
        ).coalesce(1).write.mode("append").parquet(qdir)

    before = sorted(r for r in os.listdir(qdir) if r.endswith(".parquet"))
    assert len(before) == 5
    truth = sorted(map(tuple, spark.read.parquet(qdir).collect()))

    n = compact_store(spark, qdir, "quarantine")
    assert n == 15
    after = [r for r in os.listdir(qdir) if r.endswith(".parquet")]
    assert len(after) == 1
    assert sorted(map(tuple, spark.read.parquet(qdir).collect())) == truth


def test_compact_assignment_stores_preserve_incremental_readers(spark, tmp_path):
    """bands / winnow_fps compaction: retried-append duplicates collapse
    to one row per assignment key, run_id survives as the max per row
    (NOT a synthetic id — the incremental protocol's own-run filter
    depends on it), and a subsequent ingest computes the SAME pairs."""
    from anomaly_detector_spark.operators.dedup import (
        containment_pairs,
        incremental_containment_pairs,
        incremental_lsh_candidates,
        minhash_lsh_candidates,
    )
    from anomaly_detector_spark.plans.stores import compact_store

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    small = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df1 = spark.createDataFrame(
        [(1, base), (2, small)], "doc_id long, text string"
    )
    df2 = spark.createDataFrame(
        [(3, base.replace("lazy", "sleepy")), (4, "filler " * 20 + small)],
        "doc_id long, text string",
    )

    # --- bands ---
    bands = str(tmp_path / "bands")
    incremental_lsh_candidates(spark, df1, bands, "r1")
    incremental_lsh_candidates(spark, df1, bands, "r1")  # crash-retry duplicates
    pre = spark.read.parquet(bands).count()
    n = compact_store(spark, bands, "bands")
    assert n < pre  # duplicates collapsed
    assert spark.read.parquet(bands).filter(F.col("run_id") != "r1").count() == 0
    p2 = {(r.id_a, r.id_b) for r in
          incremental_lsh_candidates(spark, df2, bands, "r2").collect()}
    full = {(r.id_a, r.id_b) for r in
            minhash_lsh_candidates(df1.unionByName(df2)).collect()}
    p1 = {(r.id_a, r.id_b) for r in
          incremental_lsh_candidates(spark, df1, str(tmp_path / "b0"), "x").collect()}
    assert p1 | p2 == full

    # --- winnow_fps ---
    fps = str(tmp_path / "fps")
    incremental_containment_pairs(spark, df1, fps, "r1", threshold=0.5)
    incremental_containment_pairs(spark, df1, fps, "r1", threshold=0.5)  # retry
    pre = spark.read.parquet(fps).count()
    n = compact_store(spark, fps, "winnow_fps")
    assert n < pre
    assert spark.read.parquet(fps).filter(F.col("run_id") != "r1").count() == 0
    q2 = {(r.id_a, r.id_b, r.containment) for r in
          incremental_containment_pairs(spark, df2, fps, "r2", threshold=0.5).collect()}
    q1 = {(r.id_a, r.id_b, r.containment) for r in
          incremental_containment_pairs(
              spark, df1, str(tmp_path / "f0"), "x", threshold=0.5).collect()}
    fullc = {(r.id_a, r.id_b, r.containment) for r in
             containment_pairs(df1.unionByName(df2), threshold=0.5).collect()}
    assert q1 | q2 == fullc
