"""Sketch-store compaction: keep the stores O(partitions), not O(runs).

Every run_with_manifest sketch sink appends one parquet file per run
(HLL / t-digest / top-k / bloom / KMV). At a daily cadence that is 365
files a year per store — small-file pressure on the store reads and a
linearly growing merge input for every cross-run query, even though
each family is mergeable BY DESIGN and its readers already collapse
the history. Compaction rewrites a store into the minimal form that
preserves every reader's answer exactly:

* ``hll`` / ``tdigest`` / ``topk`` — readers dedupe to the latest row
  per (suite_id, partition_key) (a partition commits at most once per
  suite; at-least-once replays are superseded by run_id). Compaction
  keeps exactly those surviving rows.
* ``membership`` (bloom) — bit_or is idempotent and associative;
  compaction ORs every run's words into one row per (suite_id,
  partition_key, word_idx) under a synthetic run id. seen_before /
  membership_stats re-merge on read, so a merged store is a no-op
  for them.
* ``kmv`` — history runs merge to bottom-k per (suite_id,
  partition_key) under a synthetic run id, but the LATEST run is
  PRESERVED under its own run_id: novelty_stats' "latest vs everything
  before" split must survive compaction (kmv_merge idempotence makes
  the merged history identical to merging the raw runs).

The rewrite is read-all -> overwrite-dir (two jobs over KB..MB of
sketch rows). It is NOT concurrency-safe against a writer appending
mid-rewrite — run it from the same scheduler slot that owns the
validation runs (the manifest writer is single-writer by design, so
this costs nothing). The synthetic run id sorts BELOW real run ids
only if your run ids are lexicographically above "0" — it is chosen
as "0compact-<n>" for that reason (max_by(run_id) readers must prefer
any real re-commit over the compacted row).

Schema snapshots (schemas_dir) and drift-histogram stores (hist_dir)
are deliberately NOT compactable: their value IS the per-run history
(schema_changes walks consecutive runs; rolling_baseline averages the
last K).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["compact_store"]

_LATEST_FAMILIES = ("hll", "tdigest", "topk")


def _rewrite(spark: SparkSession, out: DataFrame, store_dir: str) -> int:
    rows = out.localCheckpoint()  # sever lineage from the files we overwrite
    n = rows.count()
    rows.write.mode("overwrite").parquet(store_dir)
    return n


def compact_store(spark: SparkSession, store_dir: str, family: str) -> int:
    """Compact a sketch store in place; returns the surviving row count.

    ``family``: one of ``hll`` | ``tdigest`` | ``topk`` (keep latest row
    per (suite_id, partition_key)), ``membership`` (bit_or words),
    ``kmv`` (bottom-k history under a synthetic run id, latest run kept
    verbatim), ``quarantine`` (rows kept VERBATIM, files coalesced —
    the corrupt-line sink accretes one tiny parquet append per
    micro-batch/run, exactly the small-files problem run_small_files
    flags; ~1M rows per output file). Raises on unknown families rather
    than guessing — a wrong family rule silently corrupts estimators."""
    df = spark.read.parquet(store_dir)
    if family == "quarantine":
        rows = df.localCheckpoint()
        n = rows.count()
        rows.coalesce(max(1, (n + 999_999) // 1_000_000)).write.mode(
            "overwrite"
        ).parquet(store_dir)
        return n
    if family in _LATEST_FAMILIES:
        cols = [c for c in df.columns if c not in ("suite_id", "partition_key", "run_id")]
        out = df.groupBy("suite_id", "partition_key").agg(
            F.max("run_id").alias("run_id"),
            *[F.max_by(c, "run_id").alias(c) for c in cols],
        )
        return _rewrite(spark, out.select(*df.columns), store_dir)
    if family == "membership":
        params = [c for c in ("n_bits", "k", "mode") if c in df.columns]
        out = df.groupBy("suite_id", "partition_key", "word_idx", *params).agg(
            F.bit_or("bits").alias("bits"),
            F.concat(F.lit("0compact-"), F.count(F.lit(1)).cast("string")).alias(
                "run_id"
            ),
        )
        return _rewrite(spark, out.select(*df.columns), store_dir)
    if family == "kmv":
        from ..checks.kmv import kmv_merge

        last = df.agg(F.max("run_id")).first()[0]
        latest = df.filter(F.col("run_id") == last)
        hist = df.filter(F.col("run_id") < last)
        if hist.isEmpty():
            return df.count()  # single run: nothing to compact
        # per-suite merge: kmv_merge has no suite column, so loop the
        # (few) suite ids driver-side — each merge is O(k x partitions)
        suites = [r["suite_id"] for r in hist.select("suite_id").distinct().collect()]
        parts = []
        for sid in suites:
            h = hist.filter(F.col("suite_id") == sid)
            parts.append(
                kmv_merge(h.select("partition_key", "u", "k", "mode"))
                .withColumn("run_id", F.lit("0compact"))
                .withColumn("suite_id", F.lit(sid))
            )
        from functools import reduce

        out = reduce(lambda a, b: a.unionByName(b), parts).select(*df.columns)
        return _rewrite(spark, out.unionByName(latest.select(*df.columns)), store_dir)
    if family in ("bands", "winnow_fps", "phash_blocks"):
        # content-derived assignment rows (incremental LSH band store /
        # incremental containment fingerprint store): retried appends
        # duplicate rows byte-for-byte, so compaction is one surviving
        # row per assignment key. run_id is kept as the MAX per row —
        # NOT a synthetic id — because the incremental read path filters
        # `run_id != current` to hide a run's own append from its own
        # computation; rewriting run_ids would make a crash-retry AFTER
        # compaction see its earlier rows as "old" and double-report
        # pairs under both kinds. max_by on the payload column is
        # deterministic: the payload is a pure function of content, so
        # every duplicate carries the same value.
        key = {
            "bands": ["doc_id", "band_idx"],
            "winnow_fps": ["doc_id", "fingerprint"],
            "phash_blocks": ["media_id", "block_idx"],
        }[family]
        payload = [c for c in df.columns if c not in (*key, "run_id")]
        out = df.groupBy(*key).agg(
            F.max("run_id").alias("run_id"),
            *[F.max_by(c, "run_id").alias(c) for c in payload],
        )
        return _rewrite(spark, out.select(*df.columns), store_dir)
    if family == "linefreq":
        # additive counts: readers SUM per line_hash, so the compacted
        # form is one summed row per line under a synthetic run id —
        # reader answers preserved exactly (idempotent re-compaction)
        out = (
            df.groupBy("line_hash")
            .agg(F.sum("n_docs").alias("n_docs"))
            .select(F.lit("0compact").alias("run_id"), "line_hash", "n_docs")
        )
        return _rewrite(spark, out.select(*df.columns), store_dir)
    raise ValueError(
        f"unknown store family {family!r}: use hll | tdigest | topk | "
        "membership | kmv | linefreq | bands | winnow_fps | quarantine"
    )


# Compaction cadence (measured, tools/incr_dedup_bench.py 25-cycle
# containment run; BASELINE.md round-4): the incremental read path's
# per-cycle cost creeps with store FILE COUNT (each append adds one
# file set), not bytes — +25% by 25 uncompacted cycles at 32 files per
# append. compact_store costs ~1-2s at that scale and resets the curve.
# Recommended cadence: every ~5 increments, or whenever the store's
# file count exceeds ~10x the writer's parallelism.
