"""Metadata-only validation: verdicts from parquet footers, zero data pages.

Iceberg's killer feature at 10^12 files is that per-file column stats
(row count, null count, min/max) live in MANIFESTS, so whole classes of
checks never touch data. Raw parquet carries the same statistics in its
FOOTER (a few KB at the end of each file). This check reads ONLY those
footers — distributed, one task per batch of files — and derives
per-file verdicts for the constraints footer stats can answer exactly:

* row-count / null-rate bounds (row counts and null counts are exact),
* numeric min/max range bounds (parquet min/max for fixed-width numeric
  types are exact, unlike truncated string stats — this module refuses
  non-numeric bound checks rather than silently trusting them).

Scale design: the data volume is irrelevant — cost is O(files), each
task reads a footer (KB) per file, never a data page. At 10^12 files
the file LISTING itself must come from a table format's manifests (or a
previous run's inventory); the API therefore accepts an explicit path
list or frame, with driver-side directory listing only as the local
convenience. The footer reads run inside ``mapInPandas`` so a million
files fan out across the cluster instead of serializing through the
driver.

Relation to the scan checks: ``checks/stats.py`` answers the same
questions by scanning (plus quantiles/distincts, which footers cannot
answer); this module is the fast pre-filter — at 100 TB you run
metadata validation every cycle and fall back to the scan suite for the
files/partitions the footer pass cannot clear. The reference has no
analog (single-node pandas); this exists for the 10^12-file reframing.

A per-row content invariant footer stats CAN carry: this engine's
bucketed writer puts sha256(content) in the sort order, so min/max of
the hash column bound the content set per file — but equality checks
stay in the scan suite (F6).
"""

from __future__ import annotations

import sys
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import CheckResult, CheckSpec, empty_violations, verdict_frame

# Ship by value so executors without the package on PYTHONPATH still run
# the kernel (same guarantee as checks/quantiles.py).
try:  # pragma: no cover - trivial registration
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:
    pass

FOOTER_SCHEMA = (
    "file string, column string, n_rows long, null_count long, "
    "min_val double, max_val double"
)

_NUMERIC = {"INT32", "INT64", "FLOAT", "DOUBLE", "BOOLEAN"}


def list_parquet_files(path: str) -> list[str]:
    """Local convenience listing: a directory of .parquet files, or one file.

    At cluster scale, pass the file inventory explicitly (from Iceberg
    manifests / a previous run) instead — a driver glob over 10^12 files
    is the wrong tool and this helper makes no attempt to be it.
    """
    import glob as _glob
    import os

    if os.path.isdir(path):
        return sorted(_glob.glob(os.path.join(path, "*.parquet")))
    return [path]


def footer_stats(
    spark: SparkSession,
    files: list[str] | DataFrame,
    columns: list[str],
    n_tasks: int | None = None,
) -> DataFrame:
    """Per-(file, column) stats from parquet footers, read distributedly.

    Returns the long frame ``FOOTER_SCHEMA``; ``min_val``/``max_val`` are
    NULL for non-numeric columns (string min/max may be truncated by
    writers, so they are not exposed as if exact) and for row groups
    lacking statistics. ``n_rows``/``null_count`` are exact whenever the
    writer recorded them (nullable by spec, NULL here if absent).
    """
    if isinstance(files, DataFrame):
        paths = files.select(F.col(files.columns[0]).alias("file"))
    else:
        paths = spark.createDataFrame([(f,) for f in files], "file string")
    if n_tasks:
        paths = paths.repartition(n_tasks)
    cols = list(columns)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for pdf in batches:
            out: dict[str, list] = {k: [] for k in
                                    ("file", "column", "n_rows", "null_count",
                                     "min_val", "max_val")}
            for f in pdf["file"]:
                md = pq.ParquetFile(f).metadata
                names = {md.schema.column(i).name: i for i in range(md.num_columns)}
                for c in cols:
                    i = names.get(c)
                    if i is None:
                        out["file"].append(f); out["column"].append(c)
                        out["n_rows"].append(md.num_rows)
                        out["null_count"].append(None)
                        out["min_val"].append(None); out["max_val"].append(None)
                        continue
                    numeric = md.schema.column(i).physical_type in _NUMERIC
                    nulls, lo, hi, ok = 0, None, None, True
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(i).statistics
                        if st is None:
                            ok = False
                            break
                        nulls += st.null_count if st.null_count is not None else 0
                        if numeric and st.has_min_max:
                            mn, mx = float(st.min), float(st.max)
                            lo = mn if lo is None else min(lo, mn)
                            hi = mx if hi is None else max(hi, mx)
                    out["file"].append(f); out["column"].append(c)
                    out["n_rows"].append(md.num_rows)
                    out["null_count"].append(nulls if ok else None)
                    out["min_val"].append(lo if ok else None)
                    out["max_val"].append(hi if ok else None)
            yield pd.DataFrame(out)

    return paths.mapInPandas(kernel, FOOTER_SCHEMA)


def run_metadata_stats(df_or_files, spec: CheckSpec) -> CheckResult:
    """Per-FILE verdicts from footer stats alone.

    config:
      ``files``        explicit path list (else derived from config["path"])
      ``column``       the numeric column bounds apply to (default "value")
      ``max_null_rate``  FAIL if column null-rate above this (default 0.0)
      ``min_allowed`` / ``max_allowed``  numeric range bounds (optional)

    The partition unit is the FILE — the natural lineage unit of a
    metadata pass (a failed file is re-validated by the scan suite). A
    file whose footer lacks statistics yields SKIPPED, never a silent
    PASS.
    """
    spark = (
        df_or_files.sparkSession
        if isinstance(df_or_files, DataFrame)
        else SparkSession.getActiveSession()
    )
    files = spec.config.get("files") or list_parquet_files(spec.config["path"])
    col = spec.config.get("column", "value")
    st = footer_stats(spark, files, [col]).where(F.col("column") == col)
    max_null_rate = float(spec.config.get("max_null_rate", 0.0))
    lo = spec.config.get("min_allowed")
    hi = spec.config.get("max_allowed")

    null_rate = F.col("null_count") / F.greatest(F.col("n_rows"), F.lit(1))
    fail = null_rate > max_null_rate
    if lo is not None:
        fail = fail | (F.col("min_val") < float(lo))
    if hi is not None:
        fail = fail | (F.col("max_val") > float(hi))
    skip = F.col("null_count").isNull() | (
        F.lit(lo is not None or hi is not None) & F.col("min_val").isNull()
    )
    per_file = st.withColumn("null_rate", null_rate)
    verdicts = verdict_frame(
        per_file,
        spec.id,
        "file",
        fail_when=fail,
        skip_when=skip,
        metric_cols=["n_rows", "null_count", "null_rate", "min_val", "max_val"],
    )
    empty = (
        empty_violations(df_or_files)
        if isinstance(df_or_files, DataFrame)
        else spark.createDataFrame(
            [],
            "repo string, path string, commit string, partition_key string, "
            "check_id string, observed string, expected string",
        )
    )
    return CheckResult(violations=empty, verdicts=verdicts, metrics=per_file)


def run_layout_health(df_or_files, spec: CheckSpec) -> CheckResult:
    """Clustering-health gate: FAIL a clustered dimension whose per-file
    ranges overlap so much that point predicates stop pruning.

    The metric is ``operators/layout.py clustering_health``: avg_depth =
    mean interval-stabbing depth of the per-file [min, max] footer
    ranges = the number of files a point predicate on that column must
    open under the current layout (1 = perfectly clustered, n_files =
    layout uncorrelated with the column). Incremental ingest erodes a
    clustered layout — every appended file spans fresh ranges — so this
    check is the SCHEDULER for the ``cluster_write`` / compaction
    rewrites: declare it in the suite and a drifted layout surfaces as a
    FAIL with the measured amplification in the metrics map, instead of
    as an unexplained scan-cost regression. Footer-only, O(files)
    metadata reads, zero data pages; the sweep itself is the two-phase
    prefix sum (no global window).

    config:
      ``path`` | ``files``   file inventory (at manifest scale pass the
                             table format's file list, never a glob)
      ``cols``               clustered dimensions to grade (required;
                             numeric/temporal)
      ``max_avg_depth``      absolute gate: FAIL when avg_depth exceeds
                             this many files (optional)
      ``max_depth_ratio``    relative gate: FAIL when avg_depth /
                             n_files exceeds this fraction (default 0.5
                             when no absolute gate is given — scale-free
                             "uncorrelated layout" detector)

    The partition unit is the COLUMN (one verdict per dimension);
    ``spec.min_rows`` guards on the file count (depth over a handful of
    files is not evidence of layout health either way).
    """
    from ..operators.layout import clustering_health

    spark = (
        df_or_files.sparkSession
        if isinstance(df_or_files, DataFrame)
        else SparkSession.getActiveSession()
    )
    files = spec.config.get("files") or list_parquet_files(spec.config["path"])
    cols = list(spec.config["cols"])
    max_avg = spec.config.get("max_avg_depth")
    ratio_gate = spec.config.get(
        "max_depth_ratio", 0.5 if max_avg is None else None
    )

    h = clustering_health(spark, files, cols).withColumn(
        "depth_ratio", F.col("avg_depth") / F.col("n_files")
    )
    fail = F.lit(False)
    if max_avg is not None:
        fail = fail | (F.col("avg_depth") > float(max_avg))
    if ratio_gate is not None:
        fail = fail | (F.col("depth_ratio") > float(ratio_gate))
    verdicts = verdict_frame(
        h,
        spec.id,
        "col_name",
        fail_when=fail,
        skip_when=F.col("n_files") < spec.min_rows,
        metric_cols=["n_files", "avg_depth", "max_depth", "depth_ratio"],
    )
    empty = (
        empty_violations(df_or_files)
        if isinstance(df_or_files, DataFrame)
        else spark.createDataFrame(
            [],
            "repo string, path string, commit string, partition_key string, "
            "check_id string, observed string, expected string",
        )
    )
    return CheckResult(violations=empty, verdicts=verdicts, metrics=h)


def file_inventory(
    spark: SparkSession, path: str, glob: str | None = None, recursive: bool = True
) -> DataFrame:
    """Distributed file inventory — name, size, mtime — with ZERO bytes
    of file content read: the ``binaryFile`` source with its ``content``
    column pruned (the source implements column pruning, so the scan's
    ReadSchema is ``path, modificationTime, length`` — the listing
    alone; plan-pinned in tests). This is the input frame for
    size-profile audits over directories the engine does not otherwise
    scan (landed drop dirs, quarantine sinks, state stores).

    Scale note: the file LISTING itself is Spark's InMemoryFileIndex
    (driver-coordinated, parallelized over subdirectories) — fine to
    ~10^6-10^7 files; at table-format scale derive the inventory from
    Iceberg manifests instead, the same caveat as ``list_parquet_files``.
    """
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    r = r.option("recursiveFileLookup", "true" if recursive else "false")
    return r.load(path).select(
        "path",
        F.regexp_replace("path", "/[^/]*$", "").alias("dir"),
        F.col("length").alias("bytes"),
        F.col("modificationTime").alias("mtime"),
    )


def small_files_audit(
    inv: DataFrame, tiny_bytes: int = 32 << 20, by: str = "dir"
) -> DataFrame:
    """Per-directory file-size profile from an inventory frame: file
    count, total bytes, exact median size, and the share of files under
    ``tiny_bytes``. The small-files problem is THE silent scan-cost
    multiplier at 100 TB — a partition written as 10^5 x 100 KB files
    costs 10^5 task launches and 10^5 footer reads for the same bytes
    one thousand 10 MB files would serve — and it accretes invisibly
    (streaming sinks, per-batch appends, quarantine writers). One
    map-side-combined groupBy over O(files) metadata rows."""
    return inv.groupBy(by).agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("bytes").alias("total_bytes"),
        F.expr("percentile(bytes, 0.5)").alias("median_bytes"),
        F.avg((F.col("bytes") < tiny_bytes).cast("double")).alias("tiny_share"),
    )


def run_small_files(df_or_files, spec: CheckSpec) -> CheckResult:
    """Compaction-scheduling gate: FAIL a directory whose size profile
    says "small-files problem" — the file-COUNT dual of run_layout_health
    (which grades intra-file clustering; this grades inter-file sizing;
    together they decide when the compaction/cluster_write rewrite runs).

    config:
      ``path``              root to inventory (required unless ``files``)
      ``glob``              pathGlobFilter, e.g. "*.parquet" (optional)
      ``tiny_bytes``        "small" threshold (default 32 MiB)
      ``max_tiny_share``    FAIL when share of small files exceeds this
                            (default 0.5)
      ``min_median_bytes``  FAIL when the median file is smaller than
                            this (optional, absolute floor)

    Partition unit: the DIRECTORY (one verdict per dir under the root);
    ``spec.min_rows`` guards the file count — one small file is a file,
    not a problem. Metadata-only: zero content bytes read.
    """
    spark = (
        df_or_files.sparkSession
        if isinstance(df_or_files, DataFrame)
        else SparkSession.getActiveSession()
    )
    inv = file_inventory(spark, spec.config["path"], glob=spec.config.get("glob"))
    tiny = int(spec.config.get("tiny_bytes", 32 << 20))
    audit = small_files_audit(inv, tiny_bytes=tiny)
    fail = F.col("tiny_share") > float(spec.config.get("max_tiny_share", 0.5))
    floor = spec.config.get("min_median_bytes")
    if floor is not None:
        fail = fail | (F.col("median_bytes") < float(floor))
    verdicts = verdict_frame(
        audit,
        spec.id,
        "dir",
        fail_when=fail,
        skip_when=F.col("n_files") < spec.min_rows,
        metric_cols=["n_files", "total_bytes", "median_bytes", "tiny_share"],
    )
    empty = (
        empty_violations(df_or_files)
        if isinstance(df_or_files, DataFrame)
        else spark.createDataFrame(
            [],
            "repo string, path string, commit string, partition_key string, "
            "check_id string, observed string, expected string",
        )
    )
    return CheckResult(violations=empty, verdicts=verdicts, metrics=audit)
