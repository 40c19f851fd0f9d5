"""Tiered validation: metadata pre-filter -> scan suite on the residue.

The composition PLANS.md promises for the 10^12-file table: run the
O(files) footer pass (checks/metadata.py) every cycle, and pay the scan
suite ONLY for the files the footer pass could not clear — a FAIL needs
row-level evidence (which rows, which checks), a statistics-less footer
proved nothing. Cleared files keep their metadata-tier PASS verdict;
escalated files get definitive per-FILE scan verdicts, so every input
file ends the cycle with exactly one authoritative verdict tier.

Scale notes:

* The metadata tier's cost is O(files) KB-sized footer reads, fanned out
  via ``mapInPandas`` — data volume is irrelevant.
* The escalated file LIST is collected to the driver because a parquet
  read needs concrete paths. That is bounded by the number of failing /
  statless files, not the table size — the healthy-table fast path
  collects an empty list. A deployment where escalations themselves are
  huge should feed the escalated inventory back through the table
  format's manifests (Iceberg file filter) instead of this local reader;
  the split logic is identical.
* The scan tier re-keys every check to the FILE (``input_file_name()``)
  so its verdict unit matches the metadata tier's — re-validation and
  manifest accounting stay per-file across tiers.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..checks.base import PASS, CheckResult, CheckSpec
from ..checks.metadata import list_parquet_files, run_metadata_stats
from .suite import SuiteResult, run_suite


@dataclass
class TieredResult:
    meta: CheckResult          # per-file metadata-tier verdicts (all files)
    cleared_files: list[str]   # footer pass cleared these (metadata PASS)
    escalated_files: list[str] # FAIL / SKIPPED -> scan-tier input
    scan: SuiteResult | None   # scan suite over escalated files only

    def unpersist(self, blocking: bool = False) -> None:
        """Release the cached metadata verdicts (and any scan caches).
        Call after the result frames are materialized."""
        try:
            self.meta.verdicts.unpersist(blocking=blocking)
        except Exception:
            pass
        if self.scan is not None:
            self.scan.unpersist(blocking=blocking)

    def verdicts(self) -> DataFrame:
        """One authoritative verdict stream: metadata-tier PASS rows
        (tier='metadata') plus every scan-tier verdict (tier='scan') for
        the escalated files. Non-PASS metadata rows are superseded by
        their scan twin and intentionally absent."""
        mv = self.meta.verdicts.filter(F.col("verdict") == PASS).withColumn(
            "tier", F.lit("metadata")
        )
        if self.scan is None:
            return mv
        sv = self.scan.verdicts.withColumn("tier", F.lit("scan"))
        # the suite envelope stamps emitted_at; metadata verdicts don't —
        # meta rows union in with a NULL stamp
        return mv.unionByName(sv, allowMissingColumns=True)


def tiered_validate(
    spark: SparkSession,
    files: list[str] | str,
    meta_config: dict,
    suite: list[CheckSpec],
    per_file: bool = True,
    cache: bool = False,
) -> TieredResult:
    """Run the footer tier over ``files``, escalate non-PASS files to the
    scan ``suite``.

    ``meta_config`` is run_metadata_stats config (column, max_null_rate,
    min_allowed/max_allowed). ``per_file=True`` re-keys every scan check
    to ``input_file_name()`` so both tiers share the file as the verdict
    unit; ``False`` keeps each spec's own partition_col (coarser verdicts
    over the escalated slice).
    """
    paths = list_parquet_files(files) if isinstance(files, str) else list(files)
    meta_spec = CheckSpec(
        "meta_stats",
        run_metadata_stats,
        {**meta_config, "files": paths},
        partition_col="file",
    )
    meta = run_metadata_stats(spark.range(1), meta_spec)
    # the verdict frame drives TWO actions (the escalation collect here
    # and the combined verdicts() union later) — cache it so the footer
    # pass runs once; TieredResult.unpersist releases it
    meta.verdicts = meta.verdicts.cache()
    escalated = sorted(
        r["partition_key"]
        for r in meta.verdicts.filter(F.col("verdict") != PASS)
        .select("partition_key")
        .collect()
    )
    cleared = sorted(set(paths) - set(escalated))
    scan: SuiteResult | None = None
    if escalated:
        df = spark.read.parquet(*escalated)
        specs = suite
        if per_file:
            # normalize the URI scheme so scan partition keys compare
            # equal to the metadata tier's plain paths
            df = df.withColumn(
                "_file", F.regexp_replace(F.input_file_name(), "^file:(//)?", "")
            )
            specs = [replace(s, partition_col="_file") for s in suite]
        scan = run_suite(df, suite=specs, cache=cache)
    return TieredResult(meta, cleared, escalated, scan)
