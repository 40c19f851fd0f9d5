"""spark-submit entry point for the validation engine.

Usage (cluster):
    spark-submit --py-files anomaly_detector_spark.zip -m anomaly_detector_spark.cli -- \
        --input s3://bucket/files_table --manifest s3://bucket/manifest \
        --violations s3://bucket/violations --partition-col lang

Usage (local):
    python -m anomaly_detector_spark.cli --input /tmp/files --manifest /tmp/manifest

Reads the files table (parquet directory, or an Iceberg table name via
--format iceberg), runs the full check suite on partitions not yet
committed to the manifest (resume semantics, plans/manifest.py), writes
violation rows, and prints a one-line JSON summary. When launched under
spark-submit the already-created session is reused (getOrCreate); the
local-mode builder in session.py only applies when no master is set.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="anomaly_detector_spark")
    p.add_argument("--input", required=True, help="parquet dir or table name of the files table")
    p.add_argument(
        "--format", default="parquet",
        choices=["parquet", "iceberg", "table", "orc", "csv", "json", "xml"],
        help="csv/json/xml are landed-data reads: declared schema (never "
        "inferSchema — a second full pass at scale), PERMISSIVE parse, "
        "malformed lines quarantined before the suite (see --corrupt-out)",
    )
    p.add_argument(
        "--input-schema", default=None,
        help="DDL schema string for csv/json/xml input (default: the files-table "
        "schema). Ignored for self-describing formats.",
    )
    p.add_argument(
        "--corrupt-out", default=None,
        help="parquet dir for malformed csv/json/xml lines (raw text + run_id); "
        "omitted: corrupt rows are counted and excluded, not persisted",
    )
    p.add_argument(
        "--manifest", default=None,
        help="manifest table location (parquet dir); required for every "
        "mode except --monitor-out",
    )
    p.add_argument("--violations", default=None, help="violations sink (parquet dir); omit to only count")
    p.add_argument(
        "--quarantine-out", default=None,
        help="route rows failing any ROWRULE in the suite (format/accepted/"
        "completeness/predicate/json/hygiene checks) to this parquet sink "
        "with a failed_rules column (checks/rowrules.py quarantine_by_rules "
        "— zero joins, zero shuffles). Validation still runs over the FULL "
        "input: the manifest stays the truth about everything that arrived; "
        "the sink is the enforcement copy. Batch mode only.",
    )
    p.add_argument("--partition-col", default="lang")
    p.add_argument("--min-rows", type=int, default=25)
    p.add_argument("--run-id", default=None)
    p.add_argument(
        "--freeze-baseline", action="store_true",
        help="freeze the pooled drift baseline on first run (T2/T3 semantics)",
    )
    p.add_argument(
        "--suite", default="default",
        choices=["default", "extended", "constraint", "hygiene", "paths", "full", "robust"],
        help="extended adds the categorical count-drift check; constraint "
        "additionally adds the fused row-rule checks; hygiene additionally "
        "adds the code-hygiene rules (secrets/license/generated/entropy/"
        "encoding/unicode — checks/codehygiene.py); paths additionally "
        "adds the path-integrity "
        "family (path_format/lang_ext/case_collisions/sensitive_path — "
        "checks/paths.py); full composes constraint + hygiene + paths "
        "(the rowrule fold makes it expressions, not extra passes). "
        "Each is a new suite_id -> revalidates",
    )
    p.add_argument(
        "--suite-config", default=None,
        help="path to a declarative JSON suite document (plans/config.py); "
        "overrides --suite. Content-addressed check ids make a config-loaded "
        "suite manifest-identical to the equivalent code-built one.",
    )
    p.add_argument(
        "--revalidate", action="store_true",
        help="scheduled re-validation: skip the committed-partition prune and "
        "append a fresh metrics row per partition under this run_id "
        "(builds the history checks/history.py flags against)",
    )
    p.add_argument(
        "--history-flags", action="store_true",
        help="after the run, print per-(partition, check, metric) anomaly flags "
        "of the newest run against the manifest's metric history",
    )
    p.add_argument(
        "--max-violations-per-check", type=int, default=None,
        help="bound the violations SINK to ~N deterministic evidence rows per "
        "(partition, check); manifest n_violations stays exact",
    )
    p.add_argument(
        "--sketches", default=None,
        help="per-run HLL sketch table (parquet dir) for incremental global distincts",
    )
    p.add_argument(
        "--quantile-sketches", default=None,
        help="per-run t-digest sketch table (parquet dir) for cross-run p50/p99 without rescan",
    )
    p.add_argument(
        "--topk-sketches", default=None,
        help="per-run truncated top-k value-count table (parquet dir) for "
        "all-time heavy hitters with sound bounds (plans/manifest.py global_topk)",
    )
    p.add_argument(
        "--membership", default=None,
        help="per-run bloom word table (parquet dir) for cross-run key "
        "membership — 'was this (repo,path,commit) ever committed' via "
        "plans/manifest.py seen_before, no history rescan",
    )
    p.add_argument(
        "--kmv-sketches", default=None,
        help="per-run KMV bottom-k table (parquet dir) for cross-run "
        "set algebra — union/intersection/Jaccard/novelty of key sets "
        "via plans/manifest.py novelty_stats, no history rescan",
    )
    p.add_argument(
        "--schemas", default=None,
        help="per-run physical-schema snapshot table (parquet dir): "
        "run-over-run schema diffs (schema_changes) and the "
        "schema_evolution 'changed since last run' gate — zero scans",
    )
    p.add_argument(
        "--hist-store", default=None,
        help="per-run pooled drift-histogram table (parquet dir) — the "
        "rolling-baseline store (plans/manifest.py rolling_baseline)",
    )
    p.add_argument(
        "--rolling-baseline-k", type=int, default=None,
        help="baseline drift against the mean histogram of the last K "
        "committed runs (requires --hist-store); pair with the drift "
        "check's gate_mode=absolute to catch wholesale shifts",
    )
    p.add_argument(
        "--sample-frac", type=float, default=None,
        help="run the SAMPLED tier (plans/sampled.py): distribution checks "
        "over a deterministic hash-sample of the input at this keep-rate; "
        "identity checks are dropped and every check id carries the frac, "
        "so sampled commits form their own manifest stream and can never "
        "stand in for full validation",
    )
    p.add_argument(
        "--fork-audit", default=None,
        help="after the run, write corpus-level duplication audits to this "
        "directory: <dir>/fork_pairs (repo pairs by directory-fingerprint "
        "jaccard) and <dir>/vendored_dirs (wholesale-copied subtrees) — "
        "operators/codescan.py; summary carries the pair/dir counts",
    )
    p.add_argument(
        "--report", default=None,
        help="after the run, write a markdown validation report (latest-run "
        "verdict mix, per-check burn-down, open incidents) to this path — "
        "rendered from manifest METADATA only (plans/report.py), zero data "
        "scans at any table size",
    )
    p.add_argument(
        "--coverage-audit", action="store_true",
        help="report input columns the suite declares NO check on "
        "(plans/config.py suite_column_coverage) — zero scans; the "
        "blind-spot list lands in the summary as uncovered_columns",
    )
    p.add_argument(
        "--compact-stores", action="store_true",
        help="after the run, rewrite every sketch store passed above to "
        "its minimal merged form (plans/stores.py) — stores stay "
        "O(partitions) instead of one file per run; reader answers are "
        "preserved exactly. A --corrupt-out sink that received rows is "
        "coalesced too (rows verbatim, per-batch tiny appends merged)",
    )
    p.add_argument(
        "--watch", action="store_true",
        help="continuous validate-on-landing: treat --input as a drop "
        "DIRECTORY and stream it (read_input_stream + validate_stream) — "
        "each micro-batch of newly landed files is validated and committed "
        "to the manifest; csv/json corrupt lines quarantine per batch to "
        "--corrupt-out. Processes everything available, then exits "
        "(availableNow) — run under a scheduler for a daemon. Requires "
        "--checkpoint; formats iceberg/table are batch-only.",
    )
    p.add_argument(
        "--checkpoint", default=None,
        help="streaming checkpoint dir (required with --watch): crash-"
        "restart resumes at the first unprocessed file",
    )
    p.add_argument(
        "--max-files-per-trigger", type=int, default=None,
        help="with --watch: bound each micro-batch's file count. NOTE a "
        "partition split across batches is only validated on first "
        "appearance (skipped rows are warned) — prefer whole-partition "
        "landing files when setting this",
    )
    p.add_argument(
        "--monitor-out", default=None,
        help="continuous distribution monitoring (no validation, no "
        "manifest): stream --input like --watch and append per-trigger "
        "metric rows here — running per-partition p50/p99 of "
        "length(--monitor-col) (streaming/quantiles.py) under "
        "<dir>/quantiles and running heavy hitters of --monitor-topk-col "
        "(streaming/topk.py) under <dir>/topk. Each invocation drains "
        "newly landed files and exits (availableNow); the state rides "
        "--checkpoint, so estimates accumulate across invocations.",
    )
    p.add_argument("--monitor-col", default="content", help="quantile-monitored column (length mode)")
    p.add_argument("--monitor-topk-col", default="repo", help="heavy-hitter-monitored column")
    p.add_argument("--monitor-k", type=int, default=16, help="heavy-hitter store size per partition")
    p.add_argument("--cores", type=int, default=None, help="local-mode cores (ignored under spark-submit)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    else:
        from .session import get_spark

        spark = get_spark(app_name="anomaly_detector_spark", cores=args.cores)

    if args.monitor_out:
        # monitoring-only mode: no suite, no manifest — two bounded-state
        # metric streams over the same drop directory --watch consumes
        if args.format in ("iceberg", "table"):
            raise SystemExit("--monitor-out supports directory formats (parquet/orc/csv/json)")
        if not args.checkpoint:
            raise SystemExit("--monitor-out requires --checkpoint")
        from .sources.registry import read_input_stream
        from .streaming.quantiles import quantile_stream
        from .streaming.topk import topk_stream

        def start(frame, name):
            return (
                frame.writeStream.format("parquet")
                .option("path", f"{args.monitor_out}/{name}")
                .option("checkpointLocation", f"{args.checkpoint}/{name}")
                .trigger(availableNow=True)
                .start()
            )

        stream = read_input_stream(
            spark, args.input, args.format, schema=args.input_schema
        )
        q1 = start(
            quantile_stream(
                stream, partition_col=args.partition_col, col=args.monitor_col
            ),
            "quantiles",
        )
        q2 = start(
            topk_stream(
                stream,
                partition_col=args.partition_col,
                col=args.monitor_topk_col,
                k=args.monitor_k,
            ),
            "topk",
        )
        q1.awaitTermination()
        q2.awaitTermination()

        def sink_rows(name: str) -> int:
            # a stream that drained zero rows (empty drop directory on a
            # first scheduled run, or all monitored values NULL) never
            # creates the parquet sink path — report 0, don't stack-trace
            from pyspark.errors import AnalysisException

            try:
                return spark.read.parquet(f"{args.monitor_out}/{name}").count()
            except AnalysisException:
                return 0

        summary = {
            "monitor": True,
            "quantile_rows": sink_rows("quantiles"),
            "topk_rows": sink_rows("topk"),
        }
        print(json.dumps(summary))
        return 0

    if not args.manifest:
        raise SystemExit("--manifest is required (all modes except --monitor-out)")

    from .plans.manifest import run_with_manifest
    from .plans.suite import constraint_suite, default_suite, extended_suite

    if args.suite_config:
        from pathlib import Path

        from .plans.config import suite_from_config

        suite = suite_from_config(Path(args.suite_config))
    else:
        def hygiene_suite(partition_col: str, min_rows: int):
            from .checks.codehygiene import code_hygiene_rules
            from .plans.suite import constraint_suite as _cs

            base = _cs(partition_col=partition_col, min_rows=min_rows)
            return base + code_hygiene_rules(partition_col, min_rows)

        def paths_suite(partition_col: str, min_rows: int):
            from .checks.paths import path_integrity_rules
            from .plans.suite import constraint_suite as _cs

            base = _cs(partition_col=partition_col, min_rows=min_rows)
            return base + path_integrity_rules(partition_col, min_rows)

        def full_suite(partition_col: str, min_rows: int):
            # every rowrule family at once: the fold guarantees they all
            # ride the constraint suite's existing scans, so "full" costs
            # expressions, not passes (case_collisions adds its one slim
            # window exchange)
            from .checks.codehygiene import code_hygiene_rules
            from .checks.paths import path_integrity_rules
            from .plans.suite import constraint_suite as _cs

            return (
                _cs(partition_col=partition_col, min_rows=min_rows)
                + code_hygiene_rules(partition_col, min_rows)
                + path_integrity_rules(partition_col, min_rows)
            )

        def robust_suite(partition_col: str, min_rows: int):
            # extended suite plus the resistant-statistics pair: MAD
            # modified-z outliers on content length and Benford
            # first-digit drift on the same lengths (wide-ranging
            # positive values). Two extra passes by necessity (MAD needs
            # the median first), both map-side-combined.
            from .checks.base import CheckSpec
            from .checks.robust import run_benford, run_mad_outliers
            from .plans.suite import extended_suite as _es

            return _es(partition_col=partition_col, min_rows=min_rows) + [
                CheckSpec(
                    "mad_outliers",
                    run_mad_outliers,
                    {"max_outlier_rate": 0.01},
                    partition_col,
                    min_rows,
                ),
                CheckSpec(
                    "benford_len",
                    run_benford,
                    {"column": "content", "use_length": True},
                    partition_col,
                    min_rows,
                ),
            ]

        make_suite = {
            "default": default_suite,
            "extended": extended_suite,
            "constraint": constraint_suite,
            "hygiene": hygiene_suite,
            "paths": paths_suite,
            "full": full_suite,
            "robust": robust_suite,
        }[args.suite]
        suite = make_suite(partition_col=args.partition_col, min_rows=args.min_rows)
    if args.sample_frac is not None:
        from .plans.sampled import sampled_specs

        suite = sampled_specs(suite, args.sample_frac)

    sketch_sinks = dict(
        sketches_dir=args.sketches,
        quantile_sketches_dir=args.quantile_sketches,
        topk_sketches_dir=args.topk_sketches,
        membership_dir=args.membership,
        kmv_sketches_dir=args.kmv_sketches,
        schemas_dir=args.schemas,
        hist_dir=args.hist_store,
        rolling_baseline_k=args.rolling_baseline_k,
        revalidate=args.revalidate,
        max_violations_per_check=args.max_violations_per_check,
    )

    if args.watch:
        if args.format in ("iceberg", "table"):
            raise SystemExit("--watch supports directory formats (parquet/orc/csv/json)")
        if not args.checkpoint:
            raise SystemExit("--watch requires --checkpoint")
        from .sources.registry import read_input_stream
        from .streaming.validate import validate_stream

        options = (
            {"maxFilesPerTrigger": args.max_files_per_trigger}
            if args.max_files_per_trigger
            else None
        )
        stream = read_input_stream(
            spark, args.input, args.format, schema=args.input_schema, options=options
        )
        if args.sample_frac is not None:
            from .plans.sampled import sample_predicate

            stream = stream.filter(sample_predicate(frac=args.sample_frac))
        batches: list[tuple[int, int]] = []
        q = validate_stream(
            stream,
            args.manifest,
            args.checkpoint,
            suite=suite,
            partition_col=args.partition_col,
            freeze_drift_baseline=args.freeze_baseline,
            violations_sink=args.violations,
            corrupt_dir=args.corrupt_out,
            on_batch=lambda run, bid: batches.append((bid, run.pending_partitions)),
            sink_kwargs=sketch_sinks,
        )
        q.awaitTermination()
        summary = {
            "watch": True,
            "n_batches": len(batches),
            "partitions_committed": sum(n for _b, n in batches),
        }
        if args.corrupt_out:
            from pyspark.sql import functions as F

            rids = [f"stream-{bid:09d}" for bid, _n in batches]
            summary["corrupt_out"] = args.corrupt_out
            try:
                summary["n_corrupt_rows"] = (
                    spark.read.parquet(args.corrupt_out)
                    .filter(F.col("run_id").isin(rids))
                    .count()
                )
            except Exception:
                summary["n_corrupt_rows"] = 0  # sink never created: no bad lines
        if args.compact_stores:
            from .plans.stores import compact_store

            summary["compacted_stores"] = {
                family: compact_store(spark, d, family)
                for family, d in (
                    ("hll", args.sketches),
                    ("tdigest", args.quantile_sketches),
                    ("topk", args.topk_sketches),
                    ("membership", args.membership),
                    ("kmv", args.kmv_sketches),
                )
                if d is not None
            }
            # the quarantine sink only exists once a bad line landed
            if args.corrupt_out and summary.get("n_corrupt_rows", 0) > 0:
                summary["compacted_stores"]["quarantine"] = compact_store(
                    spark, args.corrupt_out, "quarantine"
                )
        if args.coverage_audit:
            # schema-only, works on the streaming frame
            from .plans.config import suite_column_coverage

            summary["uncovered_columns"] = [
                r["column"]
                for r in suite_column_coverage(suite, stream)
                if not r["covered"]
            ]
        if args.history_flags:
            from pyspark.sql import functions as F

            from .checks.history import manifest_metric_anomalies
            from .plans.manifest import read_manifest, suite_id as _sid

            flags = manifest_metric_anomalies(
                read_manifest(spark, args.manifest), suite_sid=_sid(suite)
            )
            summary["history_anomalies"] = [
                {k: r[k] for k in ("partition_key", "check_id", "metric", "value", "z_score")}
                for r in flags.where(F.col("is_anomalous")).collect()
            ]
        print(json.dumps(summary))
        return 0

    from .sources.registry import read_input, split_corrupt

    df = read_input(spark, args.input, args.format, schema=args.input_schema)
    n_corrupt = 0
    if args.format in ("csv", "json", "xml"):
        # malformed lines would poison every check (all-NULL payload
        # rows); split them off the same scan and account for them —
        # bad input is a finding, not a crash
        df, corrupt = split_corrupt(df)
        if args.corrupt_out:
            import time as _time

            from pyspark.sql import functions as F

            rid = args.run_id or f"run_{int(_time.time())}"
            corrupt = corrupt.withColumn("run_id", F.lit(rid))
            corrupt.write.mode("append").parquet(args.corrupt_out)
            n_corrupt = (
                spark.read.parquet(args.corrupt_out)
                .filter(F.col("run_id") == rid)
                .count()
            )
        else:
            n_corrupt = corrupt.count()
    if args.sample_frac is not None:
        from .plans.sampled import sample_predicate

        df = df.filter(sample_predicate(frac=args.sample_frac))
    n_quarantined = 0
    if args.quarantine_out:
        from .checks.rowrules import quarantine_by_rules

        rule_specs = [sp for sp in suite if hasattr(sp.fn, "_rule_builder")]
        if rule_specs:
            import time as _time

            from pyspark.sql import functions as F

            _, quar = quarantine_by_rules(df, rule_specs)
            qrid = args.run_id or f"run_{int(_time.time())}"
            quar.withColumn("run_id", F.lit(qrid)).write.mode("append").parquet(
                args.quarantine_out
            )
            n_quarantined = (
                spark.read.parquet(args.quarantine_out)
                .filter(F.col("run_id") == qrid)
                .count()
            )
    # The violations sink is passed INTO the run so it is written before
    # the manifest commit — a crash in between re-runs the partitions
    # rather than losing their violation rows (resume would otherwise
    # prune the committed partitions on retry with no violations written).
    run = run_with_manifest(
        df, args.manifest, suite=suite, partition_col=args.partition_col,
        run_id=args.run_id, freeze_drift_baseline=args.freeze_baseline,
        violations_sink=args.violations, collect_verdict_counts=True,
        **sketch_sinks,
    )

    summary = {
        "run_id": run.run_id,
        "suite_id": run.suite_id,
        "pending_partitions": run.pending_partitions,
        "noop_resume": run.result is None,
    }
    if args.format in ("csv", "json", "xml"):
        summary["n_corrupt_rows"] = n_corrupt
        if args.corrupt_out:
            summary["corrupt_out"] = args.corrupt_out
    if args.quarantine_out:
        summary["quarantine_out"] = args.quarantine_out
        summary["n_quarantined_rows"] = n_quarantined
    if args.coverage_audit:
        from .plans.config import suite_column_coverage

        summary["uncovered_columns"] = [
            r["column"] for r in suite_column_coverage(suite, df) if not r["covered"]
        ]
    if args.compact_stores:
        from .plans.stores import compact_store

        compacted = {}
        for family, d in (
            ("hll", args.sketches),
            ("tdigest", args.quantile_sketches),
            ("topk", args.topk_sketches),
            ("membership", args.membership),
            ("kmv", args.kmv_sketches),
        ):
            if d is not None:
                compacted[family] = compact_store(spark, d, family)
        # the quarantine sink only exists once a bad line landed
        if args.corrupt_out and n_corrupt > 0:
            compacted["quarantine"] = compact_store(
                spark, args.corrupt_out, "quarantine"
            )
        summary["compacted_stores"] = compacted
    if args.sample_frac is not None:
        summary["sample_frac"] = args.sample_frac
    if run.result is not None:
        if args.violations:
            summary["violations_sink"] = args.violations
        summary["verdicts"] = run.verdict_counts
    if args.history_flags:
        from pyspark.sql import functions as F

        from .checks.history import manifest_metric_anomalies
        from .plans.manifest import read_manifest, suite_id as _sid

        flags = manifest_metric_anomalies(
            read_manifest(spark, args.manifest), suite_sid=_sid(suite)
        )
        summary["history_anomalies"] = [
            {k: r[k] for k in ("partition_key", "check_id", "metric", "value", "z_score")}
            for r in flags.where(F.col("is_anomalous")).collect()
        ]
    if args.fork_audit:
        from .operators.codescan import repo_fork_pairs, vendored_dirs

        forks = repo_fork_pairs(df)
        vdirs = vendored_dirs(df)
        forks.write.mode("overwrite").parquet(f"{args.fork_audit}/fork_pairs")
        vdirs.write.mode("overwrite").parquet(f"{args.fork_audit}/vendored_dirs")
        summary["fork_audit"] = args.fork_audit
        summary["n_fork_pairs"] = spark.read.parquet(
            f"{args.fork_audit}/fork_pairs"
        ).count()
        summary["n_vendored_dirs"] = spark.read.parquet(
            f"{args.fork_audit}/vendored_dirs"
        ).count()
    if args.report:
        from .plans.manifest import read_manifest, suite_id as _sid
        from .plans.report import name_map, render_report

        md = render_report(
            read_manifest(spark, args.manifest),
            suite_sid=_sid(suite),
            check_names=name_map(suite),
        )
        with open(args.report, "w", encoding="utf-8") as f:
            f.write(md)
        summary["report"] = args.report
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
