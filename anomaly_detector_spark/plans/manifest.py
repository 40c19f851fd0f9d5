"""Per-partition lineage + metrics manifest with idempotent resume.

Replaces the reference's per-device parquet+pickle checkpoint
(/root/reference/algo/operator.py:130-152, save_data() after every
message at :175) with a columnar manifest table: one row per
(run, partition, check) holding the verdict, metrics, row count and
lineage timestamps. Commit happens ONCE per run, AFTER every check for
the covered partitions has completed (T5 semantics — atomic "all checks
for this partition are done", never mid-flight state).

Resume (T7, the reference's endpoint_last_load cursor at
/root/reference/algo/load_device.py:60-63) is an anti-join: partitions
of the input that already have committed manifest rows for the SAME
suite_id (content-addressed over every check id, so any config change
invalidates the checkpoint) are pruned from the scan before any heavy
work runs. At cluster scale this anti-join is a broadcast (the manifest
key set is tiny relative to the data) and combines with partition
pruning on the source table.

The storage layout is a parquet directory partitioned by run_id —
append-only, Iceberg-friendly (swap write.parquet for writeTo(...) on a
real catalog; the commit protocol is identical because Iceberg appends
are atomic snapshots).
"""

from __future__ import annotations

import hashlib
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..checks.base import CheckSpec, null_safe_join
from .suite import SuiteResult, default_suite, run_suite

MANIFEST_SCHEMA = (
    "run_id string, suite_id string, partition_key string, check_id string, "
    "verdict string, metrics map<string,double>, n_rows long, "
    "n_violations long, status string, committed_at timestamp"
)


def suite_id(suite: list[CheckSpec]) -> str:
    """Content-addressed id over the whole suite config (analog of the
    reference's gen_filter sha256 ids, /root/reference/util/__init__.py:120-139)."""
    return hashlib.sha256("|".join(sorted(s.id for s in suite)).encode()).hexdigest()


def read_manifest(spark: SparkSession, manifest_dir: str) -> DataFrame:
    """Committed manifest rows; empty frame if no manifest exists yet."""
    try:
        df = spark.read.parquet(manifest_dir)
    except Exception:
        return spark.createDataFrame([], MANIFEST_SCHEMA)
    return df.filter(F.col("status") == "committed")


def committed_partitions(manifest: DataFrame, sid: str, n_checks: int) -> DataFrame:
    """Partition keys whose FULL suite committed: one row per check id.

    A partition with only a subset of checks committed (e.g. a config
    change added a check) counts as pending and reruns whole — per-check
    partial resume would let two checks see different snapshots of the
    same partition.
    """
    return (
        manifest.filter(F.col("suite_id") == sid)
        .select("partition_key", "check_id")
        .distinct()
        .groupBy("partition_key")
        .count()
        .filter(F.col("count") >= n_checks)
        .select("partition_key")
    )


def pending_input(
    df: DataFrame, done: DataFrame, partition_col: str, broadcast: bool = True
) -> DataFrame:
    """Prune already-committed partitions via broadcast anti-join.

    The done-set is partition keys only (tiny at any scale: cardinality
    of the partition column, not of the data), so this is normally a
    map-side broadcast — zero shuffle on the big table, and with a
    partitioned/Iceberg source the filter turns into partition pruning.
    ``broadcast=False`` drops the hint for pathological done-set
    cardinality (run_with_manifest flips it past 5M keys): building a
    forced broadcast relation collects the keys into driver memory, so
    past that point AQE picks the strategy instead of the hint.
    """
    keys = done.select(F.col("partition_key").cast("string"))
    if not broadcast:
        return df.join(
            keys,
            df[partition_col].cast("string").eqNullSafe(keys["partition_key"]),
            "left_anti",
        )
    # eqNullSafe: a NULL partition key must also be resumable — with plain
    # equality NULL never matches its committed row, so the NULL partition
    # would be re-validated (and re-committed) on every run.
    return df.join(
        F.broadcast(keys),
        df[partition_col].cast("string").eqNullSafe(keys["partition_key"]),
        "left_anti",
    )


@dataclass
class ManifestRun:
    run_id: str
    suite_id: str
    pending_partitions: int
    result: SuiteResult | None  # None when nothing was pending (no-op resume)
    skipped_rows: int | None = None  # rows pruned for already-committed partitions (if counted)
    verdict_counts: dict[str, int] | None = None  # verdict -> n (if collected)


# ------------------------------------------------------------ drift baseline

def baseline_dir(manifest_dir: str) -> str:
    return manifest_dir.rstrip("/") + "_baselines"


def load_frozen_baseline(spark: SparkSession, manifest_dir: str, sid: str):
    """The frozen drift baseline histogram for this suite config, or None.

    T2 semantics (/root/reference/algo/operator.py:169: type inferred once
    then frozen): the FIRST committed run writes the pooled content-length
    histogram; every later run drifts against that snapshot instead of its
    own pooled distribution. Keyed by suite_id, so a config change
    (including bucket_width) re-freezes — the re-baseline cadence T3 is a
    config bump or deleting the baseline table.
    """
    try:
        df = spark.read.parquet(baseline_dir(manifest_dir))
    except Exception:
        return None
    out = df.filter(F.col("suite_id") == sid).select("bucket", "base_n")
    return out if out.limit(1).count() > 0 else None


def freeze_baseline(hist_df: DataFrame, manifest_dir: str, sid: str) -> None:
    """Persist the pooled histogram as this suite's frozen baseline."""
    from ..checks.drift import global_baseline

    rows = global_baseline(hist_df).withColumn("suite_id", F.lit(sid))
    # Always append: parquet append creates the directory if missing, and
    # an isdir() gate would be False for every non-local URI (s3://,
    # hdfs://) — overwriting would wipe other suites' frozen baselines.
    rows.coalesce(1).write.mode("append").parquet(baseline_dir(manifest_dir))


def global_distinct(spark: SparkSession, sketches_dir: str, suite_sid: str | None = None):
    """Global distinct-content estimate from every committed run's
    sketches — one tiny aggregate over KB-sized sketch rows, no rescan
    of history. Returns a 1-row DataFrame (distinct_estimate, n_rows).

    Sketch rows are AT-LEAST-ONCE (written before the manifest commit,
    like the violations sink): a crash between sketch append and manifest
    append makes the retry — under a fresh run_id — append the same
    partitions' sketches again. The union estimate is idempotent under
    that, but a plain sum of n_rows would over-count, so rows are first
    deduped to one per (suite_id, partition_key): a partition commits at
    most once per suite_id, so every surviving row carries that
    partition's correct n_rows (max_by run_id just pins a deterministic
    survivor)."""
    from ..checks.stats import hll_union_estimate

    df = spark.read.parquet(sketches_dir)
    if suite_sid is not None:
        df = df.filter(F.col("suite_id") == suite_sid)
    deduped = df.groupBy("suite_id", "partition_key").agg(
        F.max_by("sketch", "run_id").alias("sketch"),
        F.max_by("n_rows", "run_id").alias("n_rows"),
    )
    return hll_union_estimate(deduped)


def global_quantiles(
    spark: SparkSession,
    quantile_sketches_dir: str,
    qs: list[float] = (0.5, 0.99),
    suite_sid: str | None = None,
):
    """Global quantile estimates over every committed run's t-digest
    sketch rows — the quantile twin of global_distinct: cross-run p50/p99
    WITHOUT rescanning history (SURVEY §4.2's mergeable-quantile
    backend). Same at-least-once story and the same (suite_id,
    partition_key) dedupe as the HLL rows. Returns one row
    (q_0_5, q_0_99, ..., n_rows)."""
    from ..checks.quantiles import quantiles_from_sketches

    df = spark.read.parquet(quantile_sketches_dir)
    if suite_sid is not None:
        df = df.filter(F.col("suite_id") == suite_sid)
    deduped = df.groupBy("suite_id", "partition_key").agg(
        F.max_by("means", "run_id").alias("means"),
        F.max_by("weights", "run_id").alias("weights"),
        F.max_by("n_rows", "run_id").alias("n_rows"),
    )
    return quantiles_from_sketches(deduped, list(qs))


def global_topk(
    spark: SparkSession,
    topk_sketches_dir: str,
    k: int = 10,
    suite_sid: str | None = None,
) -> DataFrame:
    """Global heavy hitters over every committed run's truncated top-k
    sketch rows — the third member of the sketch family next to
    global_distinct and global_quantiles: all-time most frequent values
    WITHOUT rescanning history, with sound undercount intervals.

    Dedupe mirrors the others (at-least-once rows -> one surviving run
    per (suite_id, partition_key)); the merge then treats each PARTITION
    as a topk_union "run": an item a partition's sketch dropped
    undercounts by at most that partition's stored bound, so the same
    (est, upper) interval math applies across partitions as across runs.
    Returns (rank, item, est, upper)."""
    from ..checks.profile import topk_union

    df = spark.read.parquet(topk_sketches_dir)
    if suite_sid is not None:
        df = df.filter(F.col("suite_id") == suite_sid)
    latest = df.groupBy("suite_id", "partition_key").agg(
        F.max("run_id").alias("run_id")
    )
    # null-safe: NULL-partition sketch rows must survive the dedupe
    surviving = null_safe_join(df, latest, ["suite_id", "partition_key", "run_id"])
    as_runs = surviving.select(
        F.concat_ws("/", "suite_id", "partition_key").alias("run_id"),
        F.lit("_global").alias("partition_key"),
        "item",
        "n",
        "bound",
    )
    return topk_union(as_runs, k=k).select("rank", "item", "est", "upper")


def membership_stats(
    spark: SparkSession,
    membership_dir: str,
    suite_sid: str | None = None,
) -> DataFrame:
    """Operational health of the persisted bloom store: per-partition
    (partition_key, set_bits, fill_ratio, fpp_est) over every committed
    run's word rows. fpp_est rising past the suite's tolerance is the
    rebuild signal — rebuild at a larger n_bits (checks/membership.py
    suggest_n_bits) rather than probing a saturated filter."""
    from ..checks.membership import bloom_stats, read_store

    words, n_bits, k, _mode = read_store(spark, membership_dir, suite_sid)
    return bloom_stats(words, n_bits=n_bits, k=k)


def seen_before(
    spark: SparkSession,
    membership_dir: str,
    df: DataFrame,
    partition_col: str = "lang",
    key_cols: list[str] | None = None,
    suite_sid: str | None = None,
    broadcast_store: bool = True,
) -> DataFrame:
    """Probe new rows' keys against every committed run's bloom store —
    the membership member of the sketch family: one row per distinct
    (partition_key, key) with ``maybe_seen``. False is definitive (the
    key was never committed); True is a candidate for exact verification
    (checks/membership.py bloom_probe docstring has the fp bound and the
    semi-join verification pattern).

    The store's n_bits/k/mode ride in its rows; a store mixing
    parameter sets (from a config change between runs) is rejected
    rather than silently probed wrong — rebuild the store instead."""
    from ..checks.membership import bloom_probe, read_store

    words, n_bits, k, mode = read_store(spark, membership_dir, suite_sid)
    return bloom_probe(
        df,
        words,
        partition_col,
        key_cols or ["repo", "path", "commit"],
        n_bits=n_bits,
        k=k,
        mode=mode,
        broadcast_store=broadcast_store,
    )


def novelty_stats(
    spark: SparkSession,
    kmv_sketches_dir: str,
    suite_sid: str | None = None,
) -> DataFrame:
    """Set algebra of the LATEST committed run against everything before
    it, from the persisted KMV store alone — per partition: estimated
    |history|, |latest|, union, intersection, Jaccard, and the novelty
    |latest \\ history| ("how many of the newest run's keys were
    genuinely new"), plus the latest run_id. No run is rescanned; both
    sides are O(k)-row sketches (checks/kmv.py).

    History rows are re-merged to bottom-k first (kmv_merge): a raw
    multi-run union holds more than k draws per partition, whose max-u
    would UNDERESTIMATE history. Needs >= 2 committed runs."""
    from ..checks.kmv import kmv_merge, kmv_set_stats, read_store

    rows, _k, _mode = read_store(spark, kmv_sketches_dir, suite_sid)
    if "run_id" not in rows.columns:
        raise ValueError("KMV store rows carry no run_id; cannot split latest vs history")
    last = rows.agg(F.max("run_id")).first()[0]
    cur = rows.filter(F.col("run_id") == last).drop("run_id")
    hist_rows = rows.filter(F.col("run_id") < last).drop("run_id")
    if hist_rows.isEmpty():
        raise ValueError("KMV store holds a single run; novelty needs >= 2")
    return kmv_set_stats(kmv_merge(hist_rows), kmv_merge(cur)).withColumn(
        "run_id", F.lit(last)
    )


def rolling_baseline(
    spark: SparkSession,
    hist_dir: str,
    sid: str,
    last_k: int = 5,
    exclude_run_id: str | None = None,
    per_partition: bool = False,
):
    """Pooled drift baseline from the last ``last_k`` committed runs'
    persisted histograms — the T3 re-baseline lifecycle's third member
    next to per-run SELF (each run vs its own pooled distribution) and
    FROZEN (T2: first run forever). A rolling baseline catches what
    self-baselining structurally cannot: a WHOLESALE shift — every
    partition drifting together — leaves each partition close to the
    run's own pooled histogram (PASS) but far from the history (FAIL).

    Reads the O(runs x buckets) histogram table (appended by
    run_with_manifest's ``hist_dir``), keeps the ``last_k`` most recent
    runs by commit time, and AVERAGES bucket counts across them (the
    PSI/KS kernel normalizes to shares, so mean vs sum only changes the
    Laplace smoothing weight; mean keeps it comparable to a single run).
    ``per_partition=False`` (default) pools each run's histogram across
    partitions before averaging — one (bucket, base_n) frame every
    partition drifts against. ``per_partition=True`` keeps the store's
    per-partition resolution: a (partition_key, bucket, base_n) frame
    where each partition is compared to ITS OWN history (the reference's
    per-device semantic, /root/reference/algo/operator.py:106-118, lifted
    from scalar metrics to full distributions); a partition averages over
    the runs it actually appeared in. drift_scores switches to the
    per-partition join automatically when the baseline carries a
    partition_key column.

    Retry-appended rows collapse via (run_id, partition_key, bucket)
    dedupe (histograms are deterministic); ``exclude_run_id`` keeps a
    crashed run's own partial append out of its retry's baseline.
    Returns a frame SNAPSHOTTED eagerly — O(partitions x buckets) rows —
    so the caller's later append to hist_dir cannot poison plans built
    on it (the done-set lesson), or None when no history exists yet.
    """
    try:
        df = spark.read.parquet(hist_dir)
    except Exception:
        return None
    rows = df.filter(F.col("suite_id") == sid)
    if exclude_run_id is not None:
        rows = rows.filter(F.col("run_id") != exclude_run_id)
    rows = rows.dropDuplicates(["run_id", "partition_key", "bucket"])
    last = (
        rows.groupBy("run_id")
        .agg(F.max("committed_at").alias("_at"))
        .orderBy(F.col("_at").desc(), F.col("run_id").desc())
        .limit(last_k)
        .select("run_id")
    )
    kept = rows.join(F.broadcast(last), "run_id")
    if per_partition:
        base = kept.groupBy("partition_key", "bucket").agg(F.avg("n").alias("base_n"))
    else:
        pooled = kept.groupBy("run_id", "bucket").agg(F.sum("n").alias("_pn"))
        base = pooled.groupBy("bucket").agg(F.avg("_pn").alias("base_n"))
    collected = base.collect()
    if not collected:
        return None
    return spark.createDataFrame(collected, base.schema)


def rolling_baseline_dict(
    spark: SparkSession, hist_dir: str, sid: str, last_k: int = 5
) -> dict[int, float] | None:
    """The rolling baseline as the {bucket: count} dict
    streaming/drift.py drift_stream ships in its closure — the bridge
    from the batch-maintained histogram store to the continuous scorer:
    batch runs keep appending history, the stream drifts every trigger
    against the last K runs' mean."""
    base = rolling_baseline(spark, hist_dir, sid, last_k)
    if base is None:
        return None
    return {int(r["bucket"]): float(r["base_n"]) for r in base.collect()}


def scorecard(manifest: DataFrame, suite_sid: str | None = None) -> DataFrame:
    """Operational quality scorecard per check over the whole manifest
    history — the burn-down view diff.py's run-over-run deltas feed:
    one row per check_id with

    * ``n_runs`` / ``n_partitions`` — coverage of the history,
    * ``n_fail`` / ``n_pass`` / ``fail_rate`` — all-time verdict mix
      (SKIPPED excluded from the rate's denominator: a warm-up is not
      a pass),
    * ``n_failing_now`` — partitions whose LATEST run FAILs,
    * ``max_streak`` / ``worst_partition`` — the longest CURRENT run of
      consecutive FAILs and who holds it (a partition failing 7 runs
      straight is a different incident than 7 partitions failing once).
      A PASS or SKIPPED breaks the streak; runs order by
      (committed_at, run_id), the manifest convention.

    All relational over the manifest's O(runs x partitions x checks)
    metadata rows — the data tables are never touched. Deterministic:
    worst_partition ties break on the partition key itself."""
    from pyspark.sql import Window

    m = manifest
    if suite_sid is not None:
        m = m.filter(F.col("suite_id") == suite_sid)
    keys = ["check_id", "partition_key"]
    rn = F.row_number().over(
        Window.partitionBy(*keys).orderBy(
            F.col("committed_at").desc(), F.col("run_id").desc()
        )
    )
    r = m.select(*keys, "run_id", "verdict", "committed_at").withColumn("_rn", rn)
    first_ok = (
        r.filter(F.col("verdict") != "FAIL")
        .groupBy(*keys)
        .agg(F.min("_rn").alias("_first_ok"))
    )
    per = (
        r.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum((F.col("verdict") == "FAIL").cast("long")).alias("_nf"),
            F.sum((F.col("verdict") == "PASS").cast("long")).alias("_np"),
        )
        # null-safe: a NULL partition that PASSes must find its first_ok
        # row, or its _streak coalesces to "all runs failing"
        .transform(lambda d: null_safe_join(d, first_ok, keys, "left"))
        .withColumn(
            "_streak", F.coalesce(F.col("_first_ok") - 1, F.col("_n")).cast("long")
        )
    )
    runs = m.groupBy("check_id").agg(
        F.countDistinct("run_id").cast("long").alias("n_runs")
    )
    agg = per.groupBy("check_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_partitions"),
        F.sum("_nf").cast("long").alias("n_fail"),
        F.sum("_np").cast("long").alias("n_pass"),
        F.sum((F.col("_streak") >= 1).cast("long")).alias("n_failing_now"),
        F.max("_streak").alias("max_streak"),
        F.max_by("partition_key", F.struct("_streak", "partition_key")).alias(
            "worst_partition"
        ),
    )
    return (
        agg.join(F.broadcast(runs), "check_id")
        .withColumn(
            "fail_rate",
            F.when(
                F.col("n_fail") + F.col("n_pass") > 0,
                F.round(F.col("n_fail") / (F.col("n_fail") + F.col("n_pass")), 6),
            ).otherwise(F.lit(0.0)),
        )
        .select(
            "check_id", "n_runs", "n_partitions", "n_fail", "n_pass",
            "fail_rate", "n_failing_now", "max_streak", "worst_partition",
        )
    )


def incidents(manifest: DataFrame, suite_sid: str | None = None) -> DataFrame:
    """The scorecard transposed for triage: one row per PARTITION whose
    latest run FAILs any check — (partition_key, n_checks_failing,
    failing_checks, first_failed_at). Five checks failing on one
    partition since the same run is ONE incident (a bad upstream load),
    not five; ``first_failed_at`` is the earliest commit timestamp among
    the partition's current FAIL streaks, i.e. when the incident began.
    Same streak algebra as scorecard (anchored at the latest run;
    PASS/SKIPPED breaks a streak); failing_checks sorts for determinism.
    Manifest metadata only — no data scans."""
    from pyspark.sql import Window

    m = manifest
    if suite_sid is not None:
        m = m.filter(F.col("suite_id") == suite_sid)
    keys = ["check_id", "partition_key"]
    rn = F.row_number().over(
        Window.partitionBy(*keys).orderBy(
            F.col("committed_at").desc(), F.col("run_id").desc()
        )
    )
    r = m.select(*keys, "run_id", "verdict", "committed_at").withColumn("_rn", rn)
    first_ok = (
        r.filter(F.col("verdict") != "FAIL")
        .groupBy(*keys)
        .agg(F.min("_rn").alias("_first_ok"))
    )
    streaks = (
        r.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_n"))
        # null-safe on partition_key, same reasoning as scorecard
        .transform(lambda d: null_safe_join(d, first_ok, keys, "left"))
        .withColumn("_streak", F.coalesce(F.col("_first_ok") - 1, F.col("_n")))
        .filter(F.col("_streak") >= 1)
    )
    # the streak's oldest run: the row at _rn == _streak
    started = null_safe_join(r, streaks, keys).filter(
        F.col("_rn") == F.col("_streak")
    )
    return (
        started.groupBy("partition_key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_checks_failing"),
            F.array_join(F.array_sort(F.collect_set("check_id")), ",").alias(
                "failing_checks"
            ),
            F.min("committed_at").alias("first_failed_at"),
        )
    )


def revalidation_plan(
    manifest: DataFrame,
    max_age_hours: float | None = None,
    now=None,
    suite_sid: str | None = None,
) -> DataFrame:
    """Which partitions need re-running, and why — the operational
    driver for the next `revalidate` cycle: one row per (partition_key,
    reason), reason in ``failed`` (the partition's LATEST run carries a
    FAIL verdict) | ``stale`` (latest commit older than
    ``max_age_hours`` against ``now`` — a timestamp/column for
    deterministic replay, default wall clock like checks/freshness).

    A partition can carry both reasons. SKIPPED verdicts are neither —
    they re-run on their own when more data arrives. All relational:
    latest-run selection is one max aggregate joined back (manifest
    frames are O(partitions x checks), tiny by construction).
    """
    if suite_sid is not None:
        manifest = manifest.filter(F.col("suite_id") == suite_sid)
    latest = manifest.groupBy("partition_key").agg(
        F.max("committed_at").alias("_latest_at")
    )
    # null-safe: NULL partitions have manifest rows too (resume handles
    # them via eqNullSafe); dropping them here would hide their incidents.
    cur = null_safe_join(manifest, latest, ["partition_key"]).filter(
        F.col("committed_at") == F.col("_latest_at")
    )
    failed = (
        cur.filter(F.col("verdict") == "FAIL")
        .select("partition_key", F.col("_latest_at").alias("last_committed_at"))
        .distinct()
        .withColumn("reason", F.lit("failed"))
    )
    plans = [failed]
    if max_age_hours is not None:
        anchor = F.lit(now).cast("timestamp") if now is not None else F.current_timestamp()
        stale = (
            latest.filter(
                F.col("_latest_at")
                < anchor - F.expr(f"INTERVAL {int(max_age_hours * 3600)} SECONDS")
            )
            .select("partition_key", F.col("_latest_at").alias("last_committed_at"))
            .withColumn("reason", F.lit("stale"))
        )
        plans.append(stale)
    out = plans[0]
    for p in plans[1:]:
        out = out.unionByName(p)
    return out.select("partition_key", "reason", "last_committed_at")


def sample_violations(
    violations: DataFrame, counts: DataFrame, per_group: int
) -> DataFrame:
    """Deterministic ~per_group evidence sample per (partition_key, check_id).

    Hash-threshold sampling: a row survives iff
    ``xxhash64(identity) mod 1e6 < 1e6 * min(1, per_group / n_violations)``.
    Properties that matter at scale:

    * map-only after ONE broadcast join of the O(partitions x checks)
      counts frame — no per-group sort/rank window, so a pathological
      10^11-row group costs the same per row as a 10-row group (a rank
      window would funnel the whole group through one reducer's sort);
    * deterministic in row identity — retries, speculative tasks, and
      repartitioning keep the SAME rows, so the at-least-once sink still
      dedupes exactly;
    * groups with n <= per_group keep every row (rate folds to 1);
      larger groups land binomially around per_group — this caps the
      sink's ORDER, which is the point; exact-N would cost the sort.
    """
    rate = F.least(F.lit(1.0), F.lit(float(per_group)) / F.col("n_violations"))
    keep = F.pmod(
        F.xxhash64("repo", "path", "commit", "partition_key", "check_id"),
        F.lit(1_000_000),
    ) < (rate * 1_000_000)
    # null-safe: a NULL-partition violation that misses its count row
    # would get rate NULL -> keep NULL -> silently dropped from the sink.
    return (
        null_safe_join(
            violations, counts, ["partition_key", "check_id"], "left",
            broadcast_right=True,
        )
        .where(keep)
        .drop("n_violations")
        .select(*violations.columns)
    )


def run_with_manifest(
    df: DataFrame,
    manifest_dir: str,
    suite: list[CheckSpec] | None = None,
    partition_col: str = "lang",
    run_id: str | None = None,
    freeze_drift_baseline: bool = False,
    violations_sink: str | None = None,
    count_skipped_rows: bool = False,
    collect_verdict_counts: bool = False,
    sketches_dir: str | None = None,
    quantile_sketches_dir: str | None = None,
    topk_sketches_dir: str | None = None,
    membership_dir: str | None = None,
    kmv_sketches_dir: str | None = None,
    schemas_dir: str | None = None,
    hist_dir: str | None = None,
    rolling_baseline_k: int | None = None,
    cache_pending: bool = False,
    revalidate: bool = False,
    max_violations_per_check: int | None = None,
) -> ManifestRun:
    """Run the suite on not-yet-committed partitions; commit once at the end.

    ``revalidate=True`` is the scheduled re-validation mode: the
    committed-partition prune is skipped, so EVERY partition runs again
    and appends a fresh metrics row under this run_id. Idempotent resume
    still applies WITHIN the run (a crash re-runs it wholesale), and the
    manifest becomes a per-(partition, check, metric) time series —
    checks/history.py flags the newest run against that history.

    Idempotent: a rerun over the same input+suite is a no-op; a crash
    before the final append leaves no partial state, so the retry simply
    redoes the pending partitions.

    ``violations_sink``: parquet directory for violation rows. Written
    BEFORE the manifest append — manifest commit is the last side effect,
    so a crash between the two re-runs the partitions (duplicate
    violation rows possible, at-least-once) instead of silently losing
    them (manifest committed but violations gone — the failure the
    reversed order would allow, since resume prunes committed partitions).

    ``max_violations_per_check``: bound the SINK, never the accounting.
    At 10^12 rows a hot check (a mega-repo duplicated wholesale) can emit
    violation rows proportional to the table — an unbounded sink is the
    operational hazard, while the manifest only ever needs counts. When
    set, each (partition_key, check_id) group keeps ~N evidence rows via
    deterministic hash-threshold sampling (keep-rate N/count against
    xxhash64 of the row identity): map-only after one broadcast join of
    the already-computed per-group counts — no per-group sort, so a
    10^11-row group costs the same per row as a small one. Groups at or
    under N are kept exactly; larger groups are binomial around N. The
    manifest's n_violations stays EXACT (it aggregates the full frame);
    the same rows survive retries and repartitioning (hash, not random),
    so the at-least-once sink stays dedupable. Run-over-run diffing
    (plans/diff.py) over a sampled sink is approximate by construction —
    a row absent from the sample is not evidence it was resolved.

    ``count_skipped_rows=True`` additionally counts input rows pruned
    because their partition was already committed — streaming callers use
    it to detect partitions whose rows are split across micro-batches.

    ``freeze_drift_baseline=True`` enables T2/T3 semantics: the first run
    freezes the pooled content-length histogram next to the manifest and
    injects it as every later run's drift baseline (instead of each run
    self-baselining against its own pooled distribution).

    ``cache_pending=False`` (default): the pending frame is NOT cached.
    Every consumer re-scans the source with column pruning + the
    broadcast anti-join re-applied — the partition-key-only consumers
    (n_keys, rows_per_part) read one tiny column, and the suite's scans
    cost the same as the bare suite. Caching the full-width pending
    table (content included) measured 328s vs 86s end-to-end at 32M
    rows/local[8]: the first action serializes ~14 GB into storage
    memory and every later scan rereads the spill — and at the target
    10^12-row scale a full-table cache is not even possible. Set
    ``cache_pending=True`` only when the pending slice is known small
    (e.g. an incremental tail) and the source scan is expensive (slow
    object store).
    """
    if freeze_drift_baseline and rolling_baseline_k:
        raise ValueError(
            "freeze_drift_baseline and rolling_baseline_k are mutually "
            "exclusive baseline lifecycles (T2 frozen vs rolling history)"
        )
    if rolling_baseline_k and hist_dir is None:
        raise ValueError("rolling_baseline_k requires hist_dir (the histogram store)")
    spark = df.sparkSession
    suite = suite or default_suite(partition_col=partition_col)
    sid = suite_id(suite)
    rid = run_id or uuid.uuid4().hex[:16]

    manifest = read_manifest(spark, manifest_dir)
    if revalidate:
        done = committed_partitions(manifest.limit(0), sid, n_checks=len(suite))
    else:
        done = committed_partitions(manifest, sid, n_checks=len(suite))
    # FREEZE the done-set now: it's O(partition cardinality) rows. Left
    # lazy, the anti-join re-reads the manifest path on every downstream
    # action — and the final commit APPENDS to that path and invalidates
    # its cached file listing, so any post-commit action on the run's
    # result frames (verdict_counts, a caller consuming run.result) would
    # see its own partitions as already committed and silently recompute
    # to EMPTY. The resume decision must be a snapshot taken at run
    # start, not a live view of the manifest.
    #
    # Mechanism: eager localCheckpoint, NOT collect+createDataFrame — the
    # snapshot materializes in executor block storage, so the done-set
    # never transits driver memory and the resume path stays bounded at
    # 10^7+ committed partitions (r3 verdict guardrail). Lineage is
    # truncated, which is exactly the freeze we need; the trade (an
    # executor loss during the run fails the job instead of recomputing)
    # is a crash, never a silent-empty recompute.
    done = done.localCheckpoint(eager=True)
    # the snapshot is materialized, so this count is an executor-side
    # block scan; past 5M keys the forced-broadcast hint (which would
    # rebuild the done-set inside driver memory) is dropped and AQE
    # picks the anti-join strategy
    pending = pending_input(df, done, partition_col, broadcast=done.count() <= 5_000_000)
    if cache_pending:
        pending = pending.cache()

    # One pruned scan feeds all the driver-side accounting: the per-key
    # row counts (O(#partitions) rows, cached) answer n_keys, the pending
    # row total, AND the manifest's n_rows column — previously three
    # separate scans of the partition column (distinct().count(),
    # pending.count(), and the late rows_per_part aggregate).
    rows_per_part = (
        pending.groupBy(F.col(partition_col).cast("string").alias("partition_key"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .cache()
    )
    n_keys = rows_per_part.count()
    skipped = None
    if count_skipped_rows:
        pending_rows = rows_per_part.agg(F.sum("n_rows")).collect()[0][0] or 0
        skipped = df.count() - pending_rows
    if n_keys == 0:
        rows_per_part.unpersist()
        if cache_pending:
            pending.unpersist()
        return ManifestRun(rid, sid, 0, None, skipped_rows=skipped)

    if rolling_baseline_k:
        drift_specs = [s for s in suite if s.name == "drift"]
        if drift_specs:
            # baseline_scope: 'pooled' (default) or 'partition' — the
            # latter compares each partition to ITS OWN history. Plain
            # config, so it is JSON-suite-declarable like gate_mode.
            scope = drift_specs[0].config.get("baseline_scope", "pooled")
            base = rolling_baseline(
                spark, hist_dir, sid, rolling_baseline_k, exclude_run_id=rid,
                per_partition=(scope == "partition"),
            )
            if base is not None:
                drift_specs[0].config = {**drift_specs[0].config, "baseline_df": base}

    if freeze_drift_baseline:
        from ..checks.drift import length_histogram

        drift_specs = [s for s in suite if s.name == "drift"]
        if drift_specs:
            spec = drift_specs[0]
            frozen = load_frozen_baseline(spark, manifest_dir, sid)
            if frozen is None:
                hist = length_histogram(
                    df,  # freeze over the FULL input, not just pending partitions
                    spec.partition_col,
                    spec.config.get("column", "content"),
                    spec.config.get("bucket_width", 100),
                )
                freeze_baseline(hist, manifest_dir, sid)
                frozen = load_frozen_baseline(spark, manifest_dir, sid)
            spec.config = {**spec.config, "baseline_df": frozen}

    res = run_suite(pending, suite=suite, cache=False)

    # Violation accounting is a plain groupBy on the envelope's own
    # partition_key (carried at emission, checks/base.py as_violations) —
    # no join back to the pending table, no extra wide shuffle. Computed
    # here (before the sink write) because the sampler reuses the counts;
    # cached only in that case, since the sampler would otherwise run the
    # violations plan a third time.
    viol_per_part = res.violations.groupBy("partition_key", "check_id").agg(
        F.count(F.lit(1)).alias("n_violations")
    )
    if max_violations_per_check is not None:
        viol_per_part = viol_per_part.cache()

    if violations_sink is not None:
        # Violations first, manifest last (see docstring). run_id/suite_id
        # ride every row so downstream diffing (plans/diff.py
        # violations_diff_runs) and auditing can scope a run without
        # joining back to the manifest.
        out_viol = res.violations
        if max_violations_per_check is not None:
            out_viol = sample_violations(out_viol, viol_per_part, max_violations_per_check)
        (
            out_viol.withColumn("run_id", F.lit(rid))
            .withColumn("suite_id", F.lit(sid))
            .write.mode("append")
            .parquet(violations_sink)
        )

    if sketches_dir is not None:
        # Per-partition HLL sketches for THIS run's pending partitions.
        # Sketches are mergeable, so the union of every committed run's
        # rows answers "global distinct contents" across the whole table
        # WITHOUT rescanning committed history (see global_distinct) —
        # the incremental form of the A8 distinct-count stat. Written
        # before the manifest commit, so AT-LEAST-ONCE like the
        # violations sink: readers must dedupe by (suite_id,
        # partition_key) — global_distinct does.
        from ..checks.stats import hll_sketches

        stats_specs = [s for s in suite if s.name == "stats"]
        sk_col = stats_specs[0].config.get("column", "content") if stats_specs else "content"
        (
            hll_sketches(pending, partition_col, sk_col)
            .withColumn("run_id", F.lit(rid))
            .withColumn("suite_id", F.lit(sid))
            .write.mode("append")
            .parquet(sketches_dir)
        )

    if quantile_sketches_dir is not None:
        # Per-partition t-digest sketches — the mergeable-quantile twin
        # of the HLL rows above: cross-run p50/p99 via global_quantiles
        # without rescanning committed history. Same at-least-once
        # semantics (written before the manifest commit; readers dedupe).
        from ..checks.quantiles import tdigest_sketches

        stats_specs = [s for s in suite if s.name == "stats"]
        q_col = stats_specs[0].config.get("column", "content") if stats_specs else "content"
        (
            tdigest_sketches(pending, partition_col, q_col)
            .withColumn("run_id", F.lit(rid))
            .withColumn("suite_id", F.lit(sid))
            .write.mode("append")
            .parquet(quantile_sketches_dir)
        )

    if topk_sketches_dir is not None:
        # Per-partition truncated top-k value counts — the heavy-hitter
        # member of the sketch family (checks/profile.py topk_sketches):
        # cross-run / cross-partition "all-time most frequent values"
        # with sound undercount bounds via global_topk, no rescan. Same
        # at-least-once semantics; readers dedupe like the other two.
        from ..checks.profile import topk_sketches

        stats_specs = [s for s in suite if s.name == "stats"]
        t_col = stats_specs[0].config.get("column", "content") if stats_specs else "content"
        (
            topk_sketches(pending, partition_col, t_col, run_id=rid)
            .withColumn("suite_id", F.lit(sid))
            .write.mode("append")
            .parquet(topk_sketches_dir)
        )

    if membership_dir is not None:
        # Per-partition bloom word rows — the MEMBERSHIP member of the
        # sketch family (checks/membership.py): "has any committed run
        # seen this (repo, path, commit) key" via seen_before, no rescan
        # of history. Unlike the other three sketch tables this one
        # needs NO dedupe-on-read: bit_or is idempotent, so an
        # at-least-once replay of a crashed run's append is a no-op.
        # n_bits/k/mode ride in the rows so the probe side can never
        # silently mismatch the build parameters.
        from ..checks.membership import bloom_words

        uniq_specs = [s for s in suite if s.name == "uniqueness"]
        m_keys = uniq_specs[0].config.get("key", ["repo", "path", "commit"]) if uniq_specs else ["repo", "path", "commit"]
        m_bits, m_k, m_mode = 1 << 22, 5, "xxhash64"
        (
            bloom_words(pending, partition_col, m_keys, n_bits=m_bits, k=m_k, mode=m_mode)
            .select(
                F.lit(rid).alias("run_id"),
                F.lit(sid).alias("suite_id"),
                "partition_key",
                "word_idx",
                "bits",
                F.lit(m_bits).alias("n_bits"),
                F.lit(m_k).alias("k"),
                F.lit(m_mode).alias("mode"),
            )
            .write.mode("append")
            .parquet(membership_dir)
        )

    if kmv_sketches_dir is not None:
        # Per-partition KMV bottom-k rows — the SET-ALGEBRA member of
        # the sketch family (checks/kmv.py): cross-run |A∩B| / Jaccard /
        # novelty ("how much of today's key set is new") via
        # novelty_stats or the declarable novelty check, no history
        # rescan. At-least-once appends are harmless twice over: the
        # merge distincts duplicate draws, and novelty_stats compares
        # only the latest run against everything before it.
        from ..checks.kmv import kmv_sketch

        uniq_specs = [s for s in suite if s.name == "uniqueness"]
        kv_keys = (
            list(uniq_specs[0].config.get("key", ["repo", "path", "commit"]))
            if uniq_specs
            else ["repo", "path", "commit"]
        )
        (
            kmv_sketch(pending, kv_keys, partition_col, k=256, hash_fn="xxhash64")
            .withColumn("run_id", F.lit(rid))
            .withColumn("suite_id", F.lit(sid))
            .write.mode("append")
            .parquet(kmv_sketches_dir)
        )

    if schemas_dir is not None:
        # Per-run physical-schema snapshot — driver-side metadata, zero
        # scans (checks/contract.py): feeds schema_changes ("when did
        # this column appear/vanish/change type") and the
        # schema_evolution gate ("changed since last run", no declared
        # contract needed). A replayed append re-records an identical
        # snapshot, which diffs as unchanged — harmless.
        from ..checks.contract import append_schema_snapshot

        append_schema_snapshot(pending, schemas_dir, rid)

    if hist_dir is not None:
        # Per-run PER-PARTITION drift histogram — the rolling-baseline
        # store. Reuses the drift check's already-cached
        # O(partitions x buckets) frame (CheckResult.hist), so this costs
        # one write, not a second scan. Per-partition rows carry strictly
        # more information than a pooled histogram at the same tiny
        # order: the pooled baseline derives by summing (rolling_baseline
        # default), the per-partition baseline by grouping
        # (per_partition=True). Appended before the manifest commit; same
        # at-least-once + dedupe-on-read story as the sketch tables
        # (histogram rows are deterministic in the input).
        dr = res.per_check.get("drift")
        if dr is not None and dr.hist is not None:
            (
                dr.hist.select(
                    F.lit(rid).alias("run_id"),
                    F.lit(sid).alias("suite_id"),
                    "partition_key",
                    "bucket",
                    "n",
                    F.current_timestamp().alias("committed_at"),
                )
                .write.mode("append")
                .parquet(hist_dir)
            )

    manifest_rows = (
        # null-safe: NULL partitions must keep their true n_rows /
        # n_violations instead of the coalesced 0 below.
        null_safe_join(
            res.verdicts.select("partition_key", "check_id", "verdict", "metrics"),
            rows_per_part, ["partition_key"], "left", broadcast_right=True,
        )
        .transform(
            lambda d: null_safe_join(
                d, viol_per_part, ["partition_key", "check_id"], "left",
                broadcast_right=True,
            )
        )
        .select(
            F.lit(rid).alias("run_id"),
            F.lit(sid).alias("suite_id"),
            "partition_key",
            "check_id",
            "verdict",
            "metrics",
            F.coalesce(F.col("n_rows"), F.lit(0)).cast("long").alias("n_rows"),
            F.coalesce(F.col("n_violations"), F.lit(0)).cast("long").alias("n_violations"),
            F.lit("committed").alias("status"),
            F.current_timestamp().alias("committed_at"),
        )
    )
    # Single atomic append per run — the LAST side effect of the run:
    # parquet dir append locally; on an Iceberg catalog this is one
    # snapshot commit (same atomicity story). Always append: isdir()
    # gates are False for non-local URIs and overwrite would wipe all
    # previously committed rows (destroying resume).
    manifest_rows.coalesce(1).write.mode("append").parquet(manifest_dir)
    verdict_counts = None
    if collect_verdict_counts:
        # collected while pending + drift caches are still hot — callers
        # that want a summary must not re-run the suite after unpersist
        verdict_counts = {
            r["verdict"]: r["n"]
            for r in res.verdicts.groupBy("verdict").agg(F.count(F.lit(1)).alias("n")).collect()
        }
    res.unpersist()
    rows_per_part.unpersist()
    if max_violations_per_check is not None:
        viol_per_part.unpersist()
    if cache_pending:
        pending.unpersist()
    return ManifestRun(rid, sid, n_keys, res, skipped_rows=skipped, verdict_counts=verdict_counts)
