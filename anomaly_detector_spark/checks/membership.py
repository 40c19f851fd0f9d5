"""Mergeable Bloom-filter membership sketches — the fourth member of the
sketch family (HLL = distincts, t-digest = quantiles, top-k = heavy
hitters, bloom = membership).

Answers the incremental-uniqueness question the in-run checks can't:
"has THIS (repo, path, commit) key ever been committed by a PREVIOUS
run?" — without rescanning committed history. The reference's batch
uniqueness (checks/uniqueness.py) sees one run's rows; at 10^12 files
with manifest resume, cross-run duplicate detection needs a persisted,
mergeable summary of every committed run's keys.

Representation: a RELATIONAL bloom — sparse rows
``(partition_key, word_idx, bits)`` where ``bits`` is a 64-bit word of
the partition's filter. Spark's own ``bloom_filter_agg`` is not
SQL-registered and materializes one driver-side object; the relational
form is strictly better here:

* **mergeable & idempotent** — cross-run merge is
  ``groupBy(partition_key, word_idx).agg(bit_or(bits))``; replaying a
  crashed run's append changes nothing (OR is idempotent), so unlike the
  HLL/t-digest/top-k rows there is NO at-least-once dedupe step.
* **partition-parallel** — one bloom per table partition, sized to the
  partition's key count, so no single filter needs 10^12 keys; probes
  join on ``(partition_key, word_idx)`` and touch only the partitions
  the new data lands in (partition pruning applies to the store scan).
* **never collected** — build, merge, and probe are all DataFrame ops;
  nothing driver-side at any scale.

Probe plan shape: k probe rows per distinct key (explode of k codegen'd
hash positions) -> join to the store on (partition_key, word_idx)
(broadcast when the store is small, shuffle-on-uniform-word_idx
otherwise) -> groupBy key with ``min(bit set)``. A key is ``maybe_seen``
only if ALL k bits are set; false positives are bounded by
``fill_ratio^k`` (``bloom_stats`` reports the measured fill per
partition), false negatives impossible — so candidates can be exactly
verified by an anti-join against history restricted to the flagged keys,
which at scale is a semi-join-pruned fraction of the table.

Hash modes mirror the dedup/ANN family (operators/dedup.py): production
``xxhash64`` (seeded, JVM codegen); ``sha`` derives the k positions from
non-overlapping 8-hex-char slices of sha256(key) so a DuckDB oracle can
reproduce every bit exactly (k <= 8).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# unit separator — same composite-key convention as checks/uniqueness.py
_SEP = "\x1f"


def _key_expr(key_cols: list[str]) -> F.Column:
    return F.concat_ws(_SEP, *[F.col(c).cast("string") for c in key_cols])


def _positions(key: F.Column, n_bits: int, k: int, mode: str) -> list[F.Column]:
    """k bit positions in [0, n_bits) for one key — pure codegen'd
    column expressions, no UDF."""
    if mode == "xxhash64":
        return [
            F.pmod(F.xxhash64(key, F.lit(i)), F.lit(n_bits)).cast("long")
            for i in range(k)
        ]
    if mode == "sha":
        if k > 8:
            raise ValueError("sha mode derives positions from 8 hex chars each; k <= 8")
        h = F.sha2(key, 256)
        return [
            F.pmod(
                F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("long"),
                F.lit(n_bits),
            )
            for i in range(k)
        ]
    raise ValueError(f"unknown hash mode {mode!r}")


def bloom_words(
    df: DataFrame,
    partition_col: str,
    key_cols: list[str],
    n_bits: int = 1 << 22,
    k: int = 5,
    mode: str = "xxhash64",
) -> DataFrame:
    """Per-partition bloom word rows (partition_key, word_idx, bits) for
    the rows' composite keys.

    One narrow projection + explode(k) + one hash aggregate; the shuffle
    carries at most n_bits/64 rows per partition after map-side
    combining, independent of row count. Key dedup is NOT needed first —
    bit_or makes duplicate keys free."""
    pos = F.explode(
        F.array(*_positions(_key_expr(key_cols), n_bits, k, mode))
    ).alias("pos")
    return (
        df.select(F.col(partition_col).cast("string").alias("partition_key"), pos)
        .select(
            "partition_key",
            F.expr("pos DIV 64").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("partition_key", "word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_merge(words: DataFrame) -> DataFrame:
    """Merge word rows across runs/appends into one filter per
    (partition_key, word_idx). Idempotent: replayed appends are no-ops."""
    return words.groupBy("partition_key", "word_idx").agg(
        F.bit_or("bits").alias("bits")
    )


def bloom_probe(
    df: DataFrame,
    words: DataFrame,
    partition_col: str,
    key_cols: list[str],
    n_bits: int = 1 << 22,
    k: int = 5,
    mode: str = "xxhash64",
    broadcast_store: bool = True,
) -> DataFrame:
    """One row per distinct probed key:
    (partition_key, key_cols..., maybe_seen boolean).

    ``maybe_seen=False`` is definitive (no false negatives with the SAME
    n_bits/k/mode the store was built with); ``maybe_seen=True`` is a
    candidate to verify exactly. ``broadcast_store=False`` switches the
    store join to a shuffle on (partition_key, word_idx) — word_idx is
    uniform by construction, so the join never skews."""
    key = _key_expr(key_cols)
    pos_struct = F.explode(
        F.array(*_positions(key, n_bits, k, mode))
    ).alias("pos")
    probes = df.select(
        F.col(partition_col).cast("string").alias("partition_key"),
        *[F.col(c) for c in key_cols],
        pos_struct,
    ).select(
        "partition_key",
        *key_cols,
        F.expr("pos DIV 64").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
            "mask"
        ),
    )
    from .base import null_safe_join

    # null-safe on partition_key: a NULL partition's filter lives under a
    # NULL key in the store; a plain = join would miss it and turn every
    # probe into a FALSE NEGATIVE, breaking the "maybe_seen=False is
    # definitive" contract.
    joined = null_safe_join(
        probes,
        bloom_merge(words),
        ["partition_key", "word_idx"],
        "left",
        broadcast_right=broadcast_store,
    )
    hit = (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask")) == F.col("mask"))
    return joined.groupBy("partition_key", *key_cols).agg(
        F.min(hit.cast("int")).cast("boolean").alias("maybe_seen")
    )


def bloom_stats(words: DataFrame, n_bits: int, k: int) -> DataFrame:
    """Per-partition fill and false-positive estimate:
    (partition_key, set_bits, fill_ratio, fpp_est). fpp_est =
    fill_ratio^k — the probability an absent key finds all k bits set.
    Use it to decide when a partition's filter needs a rebuild at larger
    n_bits (fill > ~0.5 means fpp_est > ~3% at k=5)."""
    merged = bloom_merge(words)
    return (
        merged.groupBy("partition_key")
        .agg(F.sum(F.bit_count("bits")).alias("set_bits"))
        .select(
            "partition_key",
            "set_bits",
            F.round(F.col("set_bits") / F.lit(float(n_bits)), 6).alias("fill_ratio"),
            F.round(
                F.pow(F.col("set_bits") / F.lit(float(n_bits)), F.lit(k)), 6
            ).alias("fpp_est"),
        )
    )


def read_store(spark, membership_dir: str, suite_sid: str | None = None):
    """Load a persisted bloom word store and its build parameters.

    Returns (words_df(partition_key, word_idx, bits), n_bits, k, mode).
    A store mixing (n_bits, k, mode) parameter sets — a config change
    between runs — is REJECTED rather than silently probed wrong:
    positions derived under different parameters are meaningless against
    each other's words; rebuild the store instead."""
    from pyspark.sql import functions as _F

    words = spark.read.parquet(membership_dir)
    if suite_sid is not None:
        words = words.filter(_F.col("suite_id") == suite_sid)
    params = words.select("n_bits", "k", "mode").distinct().collect()
    if len(params) != 1:
        raise ValueError(
            f"membership store holds {len(params)} (n_bits, k, mode) parameter "
            "sets; probes are only sound against one — rebuild the store"
        )
    p = params[0]
    return (
        words.select("partition_key", "word_idx", "bits"),
        p["n_bits"],
        p["k"],
        p["mode"],
    )


def run_seen_before(df: DataFrame, spec) -> "CheckResult":
    """Declarable cross-run key-membership check: FAIL a partition when
    more than ``max_seen`` of its keys were already committed by a
    PREVIOUS run (per the persisted bloom store at ``config['store']``).

    Config:
    * ``store`` (required) — membership_dir a prior
      run_with_manifest(membership_dir=...) appended to. The store's
      partition_key values must come from the same partition column.
    * ``key`` — composite key columns (default (repo, path, commit)).
    * ``history`` — optional parquet path of the committed history
      table; when given, bloom candidates are EXACTLY verified by a
      semi-join restricted to the flagged keys, so n_dup is precise and
      violations are real duplicates. Without it, n_dup is the bloom
      candidate count — an upper bound that includes false positives at
      ~fill_ratio^k (size the store, or set max_seen, accordingly).
    * ``max_seen`` — FAIL threshold on n_dup (default 0).
    * ``broadcast_store`` — probe-join strategy (default True).

    The store path participates in the check id (unlike injected
    DataFrames): two suites probing different stores are different
    checks with separate manifest streams."""
    from .base import (
        CheckResult,
        as_violations,
        empty_violations,
        null_safe_join,
        verdict_frame,
    )

    spark = df.sparkSession
    keys = list(spec.config.get("key", ["repo", "path", "commit"]))
    words, n_bits, k, mode = read_store(spark, spec.config["store"])
    probed = bloom_probe(
        df,
        words,
        spec.partition_col,
        keys,
        n_bits=n_bits,
        k=k,
        mode=mode,
        broadcast_store=spec.config.get("broadcast_store", True),
    )
    cand = probed.filter(F.col("maybe_seen"))

    history = spec.config.get("history")
    if history is not None:
        hist_keys = spark.read.parquet(history).select(*keys).distinct()
        # null-safe: the bloom words hash NULL key components (concat_ws
        # skips them deterministically), so a NULL-keyed candidate is
        # real and must verify against the same NULL-keyed history row —
        # a plain = semi-join would silently acquit it.
        dup = null_safe_join(cand, hist_keys, keys, "left_semi")
        observed, expected = "key committed by a previous run", "key never committed before"
    else:
        dup = cand
        observed = "bloom candidate: key maybe committed by a previous run (unverified)"
        expected = "key never committed before"

    per = (
        probed.groupBy("partition_key")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(F.col("maybe_seen").cast("long")).alias("n_candidates"),
        )
        # null-safe: a NULL partition's candidates must keep their n_dup,
        # or the fillna(0) below turns its verdict into a false PASS.
        .transform(
            lambda d: null_safe_join(
                d,
                dup.groupBy("partition_key").agg(F.count(F.lit(1)).alias("n_dup")),
                ["partition_key"],
                "left",
            )
        )
        .fillna(0, ["n_dup"])
    )
    verdicts = verdict_frame(
        per,
        spec.id,
        "partition_key",
        fail_when=F.col("n_dup") > spec.config.get("max_seen", 0),
        skip_when=F.col("n_keys") < spec.min_rows,
        metric_cols=["n_keys", "n_candidates", "n_dup"],
    )
    violations = (
        as_violations(
            dup,
            spec.id,
            observed=F.lit(observed),
            expected=F.lit(expected),
            partition_key=F.col("partition_key"),
        )
        if keys == ["repo", "path", "commit"]
        else empty_violations(df)
    )
    return CheckResult(violations=violations, verdicts=verdicts, metrics=per)


def suggest_n_bits(expected_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """Classic bloom sizing: (n_bits, k) for a target false-positive
    rate. n_bits = -n*ln(p)/ln(2)^2 rounded up to a multiple of 64;
    k = round(n_bits/n * ln 2), floored at 1."""
    if expected_keys <= 0:
        return 64, 1
    m = -expected_keys * math.log(fpp) / (math.log(2) ** 2)
    n_bits = int(math.ceil(m / 64.0)) * 64
    k = max(1, round(n_bits / expected_keys * math.log(2)))
    return n_bits, k
