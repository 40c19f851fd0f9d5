"""Sampled validation tier: distribution checks over a deterministic sample.

The middle tier between footer-stats validation (checks/metadata.py —
zero data pages) and the full scan suite (plans/tiered.py escalation):
at 10^12 files a ``frac=1e-3`` uniform sample reads ~1/1000 of the bytes
while distribution checks — stats, drift, count_drift — keep nearly all
their power, because they test RATES and SHAPES, which a uniform sample
estimates unbiasedly with quantifiable error (binomial CIs below).

Identity checks are NOT sample-safe and are refused with an error rather
than silently weakened: a duplicate pair survives a ``frac`` sample with
probability ``frac**2`` (uniqueness would miss essentially every
violation), and referential violations are rare-event row counts a
sample can miss entirely. Those run in the footer tier (row counts,
null counts) or the full scan.

The sample predicate is the engine's standard deterministic draw
(operators/corpus.py sample_hash): keep iff the first 8 hex chars of
``sha256(salt || key)`` compare below a rate threshold. It is a
codegen'd string expression evaluated at the scan — zero shuffle, no RNG
state, invariant under partitioning, task retries, and speculative
execution, and replayable by any ANSI engine (the oracle evaluates the
same literal). Reference analog: the reference validates EVERY message
against its full history (/root/reference/algo/operator.py:174); the
sampled tier is the scale-out answer for when that is no longer
affordable per run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..checks.base import CheckSpec
from ..operators.corpus import rate_to_hex_threshold, sample_hash
from .suite import SuiteResult, default_suite, run_suite

#: check names whose semantics survive uniform sampling (rate/shape tests)
SAMPLE_SAFE = {"stats", "drift", "count_drift"}

_Z95 = 1.959964  # two-sided 95% normal quantile


def sample_predicate(
    key_cols: tuple[str, ...] = ("repo", "path", "commit"),
    frac: float = 0.001,
    salt: str = "val1",
) -> Column:
    """Deterministic Bernoulli keep-predicate over the row identity key."""
    key = F.concat_ws("|", *[F.col(c) for c in key_cols])
    return sample_hash(key, salt) < F.lit(rate_to_hex_threshold(frac))


def sample_estimates(
    sampled: DataFrame,
    frac: float,
    partition_col: str = "lang",
    col: str = "content",
    min_rows: int = 25,
    max_null_rate: float = 0.0,
) -> DataFrame:
    """Per-partition scale-up estimates off the sampled frame.

    ``n_rows_est = n_sampled / frac`` (unbiased under the uniform draw);
    ``null_rate`` is the sample rate with a ``ci95`` normal-approximation
    half-width ``z * sqrt(p(1-p)/n)`` so the consumer sees the margin a
    verdict carries. SKIPPED below ``min_rows`` SAMPLED rows — the
    warm-up guard applies to the evidence actually seen, not the
    extrapolation. One groupBy of three aggregates; O(partitions) rows.
    """
    p = F.col("null_rate")
    per = sampled.groupBy(F.col(partition_col).alias("partition_key")).agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.avg(F.col(col).isNull().cast("double")).alias("null_rate"),
    )
    return per.select(
        "partition_key",
        "n_sampled",
        F.round(F.col("n_sampled") / F.lit(frac), 2).alias("n_rows_est"),
        F.round(p, 6).alias("null_rate"),
        F.round(
            F.lit(_Z95) * F.sqrt(p * (1 - p) / F.col("n_sampled")), 6
        ).alias("ci95"),
        F.when(F.col("n_sampled") < min_rows, F.lit("SKIPPED"))
        .when(p > max_null_rate, F.lit("FAIL"))
        .otherwise(F.lit("PASS"))
        .alias("verdict"),
    )


def sampled_specs(suite: list[CheckSpec], frac: float) -> list[CheckSpec]:
    """Sample-safe subset of ``suite`` with ``sample_frac`` stamped into
    each spec's config.

    The stamp is the POINT: check ids are content-addressed over config,
    so sampled verdicts get distinct check_ids and the sampled suite a
    distinct suite_id — a sampled PASS can never mark a partition as
    committed in the FULL suite's manifest stream. The two tiers resume
    independently.
    """
    from dataclasses import replace

    return [
        replace(s, config={**s.config, "sample_frac": frac})
        for s in suite
        if s.name in SAMPLE_SAFE
    ]


def sampled_suite(
    df: DataFrame,
    frac: float,
    suite: list[CheckSpec] | None = None,
    key_cols: tuple[str, ...] = ("repo", "path", "commit"),
    salt: str = "val1",
    fused: bool = True,
) -> SuiteResult:
    """Run the sample-safe subset of the suite over the deterministic sample.

    With the default suite, the unsafe members (uniqueness, referential)
    are dropped automatically; an explicitly passed suite containing an
    unsafe check raises — silently weakening an identity check to a
    sample would report false PASSes at exactly the scale this tier
    exists for.
    """
    if suite is None:
        suite = [s for s in default_suite() if s.name in SAMPLE_SAFE]
    else:
        unsafe = [s.name for s in suite if s.name not in SAMPLE_SAFE]
        if unsafe:
            raise ValueError(
                f"checks not sample-safe: {unsafe}; run them in the footer "
                "tier or the full scan (see module docstring)"
            )
    sampled = df.filter(sample_predicate(key_cols, frac, salt))
    res = run_suite(sampled, suite, fused=fused)
    return SuiteResult(
        violations=res.violations.withColumn("sample_frac", F.lit(frac)),
        verdicts=res.verdicts.withColumn("sample_frac", F.lit(frac)),
        per_check=res.per_check,
    )
