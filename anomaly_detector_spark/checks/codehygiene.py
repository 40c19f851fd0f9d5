"""Code-hygiene checks: secrets, license posture, generated artifacts,
high-entropy blobs — declarable rules over the files table.

Each check is a ROWRULE (checks/rowrules.py protocol): a builder that
compiles to (bad: Column, observed: Column, expected: str), so all four
fold into the fused suite's existing single violations scan + single
verdict aggregate (plans/fused.py) — at 10^12 files the marginal cost
of the whole family is a few codegen'd expressions, not a pass.

Violation hygiene: the `observed` string NEVER carries the matched
text. A secrets violation reports the KINDS present ("aws_key,jwt"),
an entropy violation reports only that a candidate cleared the
threshold — the credential must not leak into the violations sink,
which is typically far more widely readable than the source table.

Semantics of each check:

* ``secrets``     — FAIL any partition with a row matching a known
                    credential pattern (operators/codescan.py
                    SECRET_PATTERNS; config ``patterns`` overrides).
* ``license``     — every file's detected license (SPDX tag or
                    canonical phrase) must sit in ``allowed`` (default
                    permissive set + 'none'); the per-repo rollup lives
                    in operators/codescan.py::license_mix.
* ``generated``   — autogen markers / minified line shape are
                    violations when ``max_bad_frac`` is exceeded —
                    default tolerates 20%: generated code is unwanted
                    corpus mass, not corruption.
* ``entropy_secrets`` — recall net for credentials no named pattern
                    catches: any >=20-char base64/hex-ish token whose
                    character entropy exceeds ``min_entropy`` nats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.codescan import (
    GENERATED_MARKER_RX,
    SECRET_PATTERNS,
    has_high_entropy_token,
    license_expr,
    secret_kinds,
)
from .base import CheckResult, CheckSpec
from .rowrules import _run_rule

DEFAULT_ALLOWED_LICENSES = ["Apache-2.0", "BSD", "MIT", "none"]


def _secrets_rule(spec: CheckSpec) -> tuple[Column, Column, str]:
    col = spec.config.get("column", "content")
    pats = spec.config.get("patterns", SECRET_PATTERNS)
    c = F.coalesce(F.col(col), F.lit(""))
    bad = None
    for _, rx in pats:
        m = c.rlike(rx)
        bad = m if bad is None else bad | m
    observed = F.concat(F.lit("secret kinds: "), secret_kinds(col, pats))
    return bad, observed, "no credential material in " + col


def _license_rule(spec: CheckSpec) -> tuple[Column, Column, str]:
    col = spec.config.get("column", "content")
    allowed = sorted(spec.config.get("allowed", DEFAULT_ALLOWED_LICENSES))
    head_chars = int(spec.config.get("head_chars", 2048))
    lic = license_expr(col, head_chars)
    bad = ~lic.isin(allowed)
    observed = F.concat(F.lit("license="), lic)
    return bad, observed, f"license in {{{','.join(allowed)}}}"


def _generated_rule(spec: CheckSpec) -> tuple[Column, Column, str]:
    col = spec.config.get("column", "content")
    max_line = int(spec.config.get("max_line_len", 1000))
    avg_line = float(spec.config.get("avg_line_len", 300.0))
    min_total = int(spec.config.get("min_total_len", 2000))
    c = F.coalesce(F.col(col), F.lit(""))
    lines = F.split(c, r"\n")
    lens = F.transform(lines, lambda x: F.length(x).cast("double"))
    mx = F.array_max(lens)
    avg = F.aggregate(lens, F.lit(0.0), lambda a, x: a + x) / F.size(lines)
    marker = c.rlike(GENERATED_MARKER_RX)
    minified = (mx >= max_line) | ((F.length(c) >= min_total) & (avg >= avg_line))
    bad = marker | minified
    observed = F.concat(
        F.lit("gen_marker="), marker.cast("string"),
        F.lit(" max_line="), mx.cast("long").cast("string"),
    )
    return bad, observed, "not auto-generated or minified"


def _entropy_rule(spec: CheckSpec) -> tuple[Column, Column, str]:
    col = spec.config.get("column", "content")
    min_entropy = float(spec.config.get("min_entropy", 2.9))
    min_len = int(spec.config.get("min_len", 20))
    bad = has_high_entropy_token(col, min_entropy=min_entropy, min_len=min_len)
    observed = F.lit(f"candidate token entropy > {min_entropy}")
    return bad, observed, f"no high-entropy (>{min_entropy} nats) secret-shaped tokens"


def run_secrets(df: DataFrame, spec: CheckSpec) -> CheckResult:
    return _run_rule(df, spec, _secrets_rule)


def run_license(df: DataFrame, spec: CheckSpec) -> CheckResult:
    return _run_rule(df, spec, _license_rule)


def run_generated(df: DataFrame, spec: CheckSpec) -> CheckResult:
    return _run_rule(df, spec, _generated_rule)


def run_entropy_secrets(df: DataFrame, spec: CheckSpec) -> CheckResult:
    return _run_rule(df, spec, _entropy_rule)


run_secrets._rule_builder = _secrets_rule  # type: ignore[attr-defined]
run_license._rule_builder = _license_rule  # type: ignore[attr-defined]
run_generated._rule_builder = _generated_rule  # type: ignore[attr-defined]
run_entropy_secrets._rule_builder = _entropy_rule  # type: ignore[attr-defined]


def code_hygiene_rules(
    partition_col: str = "lang",
    min_rows: int = 25,
    allowed_licenses: list[str] | None = None,
) -> list[CheckSpec]:
    """The four hygiene checks as fuse-ready CheckSpecs — pass to
    ``constraint_suite(rules=...)`` (or append to any suite) and the
    fused runner folds them into the existing two row-pass scans."""
    allowed = allowed_licenses if allowed_licenses is not None else DEFAULT_ALLOWED_LICENSES
    # "column" is declared explicitly (not left to the builder default)
    # so the suite_column_coverage blind-spot audit sees these checks
    # covering the content column.
    return [
        CheckSpec("secrets", run_secrets, {"column": "content"}, partition_col, min_rows),
        CheckSpec(
            "license", run_license,
            {"column": "content", "allowed": sorted(allowed)}, partition_col, min_rows,
        ),
        CheckSpec(
            "generated", run_generated,
            {"column": "content", "max_bad_frac": 0.2}, partition_col, min_rows,
        ),
        CheckSpec(
            "entropy_secrets", run_entropy_secrets,
            {"column": "content"}, partition_col, min_rows,
        ),
    ]
