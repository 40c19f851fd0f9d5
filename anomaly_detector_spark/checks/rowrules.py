"""Row-level constraint checks: format (regex), accepted-values,
completeness, and cross-column predicate rules.

The reference validates each incoming message structurally before its
kernel runs — the config-driven mapping layer rejects messages whose
selected fields are absent or unparseable (/root/reference/util/
config.py:46-59 feeding util/op_base.py:63-74, where a failed mapping
drops the message). Reframed relationally, those are row-level
constraints over the files table, the same check family a Deequ-style
declarative validator exposes:

* ``run_format``           — column matches an (anchored) regex;
* ``run_accepted_values``  — column value within a literal set (the
  expression-only sibling of the broadcast-dim referential check: use
  this when the domain is small enough to embed in the plan, the
  referential check when it is a real dimension table);
* ``run_completeness``     — column null fraction under a threshold,
  with the NULL rows emitted as violations (the stats check reports
  null_rate as a metric; this one makes it a verdict + violations);
* ``run_row_predicate``    — an arbitrary SQL boolean over the row
  (cross-column constraints); NULL evaluates as a violation.

All four compile to pure column expressions — codegen'd JVM predicates,
no UDFs — so each standalone check costs one pruned scan for violations
plus one partial-aggregated scan for the verdict, and the fused path
(``fused_rule_checks``) folds EVERY rule check in the suite into that
same two-scan budget: one select building an array of per-rule structs
filtered+exploded to violations, one groupBy with per-rule conditional
sums for all verdicts. At 10^12 rows the marginal cost of an extra rule
is an extra expression in an existing WholeStageCodegen span, not an
extra pass over the table.

Verdict semantics: FAIL when bad_rows > max_bad_frac * n_rows (default
0.0 — any violation fails), SKIPPED under ``min_rows`` (the reference's
warm-up guard, /root/reference/algo/operator.py:164-170).

NULL handling is explicit per check: format/accepted_values treat NULL
as a violation unless ``allow_null`` is set (then NULL passes);
completeness exists precisely to count NULLs; row predicates follow SQL
three-valued logic collapsed pessimistically (NULL -> violation), so a
rule can never silently pass on missing data.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .base import CheckResult, CheckSpec, as_violations, empty_violations, verdict_frame

# Violation `observed` strings are truncated to this many chars so a rule
# on `content` never ships whole documents through the violations sink.
_OBS_MAX = 64


def _obs(column: str) -> Column:
    c = F.coalesce(F.col(column).cast("string"), F.lit("NULL"))
    return F.concat(F.lit(column + "="), F.substring(c, 1, _OBS_MAX))


def _format_rule(spec: CheckSpec) -> tuple[Column, Column, str]:
    col, pat = spec.config["column"], spec.config["pattern"]
    allow_null = bool(spec.config.get("allow_null", False))
    # rlike(NULL) is NULL -> coalesce routes NULL rows to allow_null.
    # rlike is SEARCH semantics (both in Spark and the DuckDB oracle's
    # regexp_matches): anchor the pattern (^...$) to constrain the whole value.
    bad = ~F.coalesce(F.col(col).rlike(pat), F.lit(allow_null))
    return bad, _obs(col), f"{col} rlike {pat}"


def _accepted_rule(spec: CheckSpec) -> tuple[Column, Column, str]:
    col = spec.config["column"]
    values = sorted(spec.config["values"])
    allow_null = bool(spec.config.get("allow_null", False))
    bad = ~F.coalesce(F.col(col).isin(values), F.lit(allow_null))
    return bad, _obs(col), f"{col} in {{{','.join(values)}}}"


def _completeness_rule(spec: CheckSpec) -> tuple[Column, Column, str]:
    col = spec.config["column"]
    return F.col(col).isNull(), _obs(col), f"{col} is not null"


def _json_rule(spec: CheckSpec) -> tuple[Column, Column, str]:
    """Valid-JSON-matching-schema rule via the corrupt-record column:
    ``from_json`` PERMISSIVE can't distinguish malformed input from a
    parseable object with missing fields (both yield a null-filled
    struct), so the schema gets an appended corrupt-record field — it is
    non-null exactly when the parse (or a declared field's type) failed.
    ``required`` fields must additionally be present and non-null.
    Note: a top-level JSON scalar ('5') counts corrupt under Spark's
    struct parser — mirror engines accordingly."""
    col = spec.config["column"]
    ddl = spec.config["schema"]
    required = list(spec.config.get("required", []))
    allow_null = bool(spec.config.get("allow_null", False))
    parsed = F.from_json(
        F.col(col),
        ddl + ", _corrupt string",
        {"columnNameOfCorruptRecord": "_corrupt"},
    )
    ok = parsed["_corrupt"].isNull()
    for f in required:
        ok = ok & parsed[f].isNotNull()
    bad = ~F.coalesce(F.when(F.col(col).isNotNull(), ok), F.lit(allow_null))
    expected = f"{col} json matches ({ddl})"
    if required:
        expected += f" required [{','.join(required)}]"
    return bad, _obs(col), expected


def _predicate_rule(spec: CheckSpec) -> tuple[Column, Column, str]:
    expr = spec.config["expr"]
    observed = spec.config.get("observed_expr")
    bad = ~F.coalesce(F.expr(expr), F.lit(False))
    obs = F.expr(observed).cast("string") if observed else F.lit("predicate=false")
    return bad, obs, expr


def _run_rule(
    df: DataFrame, spec: CheckSpec, rule: Callable[[CheckSpec], tuple[Column, Column, str]]
) -> CheckResult:
    part, cid = spec.partition_col, spec.id
    max_bad = float(spec.config.get("max_bad_frac", 0.0))
    bad, observed, expected = rule(spec)
    violations = as_violations(
        df.where(bad), cid, observed, F.lit(expected), F.col(part)
    )
    per_part = df.groupBy(part).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(bad.cast("int")).alias("n_bad"),
    )
    verdicts = verdict_frame(
        per_part,
        cid,
        part,
        fail_when=F.col("n_bad") > F.col("n_rows") * F.lit(max_bad),
        skip_when=F.col("n_rows") < spec.min_rows,
        metric_cols=["n_rows", "n_bad"],
    )
    return CheckResult(violations=violations, verdicts=verdicts, metrics=per_part)


def run_format(df: DataFrame, spec: CheckSpec) -> CheckResult:
    return _run_rule(df, spec, _format_rule)


def run_accepted_values(df: DataFrame, spec: CheckSpec) -> CheckResult:
    return _run_rule(df, spec, _accepted_rule)


def run_completeness(df: DataFrame, spec: CheckSpec) -> CheckResult:
    return _run_rule(df, spec, _completeness_rule)


def run_row_predicate(df: DataFrame, spec: CheckSpec) -> CheckResult:
    return _run_rule(df, spec, _predicate_rule)


def run_json_schema(df: DataFrame, spec: CheckSpec) -> CheckResult:
    return _run_rule(df, spec, _json_rule)


# The fused suite groups any spec whose fn carries `_rule_builder` into
# one combined two-scan pass (fused_rule_checks below).
run_format._rule_builder = _format_rule  # type: ignore[attr-defined]
run_accepted_values._rule_builder = _accepted_rule  # type: ignore[attr-defined]
run_completeness._rule_builder = _completeness_rule  # type: ignore[attr-defined]
run_row_predicate._rule_builder = _predicate_rule  # type: ignore[attr-defined]
run_json_schema._rule_builder = _json_rule  # type: ignore[attr-defined]


def quarantine_by_rules(
    df: DataFrame, specs: list[CheckSpec]
) -> tuple[DataFrame, DataFrame]:
    """Split the table into (clean, quarantined) by the rule set.

    The validation engine's enforcement mode: instead of reporting
    violations, route rows that fail ANY rule into a quarantine frame
    carrying a ``failed_rules array<string>`` column (the rule names, in
    spec order) and let only clean rows through — the write-audit-publish
    pattern's gate.

    Scale shape: ZERO joins and ZERO shuffles. Every rule is a codegen'd
    boolean computed once into an array column; clean/quarantined are two
    filters of the same narrow map, so both frames together cost one scan
    each (Catalyst prunes to the rule columns + whatever the consumer
    selects). Contrast with quarantining via anti-join against a
    violations sink, which shuffles the full table on the row key.
    """
    built = [(s, *s.fn._rule_builder(s)) for s in specs]  # type: ignore[attr-defined]
    fails = F.filter(
        F.array(
            *[
                F.when(bad, F.lit(s.name)).otherwise(F.lit(None))
                for s, bad, _, _ in built
            ]
        ),
        lambda x: x.isNotNull(),
    )
    tagged = df.withColumn("failed_rules", fails)
    clean = tagged.where(F.size("failed_rules") == 0).drop("failed_rules")
    quarantined = tagged.where(F.size("failed_rules") > 0)
    return clean, quarantined


def combined_rule_verdicts(
    agg: DataFrame, part: str, built: list, bad_prefix: str = "n_bad_"
) -> DataFrame:
    """(partition_key, check_id, verdict, metrics) for EVERY rule from one
    explode over the shared per-partition aggregate (columns: n_rows +
    f'{bad_prefix}{i}').

    Per-rule `agg.select(part, n_rows, bad_i)` branches would be
    column-pruned differently per rule, making each branch's aggregate
    subtree unique — no exchange reuse, one table re-scan PER RULE
    (caught by test_folded_rules_add_no_scans). One explode keeps a
    single aggregate subtree; per-check views filter it — and suite-level
    consumers must union THIS frame once (CheckResult.shared_verdicts),
    not the views, since Spark re-runs even identical aggregates per
    union branch. Verdict semantics identical to base.verdict_frame."""
    from .base import FAIL, PASS, SKIPPED

    structs = []
    for i, (s, _, _, _) in enumerate(built):
        max_bad = float(s.config.get("max_bad_frac", 0.0))
        nb = F.col(f"{bad_prefix}{i}")
        verdict = (
            F.when(F.col("n_rows") < s.min_rows, F.lit(SKIPPED))
            .when(nb > F.col("n_rows") * F.lit(max_bad), F.lit(FAIL))
            .otherwise(F.lit(PASS))
        )
        metrics = F.create_map(
            F.lit("n_rows"), F.col("n_rows").cast("double"),
            F.lit("n_bad"), nb.cast("double"),
        )
        structs.append(
            F.struct(
                F.lit(s.id).alias("check_id"),
                verdict.alias("verdict"),
                metrics.alias("metrics"),
            )
        )
    return agg.select(
        F.col(part).cast("string").alias("partition_key"),
        F.explode(F.array(*structs)).alias("_v"),
    ).select("partition_key", "_v.check_id", "_v.verdict", "_v.metrics")


def fused_rule_checks(
    df: DataFrame, specs: list[CheckSpec]
) -> dict[str, CheckResult]:
    """All rule checks in two scans total (vs 2 per check standalone).

    Violations: one select computes every rule's (bad, observed) into an
    array of structs, `filter` keeps the firing rules, `explode` emits
    one canonical violation row per (row, fired rule) — a single pruned
    scan regardless of rule count. Verdicts: one groupBy(partition) with
    a conditional-sum column per rule; each check's verdict frame is a
    select over that shared aggregate (Catalyst reuses the exchange).

    The per-check CheckResults are envelope-identical to the standalone
    runners (equivalence-tested), so SuiteResult consumers cannot tell
    which path ran.
    """
    if not specs:
        return {}
    built = [(s, *s.fn._rule_builder(s)) for s in specs]  # type: ignore[attr-defined]
    parts = {s.partition_col for s in specs}
    assert len(parts) == 1, "fused rule checks require a shared partition_col"
    part = parts.pop()

    # --- violations: one scan ---
    cs = F.array(
        *[
            F.struct(
                F.lit(s.id).alias("check_id"),
                bad.alias("bad"),
                observed.cast("string").alias("observed"),
                F.lit(expected).alias("expected"),
            )
            for s, bad, observed, expected in built
        ]
    )
    fired = F.filter(cs, lambda c: c["bad"])
    violations_all = (
        df.select(
            "repo",
            "path",
            "commit",
            F.col(part).cast("string").alias("partition_key"),
            F.explode(fired).alias("c"),
        )
        .select(
            "repo",
            "path",
            "commit",
            "partition_key",
            F.col("c.check_id").alias("check_id"),
            F.col("c.observed").alias("observed"),
            F.col("c.expected").alias("expected"),
        )
    )

    # --- verdicts: one aggregate ---
    per_part = df.groupBy(part).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.sum(bad.cast("int")).alias(f"n_bad_{i}")
            for i, (_, bad, _, _) in enumerate(built)
        ],
    )

    combined = combined_rule_verdicts(per_part, part, built)
    results: dict[str, CheckResult] = {}
    for i, (s, _, _, _) in enumerate(built):
        # All violations ride the first check's result (the suite unions
        # per-check violation frames, so attaching the combined frame once
        # keeps it a single scan; filtering it per check would re-plan the
        # scan per rule). Verdicts are per-check filtered views of ONE
        # explode over the shared aggregate — see combined_rule_verdicts.
        results[s.name] = CheckResult(
            violations=violations_all if i == 0 else empty_violations(df),
            verdicts=combined.where(F.col("check_id") == s.id),
            shared_verdicts=combined,
        )
    return results
