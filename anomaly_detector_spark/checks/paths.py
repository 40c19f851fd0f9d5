"""Path-integrity checks: structural path rules, case-insensitive path
collisions, and lang-vs-extension consistency over the files table.

The reference validates its input identity (device/service ids matched
against configured filters, /root/reference/util/__init__.py:61-95); the
reframed engine's row identity is the PATH inside (repo, commit) — and
real-world code corpora carry malformed identities that silently corrupt
downstream training pipelines: traversal segments from tar extraction
bugs, Windows backslashes, case-variant duplicates that collide on
case-insensitive filesystems, and files whose declared ``lang`` column
disagrees with their extension (mis-tagged ingestion).

Three checks:

* ``path_format``      — ROWRULE (checks/rowrules.py protocol): a single
                         codegen'd expression classifies each path
                         against structural rules (traversal, absolute,
                         backslash, double slash, control chars,
                         edge whitespace, overlong). Folds into the
                         fused suite's shared scans — zero extra passes.
* ``lang_ext``         — ROWRULE: the extension→lang expectation is
                         compiled from the config map into a chained
                         CASE expression (NO join, NO dim table scan —
                         the map is config, so it belongs in the plan as
                         literals, same as the LSH hyperplanes).
* ``case_collisions``  — group check: within a scope (default
                         (repo, commit)), paths equal under ``lower()``
                         but not byte-equal are collision variants; all
                         rows except the min-path survivor are
                         violations. One window partitioning on the
                         high-cardinality (scope, lower(path)) composite
                         — same skew-safe single-exchange shape as
                         checks/uniqueness.py; ``content`` never rides
                         the shuffle (slim projection first).

* ``sensitive_path`` — ROWRULE: paths whose FILENAME is a well-known
                         credential carrier (.env, id_rsa, *.pem/p12,
                         credentials.json, .netrc, shell history,
                         cloud-CLI config) — the identity-level
                         complement of the content secret scan.

Violation hygiene matches codehygiene.py: ``observed`` carries rule
KINDS and counts, never raw content.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .base import CheckResult, CheckSpec, as_violations, verdict_frame
from .rowrules import _run_rule

# (kind, Java-regex) — each pattern must stay RE2-compatible so the
# DuckDB oracle can mirror it verbatim (no lookaheads, no \u escapes).
PATH_RULE_PATTERNS: list[tuple[str, str]] = [
    ("traversal", r"(^|/)\.\.(/|$)"),       # a `..` path segment
    ("absolute", r"^/"),                     # rooted path
    ("backslash", r"\\"),                    # Windows separator
    ("double_slash", r"//"),                 # empty segment
    ("control", r"[\x00-\x1f\x7f]"),         # control chars (incl. \t, \n)
    ("edge_space", r"(^|/) | (/|$)"),        # segment leading/trailing space
]

# Extensions mapped to the lang the files table is expected to declare.
# Identity for the test-corpus langs; real deployments override via
# config (e.g. {"py": "python", "rs": "rust"}).
DEFAULT_EXT_LANGS: dict[str, str] = {
    x: x for x in ("de", "en", "es", "fr", "ja", "zh")
}

_EXT_RX = r"\.([A-Za-z0-9_]+)$"


def path_rule_kinds(
    col: str = "path",
    patterns: list[tuple[str, str]] | None = None,
    max_len: int = 1024,
    max_segment: int = 255,
) -> Column:
    """Comma-joined names of every structural rule the path violates
    (empty string when clean). One codegen'd expression — no UDF."""
    pats = patterns if patterns is not None else PATH_RULE_PATTERNS
    c = F.coalesce(F.col(col), F.lit(""))
    kinds = [F.when(c.rlike(rx), F.lit(kind)) for kind, rx in pats]
    kinds.append(F.when(F.length(c) > max_len, F.lit("too_long")))
    kinds.append(
        F.when(
            F.array_max(F.transform(F.split(c, "/"), lambda s: F.length(s))) > max_segment,
            F.lit("long_segment"),
        )
    )
    # NULL path is its own kind: the identity column must exist.
    kinds.insert(0, F.when(F.col(col).isNull(), F.lit("null_path")))
    return F.array_join(F.filter(F.array(*kinds), lambda x: x.isNotNull()), ",")


def _path_format_rule(spec: CheckSpec) -> tuple[Column, Column, str]:
    col = spec.config.get("column", "path")
    pats = spec.config.get("patterns", PATH_RULE_PATTERNS)
    max_len = int(spec.config.get("max_len", 1024))
    max_segment = int(spec.config.get("max_segment", 255))
    kinds = path_rule_kinds(col, pats, max_len, max_segment)
    bad = kinds != ""
    observed = F.concat(F.lit("path rules: "), kinds)
    return bad, observed, f"{col} is a clean relative path"


def expected_lang_expr(
    col: str = "path", ext_langs: dict[str, str] | None = None
) -> Column:
    """The lang the path's extension implies, NULL when the extension is
    unmapped/absent. Compiled to a chained CASE over config literals —
    a broadcast-join against a 20-row dim would cost a build side and
    block whole-stage codegen for nothing."""
    mapping = ext_langs if ext_langs is not None else DEFAULT_EXT_LANGS
    ext = F.lower(F.regexp_extract(F.coalesce(F.col(col), F.lit("")), _EXT_RX, 1))
    expr: Column = F.lit(None).cast("string")
    for k in sorted(mapping, reverse=True):  # deterministic chain order
        expr = F.when(ext == k.lower(), F.lit(mapping[k])).otherwise(expr)
    return expr


def _lang_ext_rule(spec: CheckSpec) -> tuple[Column, Column, str]:
    path_col = spec.config.get("column", "path")
    lang_col = spec.config.get("lang_col", "lang")
    mapping = dict(spec.config.get("ext_langs", DEFAULT_EXT_LANGS))
    expected = expected_lang_expr(path_col, mapping)
    # Unmapped/missing extension → no expectation → clean. A NULL lang
    # under a mapped extension IS a mismatch (eqNullSafe: NULL != value).
    bad = expected.isNotNull() & ~F.col(lang_col).eqNullSafe(expected)
    observed = F.concat(
        F.lit("lang="), F.coalesce(F.col(lang_col), F.lit("NULL")),
        F.lit(" expected="), expected,
    )
    return bad, observed, f"{lang_col} matches {path_col} extension"


# (kind, Java/RE2-compatible regex) — paths whose NAME is the secret
# signal: credential material travels under well-known filenames that
# content scanning (codescan.py SECRET_PATTERNS) cannot see when the
# payload is encrypted, binary, or merely SHAPED unlike any known token
# (an id_rsa file is a leak by identity, whatever its bytes). The same
# high-precision-prefix policy as SECRET_PATTERNS: well-known names
# only, no heuristics — `secret.py` or `tokens.rs` never fire.
SENSITIVE_PATH_PATTERNS: list[tuple[str, str]] = [
    ("dotenv", r"(^|/)\.env(\.[A-Za-z0-9._-]+)?$"),
    ("ssh_key", r"(^|/)id_(rsa|dsa|ecdsa|ed25519)$"),
    ("key_material", r"(?i)\.(pem|p12|pfx|jks|keystore)$"),
    (
        "cred_store",
        r"(?i)(^|/)(credentials(\.json)?|service[_-]?accounts?\.json"
        r"|secrets?\.(json|ya?ml|properties))$",
    ),
    ("auth_rc", r"(^|/)\.(netrc|npmrc|pypirc|git-credentials)$"),
    ("shell_history", r"(^|/)\.(bash|zsh|mysql|psql)_history$"),
    ("cloud_config", r"(^|/)\.(aws|azure|kube)/(credentials|config)$"),
]


def sensitive_path_kinds(
    col: str = "path", patterns: list[tuple[str, str]] | None = None
) -> Column:
    """Comma-joined names of the sensitive-filename kinds the path
    matches (empty when clean) — the path_rule_kinds / secret_kinds
    classifier shape: one codegen'd expression, map-only. NULL path is
    clean here (path_format owns null_path)."""
    pats = patterns if patterns is not None else SENSITIVE_PATH_PATTERNS
    c = F.coalesce(F.col(col), F.lit(""))
    return F.array_join(
        F.filter(
            F.array(*[F.when(c.rlike(rx), F.lit(kind)) for kind, rx in pats]),
            lambda x: x.isNotNull(),
        ),
        ",",
    )


def _sensitive_path_rule(spec: CheckSpec) -> tuple[Column, Column, str]:
    col = spec.config.get("column", "path")
    pats = spec.config.get("patterns", SENSITIVE_PATH_PATTERNS)
    kinds = sensitive_path_kinds(col, pats)
    bad = kinds != ""
    observed = F.concat(F.lit("sensitive path kinds: "), kinds)
    return bad, observed, f"{col} is not a known credential-bearing filename"


def run_sensitive_path(df: DataFrame, spec: CheckSpec) -> CheckResult:
    """Sensitive-filename rowrule: FAIL rows whose PATH is a well-known
    credential carrier (.env, id_rsa, *.pem/p12/jks, credentials.json,
    .netrc/.npmrc, shell history, cloud-CLI config) — the identity-level
    complement of the content secret scan: a leaked keyfile is a leak
    whatever its bytes look like. Violations name KINDS (the observed
    path already rides the violation row's identity columns); fuse-ready
    like every rowrule. config: ``column`` ('path'), ``patterns``
    (SENSITIVE_PATH_PATTERNS override)."""
    return _run_rule(df, spec, _sensitive_path_rule)


run_sensitive_path._rule_builder = _sensitive_path_rule  # type: ignore[attr-defined]


def run_path_format(df: DataFrame, spec: CheckSpec) -> CheckResult:
    return _run_rule(df, spec, _path_format_rule)


def run_lang_ext(df: DataFrame, spec: CheckSpec) -> CheckResult:
    return _run_rule(df, spec, _lang_ext_rule)


# fuse with the shared rowrule passes (plans/fused.py)
run_path_format._rule_builder = _path_format_rule  # type: ignore[attr-defined]
run_lang_ext._rule_builder = _lang_ext_rule  # type: ignore[attr-defined]


def case_collision_rows(
    df: DataFrame,
    scope: list[str] | None = None,
    col: str = "path",
    partition_col: str = "lang",
) -> DataFrame:
    """Rows whose ``col`` collides case-insensitively with a different
    byte-form within ``scope`` — minus one min(col) survivor per group.

    Plan shape: slim projection (identity + partition key only — content
    never rides the exchange), then min/max/survivor over ONE window
    partitioning keyed by (scope, lower(col)). The composite key is high
    cardinality (it contains the path), so the exchange is skew-immune
    the same way uniqueness's (repo,path,commit) key is; a collision
    group's size is the variant count, never a repo's row count.
    Detection is ``min != max`` over the window — two codegen'd aggs,
    no collect_set, no countDistinct."""
    keys = scope if scope is not None else ["repo", "commit"]
    lkey = F.lower(F.col(col)).alias("_lkey")
    w = Window.partitionBy(*[F.col(k) for k in keys], F.col("_lkey"))
    slim = df.select(
        "repo", "path", "commit",
        F.col(partition_col).alias("_part"),
        lkey,
    ).select(
        "*",
        F.min(col).over(w).alias("_min_form"),
        F.max(col).over(w).alias("_max_form"),
    )
    return (
        slim.filter(
            (F.col("_min_form") != F.col("_max_form"))
            & (F.col(col) != F.col("_min_form"))
        )
        .drop("_lkey")
    )


def run_case_collisions(df: DataFrame, spec: CheckSpec) -> CheckResult:
    """FAIL partitions containing case-collision variant rows.

    config: ``scope`` (["repo","commit"]), ``column`` ("path").
    Survivor = the byte-minimal form (UTF8_BINARY min — engine- and
    partitioning-invariant); every other variant row is a violation
    attributed to ITS OWN partition value (carried through the window,
    never re-joined)."""
    part = spec.partition_col
    scope = list(spec.config.get("scope", ["repo", "commit"]))
    col = spec.config.get("column", "path")
    cid = spec.id

    offenders = case_collision_rows(df, scope, col, part)
    violations = as_violations(
        offenders,
        cid,
        observed=F.concat(F.lit("case variant of "), F.col("_min_form")),
        expected=F.lit(f"unique lower({col}) per ({', '.join(scope)})"),
        partition_key=F.col("_part"),
    )
    per_part = df.select(F.col(part).alias("_part")).groupBy(
        F.col("_part").alias(part)
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    coll = offenders.groupBy(F.col("_part").alias(part)).agg(
        F.count(F.lit(1)).alias("n_collisions")
    )
    from .base import null_safe_join

    stats = null_safe_join(per_part, coll, [part], "left").na.fill(
        {"n_collisions": 0}
    )
    verdicts = verdict_frame(
        stats,
        cid,
        part,
        fail_when=F.col("n_collisions") > 0,
        skip_when=F.col("n_rows") < spec.min_rows,
        metric_cols=["n_rows", "n_collisions"],
    )
    return CheckResult(violations=violations, verdicts=verdicts, metrics=stats)


def normalize_paths(df: DataFrame, col: str = "path") -> DataFrame:
    """Enforcement twin of path_format (the redact_secrets pattern):
    rewrite ``col`` into normal form — backslashes to '/', segment edge
    whitespace trimmed, empty and '.' segments dropped (which also
    collapses '//' and strips leading './' and rooted '/').

    Deliberately NOT resolved: '..' segments (resolving can escape the
    repo root — traversal rows are path_format violations to
    quarantine, not to repair) and control characters (removing bytes
    changes identity silently; flag, don't mutate). Pure JVM
    higher-order functions — no UDF, no shuffle, NULL passes through.
    Adds ``path_changed`` so enforcement lineage is visible."""
    segs = F.split(F.translate(F.col(col), "\\", "/"), "/")
    norm = F.array_join(
        F.filter(
            F.transform(segs, lambda s: F.trim(s)),
            lambda s: (s != "") & (s != "."),
        ),
        "/",
    )
    normed = F.when(F.col(col).isNotNull(), norm)
    return df.withColumn("path_changed", ~normed.eqNullSafe(F.col(col))).withColumn(
        col, normed
    )


def path_integrity_rules(
    partition_col: str = "lang",
    min_rows: int = 25,
    ext_langs: dict[str, str] | None = None,
) -> list[CheckSpec]:
    """The path-integrity family as suite-ready CheckSpecs. The two
    rowrules fold into the fused shared passes; case_collisions adds
    its one slim window exchange."""
    mapping = ext_langs if ext_langs is not None else DEFAULT_EXT_LANGS
    return [
        CheckSpec("path_format", run_path_format, {"column": "path"}, partition_col, min_rows),
        CheckSpec(
            "lang_ext", run_lang_ext,
            {"column": "path", "lang_col": "lang", "ext_langs": dict(sorted(mapping.items()))},
            partition_col, min_rows,
        ),
        CheckSpec(
            "case_collisions", run_case_collisions,
            {"column": "path", "scope": ["repo", "commit"]}, partition_col, min_rows,
        ),
        CheckSpec(
            "sensitive_path", run_sensitive_path, {"column": "path"},
            partition_col, min_rows,
        ),
    ]
