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
* ``encoding``    — encoding damage in the text column: NUL bytes
                    (binary mis-landed as text), U+FFFD (a transcoding
                    pass already destroyed bytes), BOM prefix, CR line
                    endings — named kinds from one codegen'd
                    classifier, fuse-ready like the rest.
* ``unicode``     — unicode-security anomalies (Trojan Source /
                    CVE-2021-42574): bidi controls, zero-width chars,
                    interior BOM, tag-block payloads, variation
                    selectors, mixed-script homoglyph runs, raw C0
                    controls (operators/codescan.py UNICODE_PATTERNS);
                    strip_invisible is the enforcement twin for the
                    strippable subset.

Group-level (NOT rowrules): ``vendored`` (cross-repo duplicate
content), ``license_consistency`` (conflicting tags per repo),
``boilerplate`` (corpus-frequent line mass, operators/lines.py), and
``containment`` (partial-copy exposure — fraction of rows embedded in
another document, operators/dedup.py containment_pairs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.codescan import (
    GENERATED_MARKER_RX,
    SECRET_PATTERNS,
    UNICODE_PATTERNS,
    has_high_entropy_token,
    license_expr,
    secret_kinds,
    unicode_kinds,
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
    # NOTE the array form below is the MEASURED winner: a string-op
    # variant (rlike("[^\n]{max_line}") for the long-line test +
    # translate-based newline counting for the average) benchmarked
    # 3.09s vs this form's 2.42s at 2M rows — java.util.regex bounded
    # repetition re-scans from every position, costing more than one
    # split + vectorized array ops (PLANS.md 50).
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


# (kind, Java/RE2-compatible regex) — mis-landed binary and encoding
# damage in a text column: NUL bytes (binary file read as text), U+FFFD
# (a transcoding pass already destroyed bytes), BOM prefix, CR line
# endings (corpus-inconsistent newline discipline).
ENCODING_PATTERNS: list[tuple[str, str]] = [
    ("bom", "^\ufeff"),
    ("nul", "\u0000"),
    ("replacement", "\ufffd"),
    ("cr", "\r"),
]


def encoding_kinds(col: str = "content", patterns: list[tuple[str, str]] | None = None):
    """Comma-joined encoding-damage kinds (empty when clean) — the
    path_rule_kinds / secret_kinds classifier pattern, one codegen'd
    expression."""
    pats = patterns if patterns is not None else ENCODING_PATTERNS
    c = F.coalesce(F.col(col), F.lit(""))
    kinds = [F.when(c.rlike(rx), F.lit(kind)) for kind, rx in pats]
    return F.array_join(F.filter(F.array(*kinds), lambda x: x.isNotNull()), ",")


def _encoding_rule(spec: CheckSpec) -> tuple[Column, Column, str]:
    col = spec.config.get("column", "content")
    pats = spec.config.get("patterns", ENCODING_PATTERNS)
    kinds = encoding_kinds(col, pats)
    bad = kinds != ""
    observed = F.concat(F.lit("encoding kinds: "), kinds)
    return bad, observed, f"{col} is clean utf-8 text (no BOM/NUL/U+FFFD/CR)"


def run_encoding(df: DataFrame, spec: CheckSpec) -> CheckResult:
    return _run_rule(df, spec, _encoding_rule)


run_encoding._rule_builder = _encoding_rule  # type: ignore[attr-defined]


def _unicode_rule(spec: CheckSpec) -> tuple[Column, Column, str]:
    col = spec.config.get("column", "content")
    pats = spec.config.get("patterns", UNICODE_PATTERNS)
    kinds = unicode_kinds(col, pats)
    bad = kinds != ""
    observed = F.concat(F.lit("unicode kinds: "), kinds)
    return bad, observed, (
        f"{col} has no bidi/zero-width/tag/homoglyph/control unicode"
    )


def run_unicode(df: DataFrame, spec: CheckSpec) -> CheckResult:
    """Unicode-security rowrule: FAIL rows whose text carries invisible
    or deceptive unicode (unicode_kinds classifier — Trojan Source bidi
    reordering, zero-width identifier splitters, interior BOM, tag-block
    hidden payloads, variation selectors, mixed-script homoglyphs, raw
    C0 controls). Violations name the KINDS, never the bytes (the
    secrets-sink policy); fuse-ready like every rowrule — the whole
    family folds into the suite's existing violations scan + verdict
    aggregate. config: ``column`` ('content'), ``patterns``
    (UNICODE_PATTERNS override)."""
    return _run_rule(df, spec, _unicode_rule)


run_unicode._rule_builder = _unicode_rule  # type: ignore[attr-defined]


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


def run_vendored(df: DataFrame, spec: CheckSpec) -> CheckResult:
    """Vendored-content check: FAIL partitions where more than
    ``max_vendored_frac`` of rows carry content present in
    >= ``min_repos`` distinct repos (operators/codescan.py
    vendored_content — the cross-repo duplication the key-uniqueness
    check cannot see).

    NOT a rowrule: vendoring is a global property of the content's
    distribution over repos, so it needs ONE aggregation pass keyed by
    the uniform content hash. The base (hash, repo, partition) counted
    aggregate feeds THREE differently-pruned consumers (per-hash repo
    counts, per-(hash, partition) counts, per-partition totals) —
    column pruning makes each branch's aggregate subtree unique, so
    Catalyst does NOT reuse the exchange and an unmaterialized plan
    scans the source three more times (confirmed in the plan: 5 scans).
    Same fix as checks/fd.py: the base aggregate is localCheckpoint-ed
    (O(distinct cells) narrow rows — one materialization beats re-scans
    of a 100-TB table); config {"materialize": False} keeps the pure
    plan for tiny inputs. Joins on the hash are equi-joins of
    pre-aggregated frames; joins on the partition key are null-safe.
    Verdicts + metrics only — row evidence via
    codescan.vendored_examples (hash-threshold sample, no rank window).
    NULL content is excluded from n_rows here (completeness's concern).

    config: ``by`` ('repo'), ``column`` ('content'), ``min_repos`` (2),
    ``max_vendored_frac`` (0.2), ``hash_fn`` ('xxhash64' production |
    'sha256' oracle twin), ``materialize`` (True).
    """
    from ..operators.codescan import content_hash_col
    from .base import null_safe_join, verdict_frame

    part = spec.partition_col
    col = spec.config.get("column", "content")
    by = spec.config.get("by", "repo")
    min_repos = int(spec.config.get("min_repos", 2))
    max_frac = float(spec.config.get("max_vendored_frac", 0.2))
    h = content_hash_col(col, spec.config.get("hash_fn", "xxhash64"))

    g1 = (
        df.filter(F.col(col).isNotNull())
        .groupBy(
            h.alias("_h"), F.col(by).alias("_by"), F.col(part).alias("_part")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if spec.config.get("materialize", True):
        g1 = g1.localCheckpoint()
    per_h = g1.groupBy("_h").agg(F.countDistinct("_by").alias("n_repos"))
    vend = per_h.filter(F.col("n_repos") >= min_repos).select("_h")
    c_hp = g1.groupBy("_h", "_part").agg(F.sum("n").alias("n_hp"))
    vend_part = (
        c_hp.join(vend, on="_h", how="inner")  # _h is never NULL (hash of non-null)
        .groupBy("_part")
        .agg(
            F.sum("n_hp").alias("n_vendored_rows"),
            F.countDistinct("_h").alias("n_vendored_contents"),
        )
    )
    totals = g1.groupBy("_part").agg(F.sum("n").alias("n_rows"))
    per_part = null_safe_join(totals, vend_part, ["_part"], "left").select(
        F.col("_part").alias(part),
        "n_rows",
        F.coalesce("n_vendored_rows", F.lit(0)).alias("n_vendored_rows"),
        F.coalesce("n_vendored_contents", F.lit(0)).alias("n_vendored_contents"),
    )
    verdicts = verdict_frame(
        per_part,
        spec.id,
        part,
        fail_when=F.col("n_vendored_rows") > F.col("n_rows") * F.lit(max_frac),
        skip_when=F.col("n_rows") < spec.min_rows,
        metric_cols=["n_rows", "n_vendored_rows", "n_vendored_contents"],
    )
    from .base import empty_violations

    return CheckResult(violations=empty_violations(df), verdicts=verdicts, metrics=per_part)


def run_containment(df: DataFrame, spec: CheckSpec) -> CheckResult:
    """Partial-copy exposure check: FAIL partitions where more than
    ``max_contained_frac`` of rows are CONTAINED in some other document
    (operators/dedup.py containment_pairs — winnowing-fingerprint
    containment >= ``threshold``). The group-level twin of the
    containment operator, the same way ``vendored`` wraps
    vendored_content: a partition whose files are largely embedded
    copies of other files is concatenation/vendoring fallout that key
    uniqueness, whole-doc dedup, and line boilerplate all miss.

    Row identity is hashed to a uniform 64-bit id (xxhash64 of the
    id_cols) so the pair join never keys on strings; the CONTAINED side
    of a pair is the smaller fingerprint set (ties: both sides — mutual
    full near-dups are each contained in the other). Costs the operator
    itself (posting-capped inverted-index join — never all-pairs) plus
    two O(partitions) aggregates; content rides only the narrow
    fingerprint map, never a shuffle. Verdicts + metrics only — pair
    evidence via the operator.

    config: ``column`` ('content'), ``id_cols`` (('repo','path',
    'commit')), ``shingle_k`` (3), ``window`` (4), ``threshold`` (0.8),
    ``max_posting`` (5000), ``max_contained_frac`` (0.2).
    """
    from ..operators.dedup import containment_pairs
    from .base import empty_violations, null_safe_join, verdict_frame

    part = spec.partition_col
    c = spec.config
    col = c.get("column", "content")
    ids = list(c.get("id_cols", ("repo", "path", "commit")))
    slim = df.filter(F.col(col).isNotNull()).select(
        F.xxhash64(*ids).alias("_id"),
        F.col(part).alias("_part"),
        F.col(col),
    )
    pairs = containment_pairs(
        slim,
        col=col,
        id_col="_id",
        shingle_k=int(c.get("shingle_k", 3)),
        window=int(c.get("window", 4)),
        threshold=float(c.get("threshold", 0.8)),
        max_posting=int(c.get("max_posting", 5_000)),
        materialize=bool(c.get("materialize", True)),
    )
    contained = (
        pairs.filter(F.col("n_a") <= F.col("n_b")).select(F.col("id_a").alias("_id"))
        .unionByName(
            pairs.filter(F.col("n_b") <= F.col("n_a")).select(F.col("id_b").alias("_id"))
        )
        .distinct()
    )
    totals = slim.groupBy("_part").agg(F.count(F.lit(1)).alias("n_rows"))
    hit = (
        slim.join(contained, on="_id", how="left_semi")
        .groupBy("_part")
        .agg(F.count(F.lit(1)).alias("n_contained"))
    )
    per_part = null_safe_join(totals, hit, ["_part"], "left").select(
        F.col("_part").alias(part),
        "n_rows",
        F.coalesce("n_contained", F.lit(0)).alias("n_contained"),
    )
    verdicts = verdict_frame(
        per_part,
        spec.id,
        part,
        fail_when=F.col("n_contained")
        > F.col("n_rows") * F.lit(float(c.get("max_contained_frac", 0.2))),
        skip_when=F.col("n_rows") < spec.min_rows,
        metric_cols=["n_rows", "n_contained"],
    )
    return CheckResult(violations=empty_violations(df), verdicts=verdicts, metrics=per_part)


def run_license_consistency(df: DataFrame, spec: CheckSpec) -> CheckResult:
    """License-consistency check: FAIL partitions (typically
    ``partition_col='repo'``) whose files resolve to MORE THAN
    ``max_licenses`` distinct detected licenses (headerless 'none' files
    are tolerated — an untagged file inherits the repo's license; two
    CONFLICTING tags do not).

    A repo mixing GPL and MIT headers is a provenance hazard for a
    training corpus even when each license individually sits in the
    allowed set — the per-file `license` rowrule can't see it, because
    consistency is a property of the GROUP. One partial-aggregated
    shuffle of O(partitions) rows; license derivation happens in the
    map (operators/codescan.py license_expr), content never rides the
    exchange.

    config: ``column`` ('content'), ``head_chars`` (2048),
    ``max_licenses`` (1).
    """
    from .base import empty_violations, verdict_frame

    part = spec.partition_col
    col = spec.config.get("column", "content")
    head_chars = int(spec.config.get("head_chars", 2048))
    max_licenses = int(spec.config.get("max_licenses", 1))
    lic = license_expr(col, head_chars)
    per_part = df.groupBy(F.col(part).alias(part)).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(F.when(lic != "none", lic)).alias("n_licenses"),
        F.sum((lic == "none").cast("long")).alias("n_unlicensed"),
    )
    verdicts = verdict_frame(
        per_part,
        spec.id,
        part,
        fail_when=F.col("n_licenses") > max_licenses,
        skip_when=F.col("n_rows") < spec.min_rows,
        metric_cols=["n_rows", "n_licenses", "n_unlicensed"],
    )
    return CheckResult(violations=empty_violations(df), verdicts=verdicts, metrics=per_part)


def run_boilerplate(df: DataFrame, spec: CheckSpec) -> CheckResult:
    """Line-level boilerplate check: FAIL partitions where more than
    ``max_boiler_share`` of eligible line mass is corpus-frequent
    (operators/lines.py boilerplate_share — the sub-document sibling of
    run_vendored: license headers and generated preambles repeat across
    thousands of NON-duplicate files, invisible to key uniqueness,
    whole-content vendoring, and mostly to MinHash).

    NOT a rowrule: line frequency is a global property of the corpus.
    Scale shape: one explode (map-side), one slim (line_hash, doc_hash)
    partial-aggregated shuffle, one equi-join on the uniform hash, one
    doc aggregate, one partition aggregate. Partition verdicts weight
    by line mass (sum n_boiler / sum n_lines), not by unweighted doc
    shares — a 10-line doc must not count like a 10k-line one.
    Violations = the worst offending DOCS (share >= doc_share_thresh
    AND >= min_doc_lines eligible lines), giving row evidence the
    partition-level verdict alone would not.

    config: ``column`` ('content'), ``min_len`` (16), ``min_docs``
    (5), ``max_boiler_share`` (0.3), ``doc_share_thresh`` (0.8),
    ``min_doc_lines`` (3), ``history_dir`` (optional persisted
    line-frequency store path — operators/lines.py
    append_line_frequency; rides the check id like every store path,
    so a different store is a different check. Missing/empty store =
    in-batch frequencies only, the warm-up analog).
    """
    from ..operators.lines import boilerplate_share
    from .base import as_violations, empty_violations, null_safe_join, verdict_frame

    part = spec.partition_col
    col = spec.config.get("column", "content")
    min_len = int(spec.config.get("min_len", 16))
    min_docs = int(spec.config.get("min_docs", 5))
    max_share = float(spec.config.get("max_boiler_share", 0.3))
    doc_thresh = float(spec.config.get("doc_share_thresh", 0.8))
    min_doc_lines = int(spec.config.get("min_doc_lines", 3))

    history = None
    hist_dir = spec.config.get("history_dir")
    if hist_dir:
        from ..operators.lines import load_line_frequency

        try:
            history = load_line_frequency(df.sparkSession, hist_dir)
        except Exception:
            history = None  # no store yet: first run scores in-batch only
    shares = boilerplate_share(
        df, col=col, min_len=min_len, min_docs=min_docs, extra_cols=[part],
        history=history,
    )
    offenders = shares.filter(
        (F.col("boiler_share") >= doc_thresh) & (F.col("n_lines") >= min_doc_lines)
    )
    violations = as_violations(
        offenders,
        spec.id,
        observed=F.concat(
            F.lit("boiler_share="), F.col("boiler_share").cast("string"),
            F.lit(" ("), F.col("n_boiler").cast("string"),
            F.lit("/"), F.col("n_lines").cast("string"), F.lit(" lines)"),
        ),
        expected=F.lit(f"doc boilerplate share < {doc_thresh}"),
        partition_key=F.col(part),
    )
    per_part = shares.groupBy(F.col(part).alias(part)).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_lines").alias("n_lines"),
        F.sum("n_boiler").alias("n_boiler"),
        F.round(F.sum("n_boiler") / F.sum("n_lines"), 6).alias("boiler_share"),
    )
    # partitions whose docs ALL lack eligible lines are absent from
    # shares — restore them as zero-mass rows so min_rows SKIP applies
    totals = df.groupBy(F.col(part).alias(part)).agg(F.count(F.lit(1)).alias("n_rows"))
    stats = null_safe_join(totals, per_part, [part], "left").na.fill(
        {"n_docs": 0, "n_lines": 0, "n_boiler": 0}
    )
    verdicts = verdict_frame(
        stats,
        spec.id,
        part,
        fail_when=F.col("boiler_share") > max_share,
        skip_when=F.col("n_rows") < spec.min_rows,
        metric_cols=["n_rows", "n_docs", "n_lines", "n_boiler", "boiler_share"],
    )
    return CheckResult(violations=violations, verdicts=verdicts, metrics=stats)


def run_fork_exposure(df: DataFrame, spec: CheckSpec) -> CheckResult:
    """Fork-exposure check: FAIL repos participating in a fork/mirror
    pair (operators/codescan.py repo_fork_pairs) at or above
    ``fail_jaccard`` — the suite-gateable form of the --fork-audit CLI
    surface. Declare ``partition_col='repo'`` (like
    license_consistency): the partition IS the repo whose duplication
    exposure is judged; each repo's verdict carries its worst-pair
    jaccard and pair count. Verdicts + metrics only — pair evidence
    via repo_fork_pairs / --fork-audit (dir-level rows have no
    (repo, path, commit) identity to put in the violation envelope).

    config: ``column`` ('content'), ``path_col`` ('path'),
    ``min_shared`` (2), ``min_jaccard`` (0.5) — the candidate floor,
    ``fail_jaccard`` (0.8) — the verdict threshold, ``max_recurrence``
    (64), ``hash_fn`` ('xxhash64' production | 'sha256' oracle twin).
    """
    from ..operators.codescan import repo_fork_pairs
    from .base import empty_violations, null_safe_join, verdict_frame

    part = spec.partition_col
    c = spec.config
    pairs = repo_fork_pairs(
        df,
        col=c.get("column", "content"),
        path_col=c.get("path_col", "path"),
        by=part,
        min_shared=int(c.get("min_shared", 2)),
        min_jaccard=float(c.get("min_jaccard", 0.5)),
        max_recurrence=int(c.get("max_recurrence", 64)),
        hash_fn=c.get("hash_fn", "xxhash64"),
    )
    exposed = (
        pairs.select(F.col("repo_a").alias(part), "jaccard")
        .unionByName(pairs.select(F.col("repo_b").alias(part), "jaccard"))
        .groupBy(part)
        .agg(
            F.count(F.lit(1)).alias("n_fork_pairs"),
            F.max("jaccard").alias("worst_jaccard"),
        )
    )
    totals = df.groupBy(F.col(part).alias(part)).agg(F.count(F.lit(1)).alias("n_rows"))
    stats = null_safe_join(totals, exposed, [part], "left").na.fill(
        {"n_fork_pairs": 0}
    )
    verdicts = verdict_frame(
        stats,
        spec.id,
        part,
        fail_when=F.col("worst_jaccard") >= float(c.get("fail_jaccard", 0.8)),
        skip_when=F.col("n_rows") < spec.min_rows,
        metric_cols=["n_rows", "n_fork_pairs", "worst_jaccard"],
    )
    return CheckResult(violations=empty_violations(df), verdicts=verdicts, metrics=stats)


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
        CheckSpec("encoding", run_encoding, {"column": "content"}, partition_col, min_rows),
        CheckSpec("unicode", run_unicode, {"column": "content"}, partition_col, min_rows),
    ]
