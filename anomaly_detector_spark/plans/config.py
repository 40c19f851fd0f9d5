"""Declarative suite config: JSON document -> list[CheckSpec].

The reference wires its validation graph from deployment config (env
vars + a selector dict, /root/reference/util/config.py:22-33,
/root/reference/main.py:20-53). The Spark-native analog is a
declarative check-suite document — the shape Deequ/Great-Expectations
users expect — so a suite lives next to the data contract in version
control instead of in code:

    {
      "partition_col": "lang",
      "min_rows": 25,
      "checks": [
        {"check": "stats", "column": "content", "approx": true},
        {"check": "uniqueness"},
        {"check": "format", "name": "format_commit",
         "column": "commit", "pattern": "^[0-9a-f]{40}$"}
      ]
    }

Every key other than the reserved four (check, name, partition_col,
min_rows) is the check's config dict, verbatim. Because check ids are
content-addressed (sha256 of the canonical config, checks/base.py), a
config-loaded suite is indistinguishable from the code-built one: same
check ids, same suite_id, same manifest rows — switching a deployment
from code-built suites to config files re-validates NOTHING. That
round-trip (suite_to_config -> suite_from_config -> identical ids) is
pinned in tests/test_config.py.

Scale note: this module is pure driver-side metadata — no Spark jobs,
no scans. The fused runner (plans/fused.py) folds however many rule
checks the document declares into the same shared passes it uses for
code-built suites; declaring 40 rules in JSON still costs one
violations scan + one verdict aggregate.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable

from ..checks.base import CheckSpec

_RESERVED = {"check", "name", "partition_col", "min_rows"}


def _registry() -> dict[str, Callable]:
    # imported lazily so `import anomaly_detector_spark.plans.config`
    # stays cheap and cycle-free
    from ..checks.contract import run_schema_contract, run_schema_evolution
    from ..checks.drift import run_count_drift, run_drift, run_drift_sweep, run_embedding_drift
    from ..checks.freshness import run_coverage, run_freshness
    from ..checks.referential import run_referential
    from ..checks.rowrules import (
        run_accepted_values,
        run_completeness,
        run_format,
        run_json_schema,
        run_row_predicate,
    )
    from ..checks.codehygiene import (
        run_boilerplate,
        run_containment,
        run_encoding,
        run_fork_exposure,
        run_entropy_secrets,
        run_generated,
        run_license,
        run_license_consistency,
        run_secrets,
        run_unicode,
        run_vendored,
    )
    from ..checks.fd import run_fd, run_key_cardinality
    from ..checks.media import run_audio_overlap, run_frame_overlap, run_media_dups
    from ..checks.paths import (
        run_case_collisions,
        run_lang_ext,
        run_path_format,
        run_sensitive_path,
    )
    from ..checks.kmv import run_novelty
    from ..checks.membership import run_seen_before
    from ..checks.metadata import (
        run_layout_health,
        run_metadata_stats,
        run_small_files,
    )
    from ..checks.sequence import run_flatline, run_gaps, run_monotonic
    from ..checks.quantiles import run_quantile_drift
    from ..checks.reconcile import run_reconcile
    from ..checks.robust import run_benford, run_mad_outliers
    from ..checks.stats import run_stats
    from ..checks.uniqueness import run_commit_bloat, run_uniqueness

    return {
        "stats": run_stats,
        # robust (MAD modified-z) outlier exposure — the resistant
        # sibling of quantile_drift's location/scale view
        "mad_outliers": run_mad_outliers,
        # first-significant-digit drift vs Benford's law (chi-square)
        "benford": run_benford,
        # media granule-overlap family (decoded frames / audio windows)
        "frame_overlap": run_frame_overlap,
        "audio_overlap": run_audio_overlap,
        "metadata_stats": run_metadata_stats,
        # layout-health gate: config carries the file inventory PATH and
        # the clustered dims; footer-only, schedules cluster_write
        "layout_health": run_layout_health,
        # inter-file sizing gate (layout_health's count dual): config
        # carries the directory PATH; listing-only, schedules compaction
        "small_files": run_small_files,
        "quantile_drift": run_quantile_drift,
        "uniqueness": run_uniqueness,
        # same (repo, path) content repeated under multiple commits —
        # snapshot bloat; one slim window exchange (uniqueness's shape)
        "commit_bloat": run_commit_bloat,
        # cross-run key membership: config carries the persisted bloom
        # store PATH (part of the check id — different store, different
        # check), never a frame
        "seen_before": run_seen_before,
        # cross-run set-level novelty: config carries the persisted KMV
        # store PATH (same store-in-id rule as seen_before)
        "novelty": run_novelty,
        "referential": run_referential,
        # reconcile's other_df is runtime state injected at run time (the
        # baseline_df/dim_df rule): the config document carries measure/
        # agg/tolerances only, and CheckSpec.id already excludes frames
        "reconcile": run_reconcile,
        "drift": run_drift,
        "count_drift": run_count_drift,
        "embedding_drift": run_embedding_drift,
        # one-scan multi-column PSI sweep (worst column per partition)
        "drift_sweep": run_drift_sweep,
        "freshness": run_freshness,
        # calendar completeness: every expected time slot arrived
        "coverage": run_coverage,
        "fd": run_fd,
        # per-key row-count band (an order has 1-7 lineitems)
        "key_cardinality": run_key_cardinality,
        "monotonic": run_monotonic,
        "gaps": run_gaps,
        "flatline": run_flatline,
        "schema_contract": run_schema_contract,
        # yesterday's shape is the contract: config carries the snapshot
        # store PATH (rides the check id) + allowed statuses
        "schema_evolution": run_schema_evolution,
        "format": run_format,
        "accepted_values": run_accepted_values,
        "completeness": run_completeness,
        "row_predicate": run_row_predicate,
        "json_schema": run_json_schema,
        # code-hygiene rowrules (checks/codehygiene.py): fuse like any
        # other rule; config carries thresholds/allowed sets only
        "secrets": run_secrets,
        "license": run_license,
        "generated": run_generated,
        "entropy_secrets": run_entropy_secrets,
        # encoding-damage rowrule (BOM/NUL/U+FFFD/CR kinds), fuse-ready
        "encoding": run_encoding,
        # unicode-security rowrule (Trojan Source bidi / zero-width /
        # tag-payload / homoglyph / C0 kinds), fuse-ready
        "unicode": run_unicode,
        # vendored-content check: aggregation-only (one scan, reused
        # exchange), verdicts+metrics; evidence via vendored_examples
        "vendored": run_vendored,
        # partial-copy exposure: group twin of containment_pairs
        "containment": run_containment,
        # media perceptual near-dup exposure (declare on a media table:
        # partition_col='kind'); containment's multimodal twin
        "media_dups": run_media_dups,
        # group-level license conflict (declare partition_col='repo')
        "license_consistency": run_license_consistency,
        # line-level boilerplate mass (corpus-frequent lines per doc);
        # aggregation-only — explode + one slim hash shuffle, no rowrule
        "boilerplate": run_boilerplate,
        # fork/mirror exposure per repo (declare partition_col='repo')
        "fork_exposure": run_fork_exposure,
        # path-integrity rowrules (checks/paths.py): structural path
        # rules + extension/lang agreement, both fuse-ready
        "path_format": run_path_format,
        "lang_ext": run_lang_ext,
        # sensitive-filename rowrule (.env / id_rsa / *.pem / .netrc ...)
        "sensitive_path": run_sensitive_path,
        # case-insensitive path collisions within (repo, commit) — one
        # slim window exchange on the high-cardinality composite key
        "case_collisions": run_case_collisions,
    }


def suite_from_config(doc: dict | str | Path) -> list[CheckSpec]:
    """Build a suite from a config dict, a JSON string, or a file path."""
    if isinstance(doc, Path):
        doc = json.loads(doc.read_text())
    elif isinstance(doc, str):
        p = Path(doc)
        doc = json.loads(p.read_text()) if p.suffix == ".json" and p.exists() else json.loads(doc)
    if not isinstance(doc, dict):
        raise TypeError(f"suite config must be a JSON object, got {type(doc).__name__}")

    unknown_top = set(doc) - {"partition_col", "min_rows", "checks"}
    if unknown_top:
        raise ValueError(f"unknown suite-config keys: {sorted(unknown_top)}")
    checks = doc.get("checks")
    if not isinstance(checks, list) or not checks:
        raise ValueError("suite config needs a non-empty 'checks' list")

    registry = _registry()
    default_part = doc.get("partition_col", "lang")
    default_min = doc.get("min_rows", 25)

    specs: list[CheckSpec] = []
    seen: set[str] = set()
    for i, entry in enumerate(checks):
        if not isinstance(entry, dict) or "check" not in entry:
            raise ValueError(f"checks[{i}] must be an object with a 'check' key")
        kind = entry["check"]
        fn = registry.get(kind)
        if fn is None:
            raise ValueError(
                f"checks[{i}]: unknown check type {kind!r}; known: {sorted(registry)}"
            )
        name = entry.get("name", kind)
        if name in seen:
            raise ValueError(f"checks[{i}]: duplicate check name {name!r}")
        seen.add(name)
        cfg = {k: v for k, v in entry.items() if k not in _RESERVED}
        specs.append(
            CheckSpec(
                name,
                fn,
                cfg,
                entry.get("partition_col", default_part),
                entry.get("min_rows", default_min),
            )
        )
    return specs


def suite_to_config(suite: list[CheckSpec]) -> dict:
    """Export a code-built suite as the equivalent config document.

    Raises on non-JSON-serializable config values (an injected
    baseline_df / dim_df is runtime state, not configuration — the same
    rule CheckSpec.id applies when hashing).
    """
    registry = _registry()
    fn_to_kind = {id(fn): kind for kind, fn in registry.items()}
    out: list[dict] = []
    for spec in suite:
        kind = fn_to_kind.get(id(spec.fn))
        if kind is None:
            raise ValueError(
                f"check {spec.name!r}: fn {getattr(spec.fn, '__name__', spec.fn)!r} "
                "is not in the config registry"
            )
        json.dumps(spec.config)  # fail loudly on runtime-state values
        entry: dict[str, Any] = {"check": kind}
        if spec.name != kind:
            entry["name"] = spec.name
        entry.update(spec.config)
        entry["partition_col"] = spec.partition_col
        entry["min_rows"] = spec.min_rows
        out.append(entry)
    return {"checks": out}


# config keys whose values name input COLUMNS, per check kind — the
# basis of the coverage audit below. A key absent here (store paths,
# thresholds, patterns) never names a column.
_COLUMN_KEYS = (
    "column", "columns", "key", "lhs", "rhs", "ts_col", "value_col", "order_col",
    "lang_col", "scope",
)


def suite_column_coverage(suite: list[CheckSpec], df) -> list[dict]:
    """Meta-audit: which of the table's columns does this suite actually
    test? Returns one dict per schema column: {column, checks (sorted
    names), covered}. The classic blind spot a growing suite develops —
    forty rules and two columns nobody ever declared anything on — made
    visible before it matters. Pure driver-side (config + schema), zero
    scans at any table size.

    A check's partition_col counts as covered: partition verdicts gate
    on its values (a bad value lands in a verdict row). Columns named
    in config under the well-known keys (column/key/lhs/rhs/ts_col/...)
    count; store paths and thresholds never do. Checks with no column
    config (schema_contract, metadata_stats) cover nothing here — they
    validate shape, not values."""
    per_col: dict[str, set] = {f.name: set() for f in df.schema.fields}
    for spec in suite:
        named: set[str] = {spec.partition_col}
        for key in _COLUMN_KEYS:
            v = spec.config.get(key)
            if isinstance(v, str):
                named.add(v)
            elif isinstance(v, (list, tuple)):
                named.update(x for x in v if isinstance(x, str))
        for c in named:
            if c in per_col:
                per_col[c].add(spec.name)
    return [
        {"column": c, "checks": sorted(names), "covered": bool(names)}
        for c, names in per_col.items()
    ]
