"""Write-audit-publish gate (plans/wap.py): row routing to quarantine,
table-level FAIL blocking the publish, publish-last ordering."""

import pytest

from anomaly_detector_spark.checks.base import CheckSpec
from anomaly_detector_spark.checks.rowrules import run_completeness
from anomaly_detector_spark.checks.stats import run_stats
from anomaly_detector_spark.checks.drift import run_drift
from anomaly_detector_spark.plans.wap import audit_publish
from anomaly_detector_spark.synth import DRIFT_LANG, synth_files


def _stats(max_null_rate=0.02):
    return CheckSpec("stats", run_stats, {"max_null_rate": max_null_rate}, "lang", 25)


def _complete():
    return CheckSpec("complete_content", run_completeness, {"column": "content"}, "lang", 25)


def test_publish_with_row_quarantine(spark, tmp_path):
    df = synth_files(spark, 20000)
    n_null = df.filter("content IS NULL").count()
    assert n_null > 0  # synth plants ~0.5% NULL content
    res = audit_publish(
        df,
        dest=str(tmp_path / "prod"),
        suite=[_stats(), _complete()],
        quarantine_dir=str(tmp_path / "quar"),
    )
    assert res.published is True and not res.blocking
    assert res.n_quarantined == n_null
    quar = spark.read.parquet(str(tmp_path / "quar"))
    assert quar.count() == n_null
    assert quar.select("failed_rules").distinct().collect()[0][0] == ["complete_content"]
    prod = spark.read.parquet(str(tmp_path / "prod"))
    assert prod.count() == 20000 - n_null
    assert prod.filter("content IS NULL").count() == 0  # audit removed them


def test_table_fail_blocks_publish(spark, tmp_path):
    df = synth_files(spark, 20000)
    drift = CheckSpec("drift", run_drift, {"column": "content"}, "lang", 25)
    res = audit_publish(
        df,
        dest=str(tmp_path / "prod"),
        suite=[_stats(), drift, _complete()],
        quarantine_dir=str(tmp_path / "quar"),
        violations_sink=str(tmp_path / "viol"),
    )
    assert res.published is False and res.n_published == 0
    assert any(pk == DRIFT_LANG for pk, _ in res.blocking)
    # publish is the LAST side effect: nothing at dest after a block,
    # but the audit evidence (quarantine) is on disk
    with pytest.raises(Exception):
        spark.read.parquet(str(tmp_path / "prod")).count()
    assert spark.read.parquet(str(tmp_path / "quar")).count() > 0


def test_no_rules_table_gate_only(spark, tmp_path):
    df = synth_files(spark, 5000).filter("content IS NOT NULL")
    res = audit_publish(df, dest=str(tmp_path / "prod"), suite=[_stats()])
    assert res.published is True and res.n_quarantined == 0
    assert spark.read.parquet(str(tmp_path / "prod")).count() == df.count()


def test_landed_json_to_published_parquet_end_to_end(spark, tmp_path):
    # the full landing story in one pass: jsonl drop file -> declared-
    # schema PERMISSIVE parse -> malformed lines to the corrupt sink ->
    # row rules route incomplete rows to quarantine -> table suite audits
    # the clean remainder -> publish to parquet LAST. Three disjoint
    # destinations exactly partition the input; the published table is
    # the only one downstream ever reads.
    import json

    from anomaly_detector_spark.sources.registry import read_input, split_corrupt

    p = tmp_path / "landed.jsonl"
    good = [
        {"repo": f"r{i % 5}", "path": f"f{i}.py", "commit": f"c{i}",
         "lang": "python", "content": f"def f{i}(): pass"}
        for i in range(400)
    ]
    incomplete = [
        {"repo": "rX", "path": f"g{i}.py", "commit": f"x{i}",
         "lang": "python", "content": None}
        for i in range(7)
    ]
    lines = (
        [json.dumps(g) for g in good]
        + [json.dumps(b) for b in incomplete]
        + ["<<< not json >>>", "{half"]
    )
    p.write_text("\n".join(lines) + "\n")

    parsed = read_input(spark, str(p), "json")
    clean_parse, corrupt = split_corrupt(parsed)
    corrupt.write.parquet(str(tmp_path / "corrupt"))

    res = audit_publish(
        clean_parse,
        dest=str(tmp_path / "prod"),
        suite=[_stats(max_null_rate=0.5), _complete()],
        quarantine_dir=str(tmp_path / "quar"),
    )
    assert res.published is True
    assert res.n_quarantined == 7
    assert spark.read.parquet(str(tmp_path / "corrupt")).count() == 2
    prod = spark.read.parquet(str(tmp_path / "prod"))
    assert prod.count() == 400
    # exact partition of the input: published + quarantined + corrupt
    n_quar = spark.read.parquet(str(tmp_path / "quar")).count()
    assert prod.count() + n_quar + 2 == len(lines)
    # published rows survived the round-trip byte-identically
    got = sorted(
        (r["repo"], r["path"], r["commit"], r["lang"], r["content"])
        for r in prod.collect()
    )
    want = sorted((g["repo"], g["path"], g["commit"], g["lang"], g["content"]) for g in good)
    assert got == want
