"""Source-format tests: Kafka envelope decode (static twin of the
stream), guarded Iceberg round-trip, CLI format dispatch."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from anomaly_detector_spark.sources.registry import (
    FILES_SCHEMA,
    files_view,
    kafka_files_stream,
    parse_kafka_envelope,
)

SF = "/root/testdata/sf0.001"


def test_parse_kafka_envelope_roundtrip(spark):
    # simulate a Kafka micro-batch: value = JSON file rows as binary
    files = files_view(spark, SF).drop("doc_id").limit(50)
    as_kafka = files.select(
        F.to_json(F.struct("repo", "path", "commit", "lang", "content")).cast("binary").alias("value")
    )
    decoded = parse_kafka_envelope(as_kafka)
    assert decoded.columns == ["repo", "path", "commit", "lang", "content"]
    assert sorted(map(tuple, decoded.collect())) == sorted(map(tuple, files.collect()))


def test_parse_kafka_envelope_bad_rows_null_out(spark):
    rows = [(json.dumps({"repo": "r", "path": "p", "commit": "c", "lang": "en", "content": "x"}).encode(),),
            (b"not json at all",)]
    df = spark.createDataFrame(rows, "value binary")
    out = parse_kafka_envelope(df).collect()
    assert len(out) == 2
    assert out[0]["repo"] == "r"
    assert out[1]["repo"] is None  # malformed message -> NULL row, no crash


def test_kafka_files_stream_requires_connector(spark):
    # without the kafka connector jar the source must fail LOUDLY at
    # plan-build time (not silently return nothing); with the jar (real
    # cluster) this constructs the streaming plan — both paths covered.
    try:
        df = kafka_files_stream(spark, "localhost:9092", "files")
    except Exception as ex:
        assert "kafka" in str(ex).lower()
    else:
        assert df.isStreaming and df.columns == ["repo", "path", "commit", "lang", "content"]


def test_iceberg_manifest_roundtrip(spark, tmp_path):
    # Exercises --format iceberg + the manifest writeTo claim when an
    # Iceberg catalog is on the classpath; skips cleanly in jars-less
    # sandboxes. (cli.py:59, plans/manifest.py storage-layout docstring.)
    try:
        spark.conf.set("spark.sql.catalog.it", "org.apache.iceberg.spark.SparkCatalog")
        spark.conf.set("spark.sql.catalog.it.type", "hadoop")
        spark.conf.set("spark.sql.catalog.it.warehouse", str(tmp_path / "wh"))
        files = files_view(spark, SF).drop("doc_id").limit(100)
        files.writeTo("it.db.files").create()
    except Exception as ex:
        pytest.skip(f"iceberg runtime not on classpath: {str(ex)[:120]}")
    back = spark.read.format("iceberg").load("it.db.files")
    assert back.count() == 100
    from anomaly_detector_spark.plans.manifest import run_with_manifest

    run = run_with_manifest(back, str(tmp_path / "manifest"))
    assert run.pending_partitions > 0


def test_bucketed_table_skips_uniqueness_exchange(spark, tmp_path):
    # a table bucketed by the uniqueness key satisfies the clustering
    # requirement of the (key, lang) counts aggregate — the suite's only
    # wide shuffle disappears from the plan
    from anomaly_detector_spark.sources.registry import write_bucketed

    files = files_view(spark, SF).drop("doc_id")
    write_bucketed(files, "files_bucketed", buckets=8, path=str(tmp_path / "bkt"))
    try:
        b = spark.table("files_bucketed")
        agg = b.groupBy("repo", "path", "commit", "lang").count()
        agg.count()
        plan = agg._sc._jvm.PythonSQLUtils.explainString(agg._jdf.queryExecution(), "formatted")
        assert "Exchange" not in plan, plan
        # and the unbucketed equivalent DOES shuffle (control)
        agg2 = files.groupBy("repo", "path", "commit", "lang").count()
        agg2.count()
        plan2 = agg2._sc._jvm.PythonSQLUtils.explainString(agg2._jdf.queryExecution(), "formatted")
        assert "Exchange" in plan2
        # same results either way
        assert agg.count() == agg2.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS files_bucketed")
