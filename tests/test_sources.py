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
        # Skip ONLY for jar absence: any other failure here is a broken
        # Iceberg code path and must FAIL, not hide behind the skip
        # (r3 verdict task 9). If the runtime jar ever lands in the
        # sandbox, the guard stops matching and the round-trip runs.
        msg = str(ex)
        jar_absent = (
            "ClassNotFoundException" in msg
            or "Cannot find catalog plugin class" in msg
            or "NoClassDefFoundError" in msg
        )
        assert jar_absent, f"iceberg path failed for a non-classpath reason: {msg[:300]}"
        pytest.skip(f"iceberg runtime not on classpath: {msg[:120]}")
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


def test_read_input_format_matrix_verdict_parity(spark, tmp_path):
    # the SAME rows landed as parquet / orc / csv / json must produce
    # IDENTICAL suite verdicts — the input format is a serialization
    # detail, never a semantics change
    from anomaly_detector_spark.plans.suite import default_suite, run_suite
    from anomaly_detector_spark.sources.registry import read_input, split_corrupt
    from anomaly_detector_spark.synth import synth_files

    src = synth_files(spark, 3000, seed=5)
    paths = {}
    for fmt in ("parquet", "orc", "csv", "json"):
        p = str(tmp_path / fmt)
        w = src.write.mode("overwrite")
        if fmt == "csv":
            w = w.option("header", "true")
        getattr(w.format(fmt), "save")(p)
        paths[fmt] = p

    def verdicts(fmt):
        df = read_input(spark, paths[fmt], fmt)
        if fmt in ("csv", "json"):
            df, corrupt = split_corrupt(df)
            assert corrupt.count() == 0  # clean data: nothing quarantined
        res = run_suite(df, default_suite(min_rows=1))
        out = sorted(
            ((r["partition_key"] or "", r["check_id"], r["verdict"])
             for r in res.verdicts.collect()),
        )
        res.unpersist()
        return out

    base = verdicts("parquet")
    assert len(base) > 0
    for fmt in ("orc", "csv", "json"):
        assert verdicts(fmt) == base, fmt


def test_read_input_json_corrupt_lines_quarantined(spark, tmp_path):
    # malformed lines become quarantine rows, never a crash and never
    # silent drops: clean + corrupt partitions the input exactly
    from anomaly_detector_spark.sources.registry import read_input, split_corrupt

    p = tmp_path / "landed.json"
    good = [
        {"repo": "r1", "path": "a.py", "commit": "c1", "lang": "py", "content": "x"},
        {"repo": "r2", "path": "b.py", "commit": "c2", "lang": "go", "content": "y"},
    ]
    lines = [json.dumps(g) for g in good] + ["{truncated", "not json at all"]
    p.write_text("\n".join(lines) + "\n")

    df = read_input(spark, str(p), "json")
    clean, corrupt = split_corrupt(df)
    assert clean.count() == 2 and "_corrupt_record" not in clean.columns
    rows = corrupt.collect()
    bad = sorted(r["_corrupt_record"] for r in rows)
    assert bad == ["not json at all", "{truncated"]
    # quarantine rows name the landed FILE that produced them — the
    # rejection unit at scale
    assert all(r["source_file"].endswith("landed.json") for r in rows)

    # parquet input: split_corrupt is a no-op passthrough
    pq = str(tmp_path / "pq")
    clean.write.parquet(pq)
    same, none = split_corrupt(read_input(spark, pq, "parquet"))
    assert same.count() == 2 and none.count() == 0


def test_read_input_never_infers_schema(spark, tmp_path):
    # a csv column that LOOKS numeric must stay the declared string —
    # the data never votes on its own types
    from anomaly_detector_spark.sources.registry import read_input

    p = tmp_path / "t.csv"
    p.write_text("repo,path,commit,lang,content\n123,456,789,py,42\n")
    df = read_input(spark, str(p), "csv")
    assert dict(df.dtypes)["repo"] == "string"
    row = df.collect()[0]
    assert row["repo"] == "123" and row["content"] == "42"


def test_cli_json_input_with_corrupt_out(spark, tmp_path, capsys):
    # end-to-end: --format json quarantines bad lines to --corrupt-out
    # and the suite still validates the clean rows
    from anomaly_detector_spark.cli import main

    p = tmp_path / "landed.json"
    good = [
        {"repo": f"r{i}", "path": f"f{i}.py", "commit": f"c{i}", "lang": "py",
         "content": f"body {i}"}
        for i in range(30)
    ]
    lines = [json.dumps(g) for g in good] + ["garbage line"]
    p.write_text("\n".join(lines) + "\n")
    corrupt_out = str(tmp_path / "corrupt")

    rc = main(
        [
            "--input", str(p), "--format", "json",
            "--manifest", str(tmp_path / "manifest"),
            "--corrupt-out", corrupt_out,
            "--min-rows", "1", "--run-id", "r1",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_corrupt_rows"] == 1
    stored = spark.read.parquet(corrupt_out).collect()
    assert len(stored) == 1 and stored[0]["run_id"] == "r1"
    assert stored[0]["_corrupt_record"] == "garbage line"
    # clean rows were validated: the manifest holds the py partition
    m = spark.read.parquet(str(tmp_path / "manifest"))
    assert m.filter(F.col("partition_key") == "py").count() > 0


def test_landed_key_profile_names_the_rename(spark):
    # upstream renames content->body mid-stream and adds a new field; the
    # profile shows the declared key's share dropping, the unknown keys
    # rising, and a never-observed declared key at zero — the evolution,
    # named, BEFORE a permissive parse would silently null/drop it
    from anomaly_detector_spark.sources.registry import landed_key_profile

    lines = (
        [json.dumps({"repo": "r", "content": "x"})] * 6
        + [json.dumps({"repo": "r", "body": "x", "extra": 1})] * 4
        + ["not json"]  # malformed: split_corrupt's job, skipped here
    )
    raw = spark.createDataFrame([(l,) for l in lines], "value string")
    prof = {
        r["key"]: (r["n_rows"], round(r["share"], 4), r["status"])
        for r in landed_key_profile(raw, "repo, content, commit").collect()
    }
    assert prof["repo"] == (10, round(10 / 11, 4), "declared")
    assert prof["content"] == (6, round(6 / 11, 4), "declared")
    assert prof["body"] == (4, round(4 / 11, 4), "unknown")
    assert prof["extra"] == (4, round(4 / 11, 4), "unknown")
    assert prof["commit"] == (0, 0.0, "declared")  # declared, never landed
    assert len(prof) == 5


def test_read_input_json_options_passthrough(spark, tmp_path):
    # reader options must reach the json parser (timestampFormat etc.) —
    # they silently vanished before this pin
    from anomaly_detector_spark.sources.registry import read_input, split_corrupt

    p = tmp_path / "t.json"
    p.write_text('{"k": "a", "ts": "2024/01/02 03:04:05"}\n')
    clean, corrupt = split_corrupt(
        read_input(
            spark, str(p), "json",
            schema="k string, ts timestamp",
            options={"timestampFormat": "yyyy/MM/dd HH:mm:ss"},
        )
    )
    rows = clean.collect()
    assert corrupt.count() == 0 and len(rows) == 1
    assert rows[0]["ts"] is not None and rows[0]["ts"].year == 2024


def test_read_input_xml_lines_quarantine(spark, tmp_path):
    # xml-lines landed data: same declared-schema PERMISSIVE contract as
    # csv/json — complete elements parse, truncated/garbage lines
    # quarantine with file lineage, nothing crashes or vanishes
    from anomaly_detector_spark.sources.registry import read_input, split_corrupt

    p = tmp_path / "landed.xml"
    rows = [
        f"<row><repo>r{i}</repo><path>f{i}.py</path><commit>c{i}</commit>"
        f"<lang>py</lang><content>body {i}</content></row>"
        for i in range(4)
    ]
    p.write_text("\n".join(rows + ["<row><repo>r9</repo>", "garbage"]) + "\n")

    clean, corrupt = split_corrupt(read_input(spark, str(p), "xml"))
    got = sorted((r["repo"], r["content"]) for r in clean.collect())
    assert got == [(f"r{i}", f"body {i}") for i in range(4)]
    bad = corrupt.collect()
    assert sorted(r["_corrupt_record"] for r in bad) == ["<row><repo>r9</repo>", "garbage"]
    assert all(r["source_file"].endswith("landed.xml") for r in bad)


def test_files_from_tree_ingests_a_checkout(spark, tmp_path):
    # point the suite at an actual source tree: one row per file, path
    # relative to the root, repo from the first segment, lang from the
    # extension, commit content-addressed (re-ingest of an unchanged
    # tree is manifest-stable; a changed file gets a new commit)
    from anomaly_detector_spark.plans.suite import default_suite, run_suite
    from anomaly_detector_spark.sources.registry import files_from_tree

    root = tmp_path / "checkouts"
    (root / "alpha" / "src").mkdir(parents=True)
    (root / "beta").mkdir()
    (root / "alpha" / "src" / "main.py").write_text("def main(): pass\n")
    (root / "alpha" / "src" / "util.go").write_text("package util\n")
    (root / "beta" / "app.py").write_text("print('hi')\n")

    df = files_from_tree(spark, str(root), lang_map={"py": "python"})
    rows = {r["path"]: r for r in df.collect()}
    assert set(rows) == {"alpha/src/main.py", "alpha/src/util.go", "beta/app.py"}
    assert rows["alpha/src/main.py"]["repo"] == "alpha"
    assert rows["beta/app.py"]["repo"] == "beta"
    assert rows["alpha/src/main.py"]["lang"] == "python"
    assert rows["alpha/src/util.go"]["lang"] == "go"
    assert rows["beta/app.py"]["content"] == "print('hi')\n"
    assert len(rows["beta/app.py"]["commit"]) == 40

    # content-addressed commit: identical re-ingest, identical rows
    again = {r["path"]: r["commit"] for r in files_from_tree(spark, str(root)).collect()}
    assert {p: r["commit"] for p, r in rows.items()} == again
    # ...and an edit changes ONLY that file's commit
    (root / "beta" / "app.py").write_text("print('bye')\n")
    edited = {r["path"]: r["commit"] for r in files_from_tree(spark, str(root)).collect()}
    assert edited["beta/app.py"] != again["beta/app.py"]
    assert edited["alpha/src/main.py"] == again["alpha/src/main.py"]

    # the suite runs on the ingested shape end-to-end
    res = run_suite(df, default_suite(min_rows=1))
    assert res.verdicts.count() > 0
    res.unpersist()


def test_read_input_csv_arity_drift_quarantines(spark, tmp_path):
    # csv schema evolution is arity drift, and PERMISSIVE from_csv marks
    # BOTH too-few and too-many fields as corrupt (raw line kept) — so a
    # widened/narrowed upstream csv surfaces loudly through the standard
    # quarantine path, no separate profiler needed (the json analog needs
    # landed_key_profile because json drops/nulls silently instead)
    from anomaly_detector_spark.sources.registry import read_input, split_corrupt

    p = tmp_path / "t.csv"
    p.write_text(
        "repo,path,commit,lang,content\n"
        "r1,f1,c1,py,body\n"          # exact arity: clean
        "r2,f2,c2,py\n"               # narrowed upstream: quarantined
        "r3,f3,c3,py,body,EXTRA\n"    # widened upstream: quarantined
    )
    clean, corrupt = split_corrupt(read_input(spark, str(p), "csv"))
    assert [r["repo"] for r in clean.collect()] == ["r1"]
    bad = sorted(r["_corrupt_record"] for r in corrupt.collect())
    assert bad == ["r2,f2,c2,py", "r3,f3,c3,py,body,EXTRA"]
