"""Line-level boilerplate: frequency, per-doc share, strip enforcement
(operators/lines.py + checks/codehygiene.py run_boilerplate)."""

from pyspark.sql import functions as F

from anomaly_detector_spark.checks.base import CheckSpec
from anomaly_detector_spark.checks.codehygiene import run_boilerplate
from anomaly_detector_spark.operators.lines import (
    boilerplate_share,
    doc_lines,
    line_frequency,
    strip_boilerplate,
)

FILES_COLS = "repo string, path string, commit string, lang string, content string"

HEADER = "Copyright 2026 Example Corp - all rights reserved"
LICENSE = "Licensed under the Apache License Version 2.0"


def mkfiles(spark, rows):
    return spark.createDataFrame(rows, FILES_COLS)


def _corpus(spark):
    rows = []
    # 6 docs carrying the header + license + one unique long line each
    for i in range(6):
        rows.append(
            ("r", f"a{i}.py", f"c{i}", "python",
             f"{HEADER}\n{LICENSE}\nunique payload line number {i:04d}")
        )
    # one clean doc: three unique long lines
    rows.append(("r", "clean.py", "c9", "python",
                 "alpha unique line one\nbeta unique line two\ngamma unique line three"))
    # short-line doc: trivial lines are ineligible
    rows.append(("r", "short.go", "c10", "go", "}\n{\nx=1"))
    # NULL content
    rows.append(("r", "null.go", "c11", "go", None))
    return mkfiles(spark, rows)


def test_doc_lines_eligibility_and_trim(spark):
    df = mkfiles(spark, [("r", "p", "c", "x", "  padded eligible line here  \nshort\n\n")])
    got = doc_lines(df).collect()
    assert len(got) == 1
    assert got[0]["line"] == "padded eligible line here"
    assert got[0]["pos"] == 0


def test_line_frequency_counts_distinct_docs(spark):
    df = mkfiles(spark, [
        ("r", "p1", "c", "x", f"{HEADER}\n{HEADER}"),   # same doc twice: 1
        ("r", "p2", "c", "x", HEADER),
    ])
    lines = doc_lines(df)
    freq = line_frequency(lines).collect()
    assert len(freq) == 1 and freq[0]["n_docs"] == 2


def test_boilerplate_share_and_check(spark):
    df = _corpus(spark)
    shares = {
        r["path"]: r
        for r in boilerplate_share(df, min_docs=5, extra_cols=["lang"]).collect()
    }
    # header+license appear in 6 docs (>=5): 2 of each boiler doc's 3 lines
    for i in range(6):
        r = shares[f"a{i}.py"]
        assert r["n_lines"] == 3 and r["n_boiler"] == 2
        assert abs(r["boiler_share"] - 0.666667) < 1e-6
    assert shares["clean.py"]["n_boiler"] == 0
    assert "short.go" not in shares and "null.go" not in shares  # no eligible lines

    spec = CheckSpec(
        "boilerplate", run_boilerplate,
        {"min_docs": 5, "max_boiler_share": 0.3, "doc_share_thresh": 0.6}, "lang", 1,
    )
    res = run_boilerplate(df, spec)
    verd = {r["partition_key"]: r["verdict"] for r in res.verdicts.collect()}
    # python: 12 boiler / 21 eligible lines = 0.571 > 0.3 -> FAIL
    # go: no eligible lines -> zero mass -> PASS (n_rows >= min_rows)
    assert verd == {"python": "FAIL", "go": "PASS"}
    v = sorted(r["path"] for r in res.violations.collect())
    assert v == [f"a{i}.py" for i in range(6)]  # clean.py below doc threshold


def test_strip_boilerplate_roundtrip_and_removal(spark):
    df = _corpus(spark)
    out = {r["path"]: r for r in strip_boilerplate(df, min_docs=5).collect()}
    # row-count parity incl. NULL passthrough
    assert len(out) == df.count()
    for i in range(6):
        assert out[f"a{i}.py"]["content"] == f"unique payload line number {i:04d}"
    # clean docs round-trip byte-exact (incl. short/ineligible lines)
    assert out["clean.py"]["content"] == (
        "alpha unique line one\nbeta unique line two\ngamma unique line three"
    )
    assert out["short.go"]["content"] == "}\n{\nx=1"
    assert out["null.go"]["content"] is None
    # other columns survive
    assert out["a0.py"]["lang"] == "python"


def test_strip_boilerplate_all_stripped_keeps_row(spark):
    rows = [("r", f"p{i}.py", f"c{i}", "x", HEADER) for i in range(5)]
    df = mkfiles(spark, rows)
    out = strip_boilerplate(df, min_docs=5).collect()
    assert len(out) == 5
    assert all(r["content"] == "" for r in out)


def test_strip_broadcast_off_agrees(spark):
    df = _corpus(spark)
    a = sorted(
        (r["path"], r["content"])
        for r in strip_boilerplate(df, min_docs=5, broadcast_freq=True).collect()
    )
    b = sorted(
        (r["path"], r["content"])
        for r in strip_boilerplate(df, min_docs=5, broadcast_freq=False).collect()
    )
    assert a == b


def test_boilerplate_config_declarable(spark):
    from anomaly_detector_spark.plans.config import suite_from_config

    specs = suite_from_config(
        {"checks": [{"check": "boilerplate", "min_docs": 5, "partition_col": "lang",
                     "min_rows": 1}]}
    )
    res = specs[0].run(_corpus(spark))
    assert {r["verdict"] for r in res.verdicts.collect()} == {"FAIL", "PASS"}


def test_strip_boilerplate_idempotent(spark):
    """Stripping is a fixed point: every line with corpus frequency >=
    min_docs is removed everywhere in pass one, and removal never raises
    another line's document count — a second pass changes nothing."""
    from anomaly_detector_spark.operators.lines import strip_boilerplate

    df = _corpus(spark)
    once = strip_boilerplate(df, min_docs=5)
    twice = strip_boilerplate(once, min_docs=5)
    a = sorted((r["path"], r["content"]) for r in once.collect())
    b = sorted((r["path"], r["content"]) for r in twice.collect())
    assert a == b


def test_incremental_boilerplate_store(spark, tmp_path):
    """Batch == incremental: scoring run 2's docs against the persisted
    run-1 line frequencies equals scoring them inside one combined
    corpus; compaction preserves the reader answer."""
    from anomaly_detector_spark.operators.lines import (
        append_line_frequency,
        boilerplate_share,
        load_line_frequency,
    )
    from anomaly_detector_spark.plans.stores import compact_store

    store = str(tmp_path / "linefreq")
    run1 = mkfiles(
        spark,
        [("r", f"a{i}.py", f"c{i}", "py", f"{HEADER}\nunique r1 line {i:03d}")
         for i in range(4)],
    )
    run2 = mkfiles(
        spark,
        [("r", f"b{i}.py", f"x{i}", "py", f"{HEADER}\nunique r2 line {i:03d}")
         for i in range(2)],
    )
    append_line_frequency(run1, store, "r1")

    hist = load_line_frequency(spark, store)
    inc = {
        r["path"]: r
        for r in boilerplate_share(run2, min_docs=5, history=hist).collect()
    }
    batch = {
        r["path"]: r
        for r in boilerplate_share(run1.unionByName(run2), min_docs=5).collect()
        if r["path"].startswith("b")
    }
    assert set(inc) == set(batch) == {"b0.py", "b1.py"}
    for p in inc:
        assert inc[p]["n_boiler"] == batch[p]["n_boiler"] == 1  # header: 6 docs total
        assert inc[p]["boiler_share"] == batch[p]["boiler_share"]
    # without history the header is only in 2 in-batch docs: not boiler
    alone = boilerplate_share(run2, min_docs=5).collect()
    assert all(r["n_boiler"] == 0 for r in alone)

    # compaction: summed one-row-per-line store, answers preserved
    append_line_frequency(run2, store, "r2")
    before = {r["line_hash"]: r["n_docs"] for r in load_line_frequency(spark, store).collect()}
    n = compact_store(spark, store, "linefreq")
    after = {r["line_hash"]: r["n_docs"] for r in load_line_frequency(spark, store).collect()}
    assert before == after and n == len(after)


def test_boilerplate_check_with_history_store(spark, tmp_path):
    from anomaly_detector_spark.operators.lines import append_line_frequency

    store = str(tmp_path / "lf")
    run1 = mkfiles(
        spark,
        [("r", f"a{i}.py", f"c{i}", "py", f"{HEADER}\nunique r1 line {i:03d}")
         for i in range(5)],
    )
    run2 = mkfiles(
        spark, [("r", "b.py", "x", "py", f"{HEADER}\nbrand new unique line")]
    )
    cfg = {"min_docs": 5, "max_boiler_share": 0.3, "doc_share_thresh": 0.5,
           "min_doc_lines": 2, "history_dir": store}
    spec = CheckSpec("boilerplate", run_boilerplate, cfg, "lang", 1)
    # first run: store missing -> in-batch only, header not yet frequent
    # for run2 alone
    res0 = run_boilerplate(run2, spec)
    assert [r["verdict"] for r in res0.verdicts.collect()] == ["PASS"]
    append_line_frequency(run1, store, "r1")
    res1 = run_boilerplate(run2, spec)
    assert [r["verdict"] for r in res1.verdicts.collect()] == ["FAIL"]
    assert [r["path"] for r in res1.violations.collect()] == ["b.py"]
    # store path rides the check id
    other = CheckSpec("boilerplate", run_boilerplate, {**cfg, "history_dir": store + "2"}, "lang", 1)
    assert other.id != spec.id
