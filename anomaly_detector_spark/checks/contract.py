"""Schema-contract check: the table's physical schema vs the declared one.

The reference trusts its config-driven mapping to blow up at access time
when a message lacks a mapped field (/root/reference/util/config.py:46-59
— a KeyError per message, discovered row by row). The engine checks the
contract ONCE, before any data moves: DataFrame schemas are driver-side
metadata, so this check costs zero scans and zero shuffles at any scale —
it is the one check whose price does not change between 500 rows and
10^12.

Per expected column the status is one of:

* ``ok``                   — present, compatible type, nullability ok;
* ``missing``              — absent from the observed schema;
* ``type_mismatch``        — present with a different dataType;
* ``nullability_mismatch`` — observed nullable where the contract
  requires non-null (the reverse — observed stricter — is ok);

plus one ``unexpected`` row per observed column the contract doesn't
declare (flagging accidental wide reads / schema drift on ingest).

``run_schema_contract`` wraps it in the CheckResult envelope (one
verdict row per column, partition_key = the column name) so a schema
gate can ride run_suite next to the data checks — and under revalidate
mode the manifest history shows WHEN a column appeared, vanished, or
changed type.

CAVEAT — manifest-committed suites: this check's verdict partition_keys
are COLUMN NAMES, not data-partition values, so committed_partitions'
per-partition check counting (plans/manifest.py:60-77) would see every
data partition as one check short and never commit it. Run it in
run_suite (no manifest), standalone, or under revalidate=True where the
prune is skipped anyway; don't add it to a resuming manifest suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..schema import FILES_SCHEMA
from .base import CheckResult, CheckSpec, empty_violations

CONTRACT_COLS = "column string, status string, observed string, expected string"


def schema_contract(
    df: DataFrame,
    expected: T.StructType | str = FILES_SCHEMA,
    strict_nullability: bool = False,
) -> list[tuple[str, str, str, str]]:
    """(column, status, observed, expected) rows; pure driver-side.

    ``strict_nullability=False`` (default) ignores nullability: most
    scan relations report every column nullable regardless of the data,
    so the strict form is only meaningful over writer-controlled tables.
    """
    if isinstance(expected, str):
        expected = T.StructType.fromDDL(expected)
    observed = {f.name: f for f in df.schema.fields}
    rows: list[tuple[str, str, str, str]] = []
    for f in expected.fields:
        want = f.dataType.simpleString() + (
            " not null" if strict_nullability and not f.nullable else ""
        )
        got = observed.get(f.name)
        if got is None:
            rows.append((f.name, "missing", "absent", want))
        elif got.dataType != f.dataType:
            rows.append((f.name, "type_mismatch", got.dataType.simpleString(), want))
        elif strict_nullability and got.nullable and not f.nullable:
            rows.append((f.name, "nullability_mismatch", "nullable", want))
        else:
            rows.append((f.name, "ok", got.dataType.simpleString(), want))
    declared = {f.name for f in expected.fields}
    for f in df.schema.fields:
        if f.name not in declared:
            rows.append((f.name, "unexpected", f.dataType.simpleString(), "absent"))
    return rows


def schema_contract_df(
    df: DataFrame,
    expected: T.StructType | str = FILES_SCHEMA,
    strict_nullability: bool = False,
) -> DataFrame:
    return df.sparkSession.createDataFrame(
        schema_contract(df, expected, strict_nullability), CONTRACT_COLS
    )


SNAPSHOT_COLS = (
    "run_id string, committed_at timestamp, ord int, column string, "
    "dtype string, nullable boolean"
)


def append_schema_snapshot(df: DataFrame, schemas_dir: str, run_id: str) -> None:
    """Record the table's physical schema for this run — driver-side
    metadata, zero scans, a handful of rows per run. The store is the
    contract check's HISTORY dual: the contract compares against a
    declared schema, the snapshot store answers "when did this column
    appear / vanish / change type" across runs (schema_changes) and
    lets a suite gate on "changed SINCE LAST RUN" with no declared
    contract at all (run_schema_evolution). Runs order by
    (committed_at, run_id) — the manifest's own convention."""
    import datetime

    spark = df.sparkSession
    now = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
    rows = [
        (run_id, now, i, f.name, f.dataType.simpleString(), bool(f.nullable))
        for i, f in enumerate(df.schema.fields)
    ]
    spark.createDataFrame(rows, SNAPSHOT_COLS).write.mode("append").parquet(schemas_dir)


def schema_changes(
    spark, schemas_dir: str, include_unchanged: bool = False
) -> DataFrame:
    """Run-over-run schema diff from the snapshot store: one row per
    (run, column) whose shape moved vs the PREVIOUS run — status
    added | removed | type_changed (observed/expected carry the two
    dtypes). All frames are O(runs x columns) metadata rows; nothing
    scans data."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    snaps = spark.read.parquet(schemas_dir)
    runs = (
        snaps.select("run_id", "committed_at")
        .distinct()
        .withColumn(
            "rk",
            F.dense_rank().over(
                Window.orderBy("committed_at", "run_id")
            ),
        )
    )
    ranked = snaps.join(F.broadcast(runs), ["run_id", "committed_at"]).select(
        "rk", "column", "dtype"
    )
    n_runs = runs.agg(F.max("rk").alias("_max_rk"))
    cur = ranked.filter(F.col("rk") >= 2).select(
        "rk", "column", F.col("dtype").alias("_cur")
    )
    prev = (
        ranked.withColumn("rk", F.col("rk") + 1)
        .crossJoin(F.broadcast(n_runs))
        .filter(F.col("rk") <= F.col("_max_rk"))
        .select("rk", "column", F.col("dtype").alias("_prev"))
    )
    j = cur.join(prev, ["rk", "column"], "full_outer").withColumn(
        "status",
        F.when(F.col("_prev").isNull(), F.lit("added"))
        .when(F.col("_cur").isNull(), F.lit("removed"))
        .when(F.col("_cur") != F.col("_prev"), F.lit("type_changed"))
        .otherwise(F.lit("unchanged")),
    )
    if not include_unchanged:
        j = j.filter(F.col("status") != "unchanged")
    return (
        j.join(F.broadcast(runs), "rk")
        .select(
            "run_id",
            "column",
            "status",
            F.coalesce("_cur", F.lit("absent")).alias("observed"),
            F.coalesce("_prev", F.lit("absent")).alias("expected"),
        )
    )


def run_schema_evolution(df: DataFrame, spec: CheckSpec) -> CheckResult:
    """Declarable "schema changed since last run" gate: the input's
    physical schema vs the LATEST snapshot in ``config['store']`` — no
    declared contract needed; yesterday's shape is the contract.

    Config: ``store`` (required — a schemas_dir run_with_manifest
    appended to; path rides the check id), ``allow`` — statuses to
    tolerate (e.g. ["added"] for append-only evolution; default none).
    Verdicts: one row per column (partition_key = column name), FAIL on
    added/removed/type_changed unless allowed; ALL columns SKIPPED when
    the store is empty (warm-up — no previous shape to compare). Same
    manifest caveat as run_schema_contract: column-name partition keys
    don't resume-commit."""
    from pyspark.errors import AnalysisException

    spark = df.sparkSession
    allow = set(spec.config.get("allow", []))
    store = spec.config["store"]
    latest: dict[str, str] = {}
    have_store = False
    try:
        snaps = spark.read.parquet(store)
        from pyspark.sql import functions as F

        last = (
            snaps.select("run_id", "committed_at")
            .distinct()
            .orderBy(F.col("committed_at").desc(), F.col("run_id").desc())
            .first()
        )
        if last is not None:
            have_store = True
            latest = {
                r["column"]: r["dtype"]
                for r in snaps.filter(
                    (snaps.run_id == last["run_id"])
                    & (snaps.committed_at == last["committed_at"])
                ).collect()
            }
    except AnalysisException as e:
        # only "no store yet" is a warm-up; a corrupt/unreadable store
        # must surface, not silently SKIP every column forever
        if "PATH_NOT_FOUND" not in str(e):
            raise
    observed = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    rows = []
    for col, dt in observed.items():
        if not have_store:
            rows.append((col, "no_history", dt, "absent"))
        elif col not in latest:
            rows.append((col, "added", dt, "absent"))
        elif latest[col] != dt:
            rows.append((col, "type_changed", dt, latest[col]))
        else:
            rows.append((col, "ok", dt, latest[col]))
    for col, dt in latest.items():
        if col not in observed:
            rows.append((col, "removed", "absent", dt))
    verdicts = spark.createDataFrame(
        [
            (
                col,
                spec.id,
                "SKIPPED"
                if status == "no_history"
                else ("PASS" if status == "ok" or status in allow else "FAIL"),
                {"is_ok": 1.0 if status == "ok" else 0.0},
            )
            for col, status, _obs, _exp in rows
        ],
        "partition_key string, check_id string, verdict string, metrics map<string,double>",
    )
    return CheckResult(
        violations=empty_violations(df),
        verdicts=verdicts,
        metrics=spark.createDataFrame(rows, CONTRACT_COLS),
    )


def run_schema_contract(df: DataFrame, spec: CheckSpec) -> CheckResult:
    """CheckResult envelope: one verdict row per column (partition_key =
    column name), FAIL on any non-ok status. No violations frame — the
    defect is the table's shape, not any row."""
    expected = spec.config.get("schema", FILES_SCHEMA)
    rows = schema_contract(
        df, expected, bool(spec.config.get("strict_nullability", False))
    )
    spark = df.sparkSession
    verdicts = spark.createDataFrame(
        [
            (col, spec.id, "PASS" if status == "ok" else "FAIL", {"is_ok": 1.0 if status == "ok" else 0.0})
            for col, status, _obs, _exp in rows
        ],
        "partition_key string, check_id string, verdict string, metrics map<string,double>",
    )
    return CheckResult(
        violations=empty_violations(df),
        verdicts=verdicts,
        metrics=spark.createDataFrame(rows, CONTRACT_COLS),
    )
