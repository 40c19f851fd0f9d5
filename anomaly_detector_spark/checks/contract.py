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
