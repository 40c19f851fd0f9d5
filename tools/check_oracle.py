"""Local mimic of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 and compares it
against oracle_sql() via DuckDB: row count, column-name set, and an
order-insensitive value hash (columns sorted by name, rows sorted).
On hash mismatch, prints a row-level diff sample to debug.
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            df[c] = col.map(lambda v: _cell(v))
        else:
            df[c] = col.map(_cell)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _cell(v):
    import numpy as np

    if v is None or (isinstance(v, float) and pd.isna(v)):
        return "NULL"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if f == int(f) and abs(f) < 1e15:
            return f"{f:.6f}"
        return f"{f:.6f}"
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def value_hash(df: pd.DataFrame) -> str:
    c = canon(df)
    payload = "\x01".join(
        "\x02".join(str(x) for x in row) for row in c.itertuples(index=False, name=None)
    )
    return hashlib.md5(payload.encode()).hexdigest()


def main(only: list[str] | None = None) -> int:
    import __spark_entry__ as e
    from anomaly_detector_spark.session import get_spark

    spark = get_spark(cores=int(__import__("os").environ.get("SPARK_GRAFT_CPUS", 16)))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            spd = sdf.toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {str(ex)[:300]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spd)} rows (rows-only, no oracle)")
            continue
        try:
            opd = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {str(ex)[:300]}")
            failures += 1
            continue
        problems = []
        if len(spd) != len(opd):
            problems.append(f"rowcount {len(spd)} vs {len(opd)}")
        if sorted(spd.columns) != sorted(opd.columns):
            problems.append(f"schema {sorted(spd.columns)} vs {sorted(opd.columns)}")
        if not problems and value_hash(spd) != value_hash(opd):
            problems.append("value hash")
            a, b = canon(spd), canon(opd)
            diff = a.compare(b) if a.shape == b.shape else None
            print(f"--- {name} diff sample:")
            if diff is not None and len(diff):
                print(diff.head(10))
            else:
                print("spark:", a.head(5).to_dict("records"))
                print("duck :", b.head(5).to_dict("records"))
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failures += 1
        else:
            print(f"OK    {name}: {len(spd)} rows")
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or None))
