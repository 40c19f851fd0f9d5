"""End-to-end pruning proof for the layout family (r3 verdict task 7).

BASELINE.md already records the footer min/max FILE-INTERSECTION counts
for a box predicate over flat vs z-ordered layouts; this bench adds the
actual scan savings: wall time of the same box-predicate aggregate
against (a) the flat layout, (b) the z-ordered layout read whole
(parquet row-group skipping only), and (c) the z-ordered layout with
explicit file-level pruning from footer ranges — i.e. what an
Iceberg/Delta reader's scan planning does with the same statistics.
Also reports clustering_health avg_depth for both layouts so the
health metric can be correlated with measured files-read.

Usage: python tools/layout_bench.py [n_rows] [files]
(defaults 32_000_000 rows, 64 files)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from anomaly_detector_spark.session import get_spark


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))

    from anomaly_detector_spark.operators.layout import (
        cluster_write,
        clustering_health,
        parquet_file_ranges,
    )

    # two clustered dimensions + payload ballast so scan time is real
    df = spark.range(n_rows).select(
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1_000_000)).alias("x"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1_000_000)).alias("y"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    flat, zord = "/tmp/layout_flat", "/tmp/layout_zorder"
    if not os.path.isdir(flat):
        # random row order -> every file spans both full ranges
        df.repartition(n_files).write.mode("overwrite").parquet(flat)
    if not os.path.isdir(zord):
        cluster_write(spark.read.parquet(flat), ["x", "y"], zord, n_files=n_files)

    # 10% x 10% box predicate => ~1% selectivity
    pred = (
        (F.col("x") >= 100_000) & (F.col("x") < 200_000)
        & (F.col("y") >= 300_000) & (F.col("y") < 400_000)
    )

    def timed(reader):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            got = reader().filter(pred).agg(
                F.count(F.lit(1)).alias("n"), F.sum(F.length("payload")).alias("b")
            ).collect()[0]
            sec = time.perf_counter() - t0
            best = sec if best is None or sec < best else best
        return round(best, 3), got["n"]

    out = {"n_rows": n_rows, "n_files": n_files}

    # file-level pruning from footer ranges (Iceberg-style scan planning)
    def pruned_files(path):
        pdf = parquet_file_ranges(path, ["x", "y"])
        keep = []
        for _, r in pdf.iterrows():
            if (
                r["x_max"] >= 100_000
                and r["x_min"] < 200_000
                and r["y_max"] >= 300_000
                and r["y_min"] < 400_000
            ):
                keep.append(os.path.join(path, r["file"]))
        return keep

    t0 = time.perf_counter()
    keep_z = pruned_files(zord)
    plan_sec = round(time.perf_counter() - t0, 3)
    keep_flat = pruned_files(flat)

    sec_flat, n1 = timed(lambda: spark.read.parquet(flat))
    sec_z, n2 = timed(lambda: spark.read.parquet(zord))
    sec_zp, n3 = timed(lambda: spark.read.parquet(*keep_z))
    assert n1 == n2 == n3, (n1, n2, n3)

    def depth(path):
        r = clustering_health(spark, path, ["x", "y"]).collect()
        return {row["col_name"]: round(float(row["avg_depth"]), 2) for row in r}

    out.update(
        {
            "rows_selected": n1,
            "flat_files_intersecting": len(keep_flat),
            "zorder_files_intersecting": len(keep_z),
            "scan_plan_sec": plan_sec,
            "flat_full_scan_sec": sec_flat,
            "zorder_full_scan_sec": sec_z,
            "zorder_file_pruned_sec": sec_zp,
            "avg_depth": {"flat": depth(flat), "zorder": depth(zord)},
        }
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
