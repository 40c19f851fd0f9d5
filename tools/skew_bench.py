"""Adversarial skew probe (r3 verdict task 5): a 90%-hot partition key
through the full fused suite + drift + quantile-sketch + top-k paths at
32M rows, against a uniform control of the same size.

The hot fixture overrides synth_files' lang so ONE partition value
("en") holds ~90% of all rows — the "one lang holds 29M of 32M" shape
the verdict asked for. Every family must (a) finish in the same band as
the uniform control (no single-reducer funnel: stats/drift are
map-side-combined JVM aggs, quantiles/top-k are two-level mergeable
sketches) and (b) produce verdicts for ALL partitions, hot included.

Usage: python tools/skew_bench.py [n_rows]  (default 32_000_000)
Prints one JSON line per (fixture, family) timing plus a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from anomaly_detector_spark.session import get_spark
from anomaly_detector_spark.synth import synth_files


def build(spark, n_rows: int, hot: bool, path: str):
    df = synth_files(spark, n_rows, seed=42)
    if hot:
        # 90% of rows into one lang; the rest keep their synth lang
        df = df.withColumn(
            "lang",
            F.when(F.pmod(F.xxhash64(F.col("path"), F.lit(9)), F.lit(10)) < 9, F.lit("en")).otherwise(
                F.col("lang")
            ),
        )
    if not os.path.isdir(path):
        df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    out = {"n_rows": n_rows, "timings": {}}

    from anomaly_detector_spark.checks.profile import topk_sketches
    from anomaly_detector_spark.checks.quantiles import tdigest_sketches
    from anomaly_detector_spark.plans.suite import extended_suite, run_suite

    for fixture in ("uniform", "hot90"):
        path = f"/tmp/skew_bench_{fixture}_{n_rows}"
        df = build(spark, n_rows, fixture == "hot90", path)
        hot_share = (
            df.groupBy("lang").count().orderBy(F.desc("count")).limit(1).collect()[0]
        )
        t = {}

        t0 = time.perf_counter()
        res = run_suite(df, suite=extended_suite())
        verdicts = {
            (r["partition_key"], r["check_id"]): r["verdict"]
            for r in res.verdicts.collect()
        }
        t["suite_extended"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        nq = tdigest_sketches(df, "lang", "content").count()
        t["quantile_sketches"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        nt = topk_sketches(df, "lang", "repo", k=16).count()
        t["topk_sketches"] = round(time.perf_counter() - t0, 3)

        n_parts = df.select("lang").distinct().count()
        out["timings"][fixture] = t
        out[fixture] = {
            "hot_lang": hot_share["lang"],
            "hot_rows": hot_share["count"],
            "hot_frac": round(hot_share["count"] / n_rows, 4),
            "n_partitions": n_parts,
            "n_verdict_rows": len(verdicts),
            "verdict_partitions": len({k[0] for k in verdicts}),
            "quantile_sketch_rows": nq,
            "topk_rows": nt,
        }
        # every partition must reach a verdict for every check family
        assert out[fixture]["verdict_partitions"] == n_parts, (fixture, n_parts)
        print(json.dumps({fixture: out[fixture], "timings": t}))

    ratio = {
        k: round(out["timings"]["hot90"][k] / out["timings"]["uniform"][k], 2)
        for k in out["timings"]["uniform"]
    }
    out["hot_over_uniform_ratio"] = ratio
    print(json.dumps({"summary": ratio}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
