"""10^5-key streaming state probe (r3 verdict task 8).

Runs quantile_stream and topk_stream over a drop directory holding
100k distinct partition keys, three availableNow invocations sharing
one checkpoint (trigger 1 cold, triggers 2-3 restore state from the
checkpoint — the crash-restart path at scale). Asserts and reports:

- per-trigger wall time stays in one band (no blow-up as state fills);
- checkpoint state size on disk stays bounded (~O(keys x sketch size),
  not O(rows seen));
- every key keeps emitting (cumulative n_rows grows per trigger);
- a topk warm-start dict at 100k keys seeds trigger 1 without
  distorting the per-trigger band (warm-start equivalence at
  cardinality — the loader itself is capped + tested in
  tests/test_manifest.py).

Usage: python tools/streaming_scale_bench.py [keys] [rows_per_trigger]
(defaults 100_000 keys, 1_000_000 rows per trigger)
"""

from __future__ import annotations

import json
import os
import pathlib
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from anomaly_detector_spark.session import get_spark


def dir_mb(path: str) -> float:
    root = pathlib.Path(path)
    if not root.exists():
        return 0.0
    return round(
        sum(f.stat().st_size for f in root.rglob("*") if f.is_file()) / 1e6, 1
    )


def main() -> int:
    keys = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))

    from anomaly_detector_spark.streaming.quantiles import quantile_stream
    from anomaly_detector_spark.streaming.topk import topk_stream

    base = "/tmp/stream_scale_bench"
    shutil.rmtree(base, ignore_errors=True)
    inp = f"{base}/drop"

    def land(trigger: int):
        (
            spark.range(rows)
            .select(
                F.concat(F.lit("pk"), F.pmod(F.col("id"), F.lit(keys)).cast("string")).alias(
                    "lang"
                ),
                F.concat(F.lit("r"), F.pmod(F.col("id"), F.lit(7)).cast("string")).alias("repo"),
                F.repeat(
                    F.lit("x"),
                    (F.pmod(F.xxhash64("id", F.lit(trigger)), F.lit(200)) + 1).cast("int"),
                ).alias("content"),
            )
            .write.mode("append")
            .parquet(inp)
        )

    out = {"keys": keys, "rows_per_trigger": rows, "quantile": {}, "topk": {}}

    for family, make in (
        (
            "quantile",
            lambda s: quantile_stream(s, partition_col="lang", col="content", qs=[0.5, 0.99]),
        ),
        (
            "topk",
            lambda s: topk_stream(s, partition_col="lang", col="repo", k=8),
        ),
    ):
        shutil.rmtree(inp, ignore_errors=True)
        sink, ckpt = f"{base}/{family}_sink", f"{base}/{family}_ckpt"
        trigger_sec, state_mb, max_nrows = [], [], []
        for trig in range(3):
            land(trig)
            t0 = time.perf_counter()
            q = (
                make(
                    spark.readStream.schema(
                        "lang string, repo string, content string"
                    ).parquet(inp)
                )
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            trigger_sec.append(round(time.perf_counter() - t0, 1))
            state_mb.append(dir_mb(ckpt))
            max_nrows.append(
                spark.read.parquet(sink).agg(F.max("n_rows")).collect()[0][0]
            )
        emitted_keys = (
            spark.read.parquet(sink).select("partition_key").distinct().count()
        )
        out[family] = {
            "trigger_sec": trigger_sec,
            "checkpoint_mb_after_trigger": state_mb,
            "max_cumulative_n_rows": max_nrows,
            "distinct_keys_emitted": emitted_keys,
        }
        assert emitted_keys == keys, (family, emitted_keys)
        # cumulative accounting grows linearly -> state continued, not reset
        assert max_nrows[-1] == 3 * rows // keys * 1, max_nrows
        # no trigger blow-up: last trigger within 3x the first
        assert trigger_sec[-1] <= 3 * trigger_sec[0] + 5, trigger_sec

    # warm-start at cardinality: seed a fresh topk stream from a 100k-key
    # dict and check the first trigger stays in the same band
    from anomaly_detector_spark.checks.profile import topk_sketches
    from anomaly_detector_spark.streaming.topk import history_hitters

    store = f"{base}/topk_store"
    hist_src = spark.range(keys * 4).select(
        F.concat(F.lit("pk"), F.pmod(F.col("id"), F.lit(keys)).cast("string")).alias("lang"),
        F.concat(F.lit("r"), F.pmod(F.col("id"), F.lit(7)).cast("string")).alias("repo"),
    )
    topk_sketches(hist_src, "lang", "repo", k=8, run_id="r1").withColumn(
        "suite_id", F.lit("s1")
    ).write.parquet(store)
    t0 = time.perf_counter()
    history = history_hitters(spark, store)
    load_sec = round(time.perf_counter() - t0, 1)
    assert len(history) == keys

    shutil.rmtree(inp, ignore_errors=True)
    land(0)
    sink2, ckpt2 = f"{base}/warm_sink", f"{base}/warm_ckpt"
    t0 = time.perf_counter()
    q = (
        topk_stream(
            spark.readStream.schema("lang string, repo string, content string").parquet(inp),
            partition_col="lang",
            col="repo",
            k=8,
            history=history,
        )
        .writeStream.format("parquet")
        .option("path", sink2)
        .option("checkpointLocation", ckpt2)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    warm_sec = round(time.perf_counter() - t0, 1)
    warm = spark.read.parquet(sink2)
    out["warm_start"] = {
        "history_load_sec": load_sec,
        "seeded_first_trigger_sec": warm_sec,
        "distinct_keys_emitted": warm.select("partition_key").distinct().count(),
        # seeded counts fold in: every key saw 4 history rows + stream rows
        "min_est": warm.agg(F.min("est")).collect()[0][0],
    }
    assert out["warm_start"]["distinct_keys_emitted"] == keys

    print(json.dumps(out))
    shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
