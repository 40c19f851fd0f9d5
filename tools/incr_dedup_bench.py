"""Incremental vs full-batch LSH dedup cost (the band-store claim).

Simulates K ingest cycles of N docs each. The full-batch strategy
re-runs banded LSH over the whole corpus every cycle (cost grows with
corpus size); the incremental strategy signatures only the new batch
and equi-joins it against the persisted band rows (cost ~flat per
cycle). Prints one JSON line with per-cycle wall times and the pair
totals; candidate-pair parity between the two strategies is asserted.

Usage: python tools/incr_dedup_bench.py [docs_per_cycle] [cycles] [mode]
                                        [compact_every] [full_every]

``mode`` (default 'bands'): 'bands' = MinHash band store vs full-batch
LSH; 'containment' = winnow fingerprint store vs full-batch
containment_pairs (operators/dedup.py incremental_containment_pairs) —
the same flat-vs-linear claim for the partial-copy family.

``compact_every`` (default 0 = never): run plans/stores.py
compact_store on the band/fingerprint store every C cycles — the
long-horizon probe (r3 verdict task 6): per-cycle store file counts and
bytes are reported so the compaction cadence knee is visible.
``full_every`` (default 1): run the O(corpus) full-batch comparison
only every F cycles (plus the final cycle, where pair parity is always
asserted) — at 25+ cycles the quadratic full-batch side would dominate
the bench's own wall clock.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402


def synth_docs(spark, n: int, offset: int):
    """Deterministic ~30-token docs over a 400-word vocab (hash-drawn).

    Every 50th doc is a near-dup of its predecessor (same tokens, one
    appended word) — so the parity assertion compares non-empty pair
    sets, including cross-cycle pairs when a batch boundary splits a
    (base, near-dup) pair."""
    words = F.array(*[F.lit(f"w{i}") for i in range(400)])
    base_id = F.col("id") - (F.col("id") % 50 == 1).cast("long")
    return spark.range(offset, offset + n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.concat(
                F.transform(
                    F.sequence(F.lit(1), F.lit(30)),
                    lambda i: F.element_at(
                        words, (F.pmod(F.xxhash64(base_id, i), F.lit(400)) + 1).cast("int")
                    ),
                ),
                F.when(F.col("id") % 50 == 1, F.array(F.lit("zz"))).otherwise(F.array()),
            ),
        ).alias("text"),
    )


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    mode = sys.argv[3] if len(sys.argv) > 3 else "bands"
    compact_every = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    full_every = int(sys.argv[5]) if len(sys.argv) > 5 else 1

    from anomaly_detector_spark.operators.dedup import (
        containment_pairs,
        incremental_containment_pairs,
        incremental_lsh_candidates,
        minhash_lsh_candidates,
    )
    from anomaly_detector_spark.session import get_spark

    if mode == "containment":
        # same loop, partial-copy family: pair identity includes the
        # containment score so parity is score-exact, not just id-exact
        TH = 0.5

        def incr(spark, batch, store, rid):
            return incremental_containment_pairs(spark, batch, store, rid, threshold=TH)

        def full_batch(corpus):
            return containment_pairs(corpus, threshold=TH)

        def key(r):
            return (r.id_a, r.id_b, r.containment)
    else:
        def incr(spark, batch, store, rid):
            return incremental_lsh_candidates(spark, batch, store, rid)

        def full_batch(corpus):
            return minhash_lsh_candidates(corpus)

        def key(r):
            return (r.id_a, r.id_b)

    spark = get_spark(app_name="incr_dedup_bench", cores=32)
    store = tempfile.mkdtemp(prefix="bands_")
    shutil.rmtree(store, ignore_errors=True)

    batches = [synth_docs(spark, n, k * n).localCheckpoint() for k in range(cycles)]
    # warmup: JIT + python workers
    full_batch(batches[0].limit(2_000)).count()

    import pathlib

    def store_stats():
        root = pathlib.Path(store)
        files = [f for f in root.rglob("*.parquet") if f.is_file()]
        return len(files), sum(f.stat().st_size for f in files)

    from anomaly_detector_spark.plans.stores import compact_store

    store_family = "winnow_fps" if mode == "containment" else "bands"
    incr_times, compact_times = [], {}
    full_times: dict[int, float] = {}
    store_files, store_bytes = [], []
    incr_pairs = set()
    corpus = None
    for k in range(cycles):
        t0 = time.perf_counter()
        got = incr(spark, batches[k], store, f"r{k}")
        incr_pairs |= {key(r) for r in got.collect()}
        incr_times.append(round(time.perf_counter() - t0, 2))

        if compact_every and (k + 1) % compact_every == 0 and k + 1 < cycles:
            t0 = time.perf_counter()
            compact_store(spark, store, store_family)
            compact_times[k] = round(time.perf_counter() - t0, 2)
        nf, nb = store_stats()
        store_files.append(nf)
        store_bytes.append(nb)

        corpus = batches[k] if corpus is None else corpus.unionByName(batches[k])
        if (k + 1) % full_every == 0 or k + 1 == cycles:
            t0 = time.perf_counter()
            full = full_batch(corpus)
            n_full = full.count()
            full_times[k] = round(time.perf_counter() - t0, 2)

    full_pairs = {key(r) for r in full_batch(corpus).collect()}
    assert incr_pairs == full_pairs, (
        f"parity broken: {len(incr_pairs)} incremental vs {len(full_pairs)} full"
    )
    print(json.dumps({
        "mode": mode,
        "docs_per_cycle": n,
        "cycles": cycles,
        "compact_every": compact_every,
        "incremental_sec_per_cycle": incr_times,
        "compact_sec_by_cycle": compact_times,
        "fullbatch_sec_by_cycle": full_times,
        "store_files_per_cycle": store_files,
        "store_mb_per_cycle": [round(b / 1e6, 1) for b in store_bytes],
        "incremental_total_sec": round(sum(incr_times), 2),
        "fullbatch_total_sec": round(sum(full_times.values()), 2),
        "pairs": len(full_pairs),
    }))
    shutil.rmtree(store, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
