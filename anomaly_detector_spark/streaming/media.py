"""Streaming perceptual media dedup — continuous-ingest near-dup
detection, the streaming twin of operators/multimodal.py
incremental_phash_pairs.

Each arriving asset is decoded and perceptually hashed IN the stream
(dhash64 via an Arrow-batched mapInPandas stage: pixels for images,
sign-of-delta for WAV), its signature exploded into the pigeonhole
blocks, and each (block_idx, block_val) bucket keeps the signatures it
has seen as ``applyInPandasWithState`` state. A new arrival is compared
against its buckets' state — hamming <= ``max_hamming`` emits a match
row immediately, within the trigger that ingested the asset — and then
joins the state.

Emission semantics: a pair within the hamming bound shares >= 1 block
(the pigeonhole guarantee) and is emitted once PER shared block whose
bucket sees it; consumers take distinct (media_id_a, media_id_b) —
exactly the batch family's dropDuplicates, which an append-mode stream
cannot do globally. The distinct-pair set equals the batch
incremental/full-batch pair set over the same rows (pinned by test).

State honesty: near-dup detection must remember every signature it may
later match, so state is the corpus signature set — ~16 bytes x
``blocks`` per asset, linear in ingested assets (the same bytes the
batch band store persists; streaming/dedup.py's exact twin bounds its
horizon with a watermark). ``idle_ttl_ms`` gives the same bounded
horizon here: buckets idle past the TTL are evicted, trading recall
against old assets for bounded state. ``max_bucket`` censors degenerate
buckets — once a bucket holds that many signatures it stops BOTH
matching and accumulating, so the cap genuinely bounds state memory
(~16 bytes x max_bucket per bucket) as well as emission — the
stream-side analog of the batch ``max_bucket`` cap.
"""

from __future__ import annotations

import sys
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - trivial registration
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:
    pass

STATE_SCHEMA = "ids array<long>, sigs array<long>"
OUT_SCHEMA = (
    "media_id_a long, media_id_b long, phash_a long, phash_b long, "
    "hamming int, block_idx int"
)


def phash_stream(
    stream_df: DataFrame,
    max_hamming: int = 6,
    blocks: int = 8,
    id_col: str = "media_id",
    max_bucket: int = 10_000,
    idle_ttl_ms: int | None = None,
) -> DataFrame:
    """Continuous perceptual near-dup matches over a media stream (see
    module docstring). Input columns: ``id_col`` + ``payload``, plus an
    optional ``kind`` column that feeds dhash64's hardened declared-
    kind dispatch (magic sniffing alone otherwise)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..operators.multimodal import DHASH_BITS, dhash64

    if max_hamming >= blocks:
        raise ValueError("pigeonhole requires max_hamming < blocks")
    width = DHASH_BITS // blocks
    thr = int(max_hamming)
    cap = int(max_bucket)
    ttl = idle_ttl_ms

    def hash_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kinds = pdf["kind"] if "kind" in pdf.columns else None
            yield pd.DataFrame(
                {
                    "media_id": [int(x) for x in pdf["media_id"]],
                    "phash": pd.array(
                        [
                            dhash64(p, kinds.iloc[i] if kinds is not None else None)
                            for i, p in enumerate(pdf["payload"])
                        ],
                        dtype="Int64",
                    ),
                }
            )

    cols = [F.col(id_col).alias("media_id"), "payload"] + (
        ["kind"] if "kind" in stream_df.columns else []
    )
    sigs = (
        stream_df.select(*cols)
        .mapInPandas(hash_kernel, "media_id long, phash long")
        # corrupt / undecodable / degenerate assets hash to NULL —
        # excluded from pairing (and from state), matching the batch
        # family's block-join NULL semantics
        .filter(F.col("phash").isNotNull())
    )
    blocked = sigs.select(
        "media_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("block_idx"),
                        F.shiftright(F.col("phash"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("block_val"),
                    )
                    for b in range(blocks)
                ]
            )
        ).alias("blk"),
    ).select(
        "media_id",
        "phash",
        F.col("blk.block_idx").alias("block_idx"),
        F.col("blk.block_val").alias("block_val"),
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if ttl is not None and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            ids, sigs_ = state.get
            ids, sigs_ = list(ids), list(sigs_)
        else:
            ids, sigs_ = [], []
        new: list[tuple[int, int]] = []
        for pdf in pdfs:
            new.extend(
                (int(i), int(s)) for i, s in zip(pdf["media_id"], pdf["phash"])
            )
        if not new:
            return
        # deterministic order: state comparisons are set-based, but
        # new-vs-new within one batch needs a stable id order
        new.sort()
        rows = []
        bidx = int(key[0])
        for nid, nsig in new:
            if len(ids) < cap:
                for oid, osig in zip(ids, sigs_):
                    if oid == nid:
                        continue
                    ham = bin((nsig ^ osig) & ((1 << 64) - 1)).count("1")
                    if ham <= thr:
                        a, b = sorted(((nid, nsig), (oid, osig)))
                        rows.append(
                            {
                                "media_id_a": a[0],
                                "media_id_b": b[0],
                                "phash_a": a[1],
                                "phash_b": b[1],
                                "hamming": ham,
                                "block_idx": bidx,
                            }
                        )
                        # a near-cap bucket of mutually-matching
                        # signatures emits O(cap^2) pairs in one batch;
                        # flush in bounded chunks so the worker never
                        # builds the quadratic frame in memory (r5 skew
                        # audit — a 20k-copy mega-cluster crashed the
                        # worker here before this flush)
                        if len(rows) >= 65536:
                            yield pd.DataFrame(rows)
                            rows = []
                # the cap bounds STATE, not just emission: a degenerate
                # bucket stops accumulating signatures once full, so its
                # memory stays ~16B x max_bucket no matter how many more
                # assets hash into it (r4 advice — appending past the cap
                # made the cap cosmetic)
                ids.append(nid)
                sigs_.append(nsig)
        state.update((ids, sigs_))
        if ttl is not None:
            state.setTimeoutDuration(ttl)
        if rows:
            yield pd.DataFrame(rows)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl is not None
        else GroupStateTimeout.NoTimeout
    )
    return blocked.groupBy("block_idx", "block_val").applyInPandasWithState(
        fn, OUT_SCHEMA, STATE_SCHEMA, "append", timeout
    )
