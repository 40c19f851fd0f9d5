"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a
metadata struct; decode/feature steps run as Arrow-batched pandas
iterators over ``mapInPandas`` so each Python worker sees columnar
batches, never one row at a time. The decode kernels themselves are
STUBBED (no image/audio libraries in this environment) behind
deterministic fakes — the Spark-side plumbing (schema, batch shape,
partitioning) is real and tested.
"""

from __future__ import annotations

import sys
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Ship this module BY VALUE inside the kernels (same no-footgun
# guarantee as operators/loads.py): executors without the package on
# PYTHONPATH (spark-submit without --py-files) still run them.
try:  # pragma: no cover - trivial registration
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:
    pass

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

# scalar feature columns (f0..f7), not array<double>: downstream
# canonicalizers (pandas sort, parquet predicate pushdown, SQL oracles)
# all handle scalars; an 8-bucket byte histogram is small enough that
# exploding it into columns costs nothing and keeps the row hashable.
FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, "
    + ", ".join(f"f{i} double" for i in range(8))
)


def synth_media(spark, n_rows: int, seed: int = 42, plant_every: int | None = None) -> DataFrame:
    """Deterministic fake media table: payload = seeded pseudo-bytes.

    Every derivation is plain arithmetic + sha256 (no xxhash64) so the
    table — and anything computed from it — is reproducible in any ANSI
    SQL engine for oracle checks.

    ``plant_every``: every k-th row (id % k == k-1) becomes a NEAR-COPY
    of row id-1 — the previous payload with ONE byte overwritten (at
    position id % 64) — the planted ground truth for perceptual-hash
    near-dup detection. A one-byte edit perturbs at most the two dHash
    comparisons that touch it, so planted pairs land within hamming 2
    while unrelated sha-derived payloads sit near hamming 32.
    """
    base = F.sha2(F.concat(F.lit("payload"), F.col("id").cast("string")), 256)
    if plant_every is not None:
        prev = F.sha2(
            F.concat(F.lit("payload"), (F.col("id") - 1).cast("string")), 256
        )
        pos = F.pmod(F.col("id"), F.lit(64)).cast("int")  # 0-based edit position
        edited = F.concat(
            F.substring(prev, 1, pos),
            F.lit("z"),  # not a hex char: guaranteed to differ
            F.substring(prev, pos + 2, F.lit(64) - pos - 1),
        )
        base = F.when(
            (F.pmod(F.col("id"), F.lit(plant_every)) == plant_every - 1)
            & (F.col("id") > 0),
            edited,
        ).otherwise(base)
    df = spark.range(n_rows).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        base.cast("binary").alias("payload"),
        F.struct(
            F.lit(640).alias("width"),
            F.lit(480).alias("height"),
            F.lit(16000).alias("sample_rate"),
            F.pmod(F.col("id") * 9973, F.lit(60000)).cast("long").alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )
    return df


def _decode_stub(payload: bytes, kind: str) -> list[float]:
    """STUB decode: a real deployment would decode image/audio here
    (PIL/librosa/ffmpeg are not in this container). Deterministic fake:
    8 byte-histogram features of the payload."""
    if payload is None:
        raise NotImplementedError("real media decode requires codec libraries")
    buckets = [0] * 8
    for b in payload:
        buckets[b >> 5] += 1
    total = max(len(payload), 1)
    return [round(c / total, 6) for c in buckets]


def extract_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas.

    The kernel is a closure (cloudpickled by value → works without
    --py-files). Batches arrive as pandas DataFrames; the loop is over
    batches, not rows at the Spark level.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def decode(payload, kind):
            if payload is None:
                return None
            buckets = [0] * 8
            for b in payload:
                buckets[b >> 5] += 1
            total = max(len(payload), 1)
            return [round(c / total, 6) for c in buckets]

        for pdf in batches:
            feats = [decode(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
            cols = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(lambda p: 0 if p is None else len(p)),
            }
            for i in range(8):
                cols[f"f{i}"] = [None if f is None else f[i] for f in feats]
            yield pd.DataFrame(cols)

    return df.mapInPandas(kernel, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp (JVM-side sequence/explode — the decode of each frame
    would happen in extract_features). Shows the explode-based fan-out
    that keeps frame extraction distributed."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest((F.col("meta.duration_ms") / every_ms).cast("long") - 1, F.lit(0)))
            ).alias("frame_idx"),
        )
        .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
    )


# --- perceptual-hash near-dup (dHash) -------------------------------------
#
# The public dHash algorithm: resize the decoded image to a (w+1) x h
# grayscale grid and emit one bit per adjacent-pixel comparison
# (bit i = pixel[i] > pixel[i+1]) — a 64-bit signature whose hamming
# distance survives re-encoding, resizing and small edits. The decode +
# resize step is STUBBED here like extract_features (no codec libraries
# in this environment): the comparison sequence runs over the payload's
# first 64 bytes with wraparound, which preserves everything the Spark
# side must get right — Arrow batch shape, signed-64 packing, and the
# pigeonhole block join downstream.

DHASH_BITS = 64


def dhash64(payload: bytes | None) -> int | None:
    """Scalar dHash: bit i (i in 0..63) = payload[i % n] > payload[(i+1) % n],
    packed little-endian into one SIGNED long (two's complement — the
    same value any engine gets from the same bits). NULL -> NULL, empty
    -> 0.

    Edit-distance property (what makes it a NEAR-dup hash): for
    payloads of n >= 64 bytes, a one-byte edit touches exactly the two
    comparisons adjacent to it, so hamming <= 2; shorter payloads wrap,
    so the bound relaxes to 2*ceil(64/n) (pinned by a hypothesis
    property)."""
    if payload is None:
        return None
    b = bytes(payload)
    n = len(b)
    if n == 0:
        return 0
    h = 0
    for i in range(DHASH_BITS):
        if b[i % n] > b[(i + 1) % n]:
            h |= 1 << i
    if h >= 1 << 63:  # two's complement into a signed long
        h -= 1 << 64
    return h


def with_dhash(df: DataFrame, out_col: str = "phash") -> DataFrame:
    """64-bit dHash per media row (Arrow-batched mapInPandas over
    :func:`dhash64`; this module is registered pickle-by-value — no
    --py-files footgun)."""

    out_schema = ", ".join(
        f"{name} {typ}" for name, typ in df.dtypes
    ) + f", {out_col} long"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dhash = dhash64

        for pdf in batches:
            out = pdf.copy()
            out[out_col] = pd.array(
                [dhash(p) for p in pdf["payload"]], dtype="Int64"
            )
            yield out

    return df.mapInPandas(kernel, out_schema)


def phash_near_dups(
    df: DataFrame,
    max_hamming: int = 6,
    blocks: int = 8,
    id_col: str = "media_id",
    materialize: bool = True,
) -> DataFrame:
    """Near-duplicate media pairs by dHash hamming distance.

    Same pigeonhole geometry as operators/dedup.py simhash_near_dups:
    split the 64-bit signature into ``blocks`` chunks — any pair within
    ``max_hamming`` (< blocks) differing bits shares at least one exact
    chunk — bucket-join per chunk, then the exact bit_count(xor) filter.
    Cost is O(sum bucket^2) on 8-byte keys, never all-pairs; the
    payload column is pruned before the exchange (only id + sig ride
    the shuffle).

    ``materialize``: eagerly localCheckpoint the 16-byte (id, sig)
    frame before the self-join — without it both join sides re-run the
    Python decode kernel (the plan shows TWO MapInPandas nodes), which
    at corpus scale doubles the expensive half of the job. Same rule as
    dedup.py's banded/containment stores."""
    if max_hamming >= blocks:
        raise ValueError("pigeonhole requires max_hamming < blocks")
    width = DHASH_BITS // blocks
    sigs = with_dhash(df.select(id_col, "payload")).select(
        F.col(id_col).alias("_id"), F.col("phash").alias("_sig")
    )
    if materialize:
        sigs = sigs.localCheckpoint()
    blocked = sigs.select(
        "_id",
        "_sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("block_idx"),
                        F.shiftright(F.col("_sig"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("block_val"),
                    )
                    for b in range(blocks)
                ]
            )
        ).alias("blk"),
    ).select(
        "_id",
        "_sig",
        F.col("blk.block_idx").alias("block_idx"),
        F.col("blk.block_val").alias("block_val"),
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(b, on=["block_idx", "block_val"], how="inner")
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("media_id_a"),
            F.col("b._id").alias("media_id_b"),
            F.col("a._sig").alias("phash_a"),
            F.col("b._sig").alias("phash_b"),
            F.bit_count(F.col("a._sig").bitwiseXOR(F.col("b._sig"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["media_id_a", "media_id_b"])
    )
