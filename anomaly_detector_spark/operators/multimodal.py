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

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def synth_media(spark, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = seeded pseudo-bytes.

    Every derivation is plain arithmetic + sha256 (no xxhash64) so the
    table — and anything computed from it — is reproducible in any ANSI
    SQL engine for oracle checks.
    """
    df = spark.range(n_rows).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.sha2(F.concat(F.lit("payload"), F.col("id").cast("string")), 256)
        .cast("binary")
        .alias("payload"),
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
