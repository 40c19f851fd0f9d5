"""Media-column checks: the multimodal family as first-class suite members.

The operators (operators/multimodal.py) answer row-level questions —
features, perceptual hashes, near-dup pairs. This module wraps them in
the engine's verdict grammar so a media table rides the same suite /
manifest / scorecard machinery as the files table: per-partition
PASS/FAIL with metrics, content-addressed check ids, declarable from
JSON suite documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .base import CheckResult, CheckSpec, empty_violations, null_safe_join, verdict_frame


def run_media_dups(df: DataFrame, spec: CheckSpec) -> CheckResult:
    """Perceptual near-duplicate exposure: FAIL partitions where more
    than ``max_dup_frac`` of rows participate in a dHash near-dup pair
    (operators/multimodal.py phash_near_dups — hamming <=
    ``max_hamming`` via the pigeonhole block join). The media twin of
    the ``containment`` check: a partition that is largely re-encodes /
    crops of other assets multiplies their training weight invisibly to
    byte-exact dedup.

    Costs the operator itself (bucketed block join on 8-byte keys,
    never all-pairs; the decode kernel runs ONCE — the signature frame
    is checkpointed) plus two O(partitions) aggregates; the payload
    rides only the narrow signature map, never a shuffle. Verdicts +
    metrics only — pair evidence via the operator.

    config: ``payload_col`` ('payload'), ``id_col`` ('media_id'),
    ``max_hamming`` (6), ``blocks`` (8), ``max_dup_frac`` (0.05).
    """
    from ..operators.multimodal import phash_near_dups

    part = spec.partition_col
    c = spec.config
    payload_col = c.get("payload_col", "payload")
    id_c = c.get("id_col", "media_id")
    slim = df.filter(F.col(payload_col).isNotNull()).select(
        F.col(id_c).alias("_id"),
        F.col(part).alias("_part"),
        F.col(payload_col).alias("payload"),
    )
    pairs = phash_near_dups(
        slim,
        max_hamming=int(c.get("max_hamming", 6)),
        blocks=int(c.get("blocks", 8)),
        id_col="_id",
        materialize=bool(c.get("materialize", True)),
    )
    dupped = (
        pairs.select(F.col("media_id_a").alias("_id"))
        .unionByName(pairs.select(F.col("media_id_b").alias("_id")))
        .distinct()
    )
    totals = slim.groupBy("_part").agg(F.count(F.lit(1)).alias("n_rows"))
    hit = (
        slim.join(dupped, on="_id", how="left_semi")
        .groupBy("_part")
        .agg(F.count(F.lit(1)).alias("n_dup"))
    )
    per_part = null_safe_join(totals, hit, ["_part"], "left").select(
        F.col("_part").alias(part),
        "n_rows",
        F.coalesce("n_dup", F.lit(0)).alias("n_dup"),
    )
    verdicts = verdict_frame(
        per_part,
        spec.id,
        part,
        fail_when=F.col("n_dup")
        > F.col("n_rows") * F.lit(float(c.get("max_dup_frac", 0.05))),
        skip_when=F.col("n_rows") < spec.min_rows,
        metric_cols=["n_rows", "n_dup"],
    )
    return CheckResult(violations=empty_violations(df), verdicts=verdicts, metrics=per_part)


def run_frame_overlap(df: DataFrame, spec: CheckSpec) -> CheckResult:
    """Frame-level copy exposure for video columns: FAIL partitions
    where more than ``max_dup_frac`` of clips participate in a
    frame-overlap pair (operators/multimodal.py
    video_frame_overlap_pairs — decoded per-frame dHash equi-join, one
    decode pass). The video analog of the containment check: trimmed or
    re-encoded clip copies multiply training weight invisibly to
    byte-exact and whole-clip dedup.

    config: ``payload_col`` ('payload'), ``id_col`` ('media_id'),
    ``min_shared`` (2), ``every_n`` (1), ``max_dup_frac`` (0.05)."""
    from ..operators.multimodal import video_frame_overlap_pairs

    part = spec.partition_col
    c = spec.config
    payload_col = c.get("payload_col", "payload")
    id_c = c.get("id_col", "media_id")
    slim = df.filter(F.col(payload_col).isNotNull()).select(
        F.col(id_c).alias("_id"),
        F.col(part).alias("_part"),
        F.col(payload_col).alias("payload"),
    )
    pairs = video_frame_overlap_pairs(
        slim,
        min_shared=int(c.get("min_shared", 2)),
        every_n=int(c.get("every_n", 1)),
        id_col="_id",
        materialize=bool(c.get("materialize", True)),
    )
    dupped = (
        pairs.select(F.col("media_id_a").alias("_id"))
        .unionByName(pairs.select(F.col("media_id_b").alias("_id")))
        .distinct()
    )
    totals = slim.groupBy("_part").agg(F.count(F.lit(1)).alias("n_rows"))
    hit = (
        slim.join(dupped, on="_id", how="left_semi")
        .groupBy("_part")
        .agg(F.count(F.lit(1)).alias("n_dup"))
    )
    per_part = null_safe_join(totals, hit, ["_part"], "left").select(
        F.col("_part").alias(part),
        "n_rows",
        F.coalesce("n_dup", F.lit(0)).alias("n_dup"),
    )
    verdicts = verdict_frame(
        per_part,
        spec.id,
        part,
        fail_when=F.col("n_dup")
        > F.col("n_rows") * F.lit(float(c.get("max_dup_frac", 0.05))),
        skip_when=F.col("n_rows") < spec.min_rows,
        metric_cols=["n_rows", "n_dup"],
    )
    return CheckResult(violations=empty_violations(df), verdicts=verdicts, metrics=per_part)


def run_audio_overlap(df: DataFrame, spec: CheckSpec) -> CheckResult:
    """Segment-level copy exposure for audio columns — the audio twin of
    :func:`run_frame_overlap`, built on
    operators/multimodal.py audio_segment_overlap_pairs (decoded
    16-sample sign-hash windows, one decode pass).

    config: ``payload_col`` ('payload'), ``id_col`` ('media_id'),
    ``segment_len`` (16), ``min_shared`` (2), ``max_dup_frac`` (0.05)."""
    from ..operators.multimodal import audio_segment_overlap_pairs

    part = spec.partition_col
    c = spec.config
    payload_col = c.get("payload_col", "payload")
    id_c = c.get("id_col", "media_id")
    slim = df.filter(F.col(payload_col).isNotNull()).select(
        F.col(id_c).alias("_id"),
        F.col(part).alias("_part"),
        F.col(payload_col).alias("payload"),
    )
    pairs = audio_segment_overlap_pairs(
        slim,
        segment_len=int(c.get("segment_len", 16)),
        min_shared=int(c.get("min_shared", 2)),
        id_col="_id",
        materialize=bool(c.get("materialize", True)),
    )
    dupped = (
        pairs.select(F.col("media_id_a").alias("_id"))
        .unionByName(pairs.select(F.col("media_id_b").alias("_id")))
        .distinct()
    )
    totals = slim.groupBy("_part").agg(F.count(F.lit(1)).alias("n_rows"))
    hit = (
        slim.join(dupped, on="_id", how="left_semi")
        .groupBy("_part")
        .agg(F.count(F.lit(1)).alias("n_dup"))
    )
    per_part = null_safe_join(totals, hit, ["_part"], "left").select(
        F.col("_part").alias(part),
        "n_rows",
        F.coalesce("n_dup", F.lit(0)).alias("n_dup"),
    )
    verdicts = verdict_frame(
        per_part,
        spec.id,
        part,
        fail_when=F.col("n_dup")
        > F.col("n_rows") * F.lit(float(c.get("max_dup_frac", 0.05))),
        skip_when=F.col("n_rows") < spec.min_rows,
        metric_cols=["n_rows", "n_dup"],
    )
    return CheckResult(violations=empty_violations(df), verdicts=verdicts, metrics=per_part)
