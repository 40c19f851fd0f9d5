"""Corrupt-payload and dispatch-hardening tests for the media codecs.

Closes the r4 ADVICE findings: a malformed payload inside a recognized
container must cost ONE row (NULL/skip), never the whole batch job or
streaming query; recognized-but-undecodable WAV/GIF must NOT fall back
to the header-dominated byte path; degenerate media (empty payload,
frame-less GIF) hash to NULL, not a shared constant; declared ``kind``
outranks magic sniffing; and a corrupt incremental store fails loudly
instead of silently dropping every new_old pair.
"""

import struct

import pytest

from anomaly_detector_spark.operators.multimodal import (
    dhash64,
    encode_bmp,
    encode_gif,
    encode_png,
    encode_wav,
    extract_image_features,
    extract_video_frames,
    synth_media_images,
)


def _sha_payload(tag: bytes) -> bytes:
    import hashlib

    return hashlib.sha256(tag).hexdigest().encode()


# --- corrupt payloads: NULL, never an exception ---------------------------


def test_dhash64_corrupt_payloads_return_null():
    px = list(range(72))
    # truncated BMP: valid magic + header claiming more raster than exists
    bmp = encode_bmp(9, 8, px)
    assert dhash64(bmp[:70]) is None
    # corrupt PNG: valid signature + IHDR, IDAT bytes mangled (zlib.error)
    png = bytearray(encode_png(9, 8, px))
    idat = bytes(png).index(b"IDAT")
    png[idat + 4 : idat + 12] = b"\xff" * 8
    assert dhash64(bytes(png)) is None
    # short WAV: RIFF/WAVE magic + truncated fmt chunk (struct.error)
    wav = encode_wav(16000, [0, 100, -100, 200])
    assert dhash64(wav[:30]) is None
    # truncated GIF: magic + screen descriptor, image data cut mid-block
    gif = encode_gif(9, 8, [px])
    assert dhash64(gif[: len(gif) // 2]) is None


def test_dhash64_unsupported_variants_return_null_not_byte_path():
    # stereo WAV (channels=2): recognized container, rejected variant —
    # the byte path over the shared 44-byte RIFF header would fake
    # near-dup similarity between unrelated clips, so it must be NULL
    wav = bytearray(encode_wav(16000, list(range(-50, 50))))
    wav[22:24] = struct.pack("<H", 2)
    assert wav[:4] == b"RIFF" and dhash64(bytes(wav)) is None
    # interlaced GIF: flip the interlace flag in the image descriptor
    # (walk the structure — the palette bytes can contain 0x2c)
    gif = bytearray(encode_gif(9, 8, [list(range(72))]))
    pos = 13 + (3 * 2 ** ((gif[10] & 7) + 1) if gif[10] & 0x80 else 0)
    while gif[pos] == 0x21:  # skip extensions
        pos += 2
        while gif[pos] != 0:
            pos += 1 + gif[pos]
        pos += 1
    assert gif[pos] == 0x2C
    gif[pos + 9] |= 0x40
    assert dhash64(bytes(gif)) is None


def test_dhash64_degenerate_media_are_null_not_shared_zero():
    assert dhash64(b"") is None
    # frame-less GIF: header + trailer, no image blocks — previously 0,
    # colliding with every other degenerate asset at hamming 0
    gif = b"GIF89a" + struct.pack("<HH", 9, 8) + bytes([0, 0, 0]) + b"\x3b"
    assert dhash64(gif) is None
    # and a zero-sample WAV (valid container, empty data chunk)
    assert dhash64(encode_wav(16000, [])) is None


# --- dispatch hardening: declared kind outranks sniffing ------------------


def test_dhash64_declared_kind_blocks_magic_collision():
    # adversarial payload: text whose leading bytes collide with the BMP
    # magic. Declared as non-image it must take the byte path (never the
    # image decoder); undeclared, the sniffer sees "BM", tries the image
    # decoder, and the corrupt "BMP" correctly yields NULL.
    adversarial = b"BMW sales rose 4% in the third quarter" + b"x" * 40
    byte_hash = dhash64(_sha_payload(b"ref"))  # any byte-path value
    assert byte_hash is not None
    declared = dhash64(adversarial, kind="text")
    assert declared is not None  # byte path ran
    assert dhash64(adversarial) is None  # sniffed as image, corrupt -> NULL


def test_dhash64_declared_kind_without_magic_keeps_byte_path():
    # synth_media's byte fixtures declare image/audio/video over sha-hex
    # payloads; declaration alone (magic absent) must not force a decode
    p = _sha_payload(b"payload0")
    assert dhash64(p, kind="image") == dhash64(p) == dhash64(p, kind="audio")


def test_dhash64_declared_kind_agreeing_with_magic_decodes():
    px = list(range(72))
    assert (
        dhash64(encode_bmp(9, 8, px), kind="bmp")
        == dhash64(encode_png(9, 8, px), kind="image")
        == dhash64(encode_bmp(9, 8, px))
    )


# --- kernels survive corrupt rows ----------------------------------------


def test_extract_image_features_null_row_for_corrupt_payload(spark):
    good = synth_media_images(spark, 6)
    px = list(range(72))
    bad = spark.createDataFrame(
        [(100, "bmp", bytearray(encode_bmp(9, 8, px)[:70]))],
        "media_id long, kind string, payload binary",
    )
    rows = {
        r["media_id"]: r
        for r in extract_image_features(
            good.select("media_id", "kind", "payload").unionByName(bad)
        ).collect()
    }
    assert len(rows) == 7  # the corrupt row is present, not dropped/fatal
    assert rows[100]["width"] is None and rows[100]["f0"] is None
    assert rows[0]["width"] == 9 and rows[0]["f0"] is not None


def test_extract_video_frames_skips_corrupt_clip(spark):
    px = list(range(72))
    ok = encode_gif(9, 8, [px, px[::-1]])
    df = spark.createDataFrame(
        [(1, bytearray(ok)), (2, bytearray(ok[: len(ok) // 2]))],
        "media_id long, payload binary",
    )
    rows = extract_video_frames(df).collect()
    assert {r["media_id"] for r in rows} == {1}
    assert len(rows) == 2


def test_phash_stream_survives_corrupt_payload(spark, tmp_path):
    # one corrupt asset in the stream must not kill the query; its NULL
    # signature is excluded from pairing while planted pairs still emit
    from anomaly_detector_spark.streaming.media import phash_stream

    full = synth_media_images(spark, 50, plant_every=25).localCheckpoint()
    inp, sink, ckpt = (str(tmp_path / d) for d in ("in", "sink", "ckpt"))
    full.select("media_id", "payload").write.parquet(inp)
    px = list(range(72))
    spark.createDataFrame(
        [(999, bytearray(encode_bmp(9, 8, px)[:70]))],
        "media_id long, payload binary",
    ).write.mode("append").parquet(inp)
    q = (
        phash_stream(
            spark.readStream.schema("media_id long, payload binary").parquet(inp),
            max_hamming=6,
            blocks=8,
        )
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    pairs = {
        (r["media_id_a"], r["media_id_b"])
        for r in spark.read.parquet(sink).collect()
    }
    assert pairs == {(23, 24), (48, 49)}


# --- incremental store: corrupt store fails loudly ------------------------


def test_incremental_phash_store_corrupt_store_fails_loudly(spark, tmp_path):
    from anomaly_detector_spark.operators.multimodal import incremental_phash_pairs

    store = tmp_path / "store"
    store.mkdir()
    (store / "part-00000.parquet").write_bytes(b"not a parquet file" * 16)
    media = synth_media_images(spark, 10)
    with pytest.raises(Exception) as exc:
        incremental_phash_pairs(
            spark, media, str(store), run_id="r1", commit=False
        ).collect()
    # must NOT be silently treated as "first run"
    assert "AnalysisException" not in type(exc.value).__name__


def test_incremental_phash_store_absent_store_is_first_run(spark, tmp_path):
    from anomaly_detector_spark.operators.multimodal import incremental_phash_pairs

    media = synth_media_images(spark, 50, plant_every=25)
    pairs = {
        (r["media_id_a"], r["media_id_b"])
        for r in incremental_phash_pairs(
            spark, media, str(tmp_path / "absent"), run_id="r1", commit=False
        ).collect()
    }
    assert pairs == {(23, 24), (48, 49)}


# --- vectorized byte path ------------------------------------------------


def test_dhash64_bytes_batch_matches_scalar():
    import hashlib

    from anomaly_detector_spark.operators.multimodal import dhash64_bytes_batch

    payloads = [
        hashlib.sha256(f"p{i}".encode()).hexdigest().encode() for i in range(50)
    ]
    # mixed lengths exercise the per-length grouping (incl. wraparound)
    payloads += [b"x", b"ab", b"short payload", b"y" * 200]
    assert dhash64_bytes_batch(payloads) == [dhash64(p) for p in payloads]


def test_with_dhash_mixes_byte_and_decode_paths(spark):
    # one frame carrying byte fixtures AND real images: the kernel must
    # route each row to the right path and agree with scalar dhash64
    from anomaly_detector_spark.operators.multimodal import (
        encode_bmp,
        synth_media,
        with_dhash,
    )

    byte_media = synth_media(spark, 20).select("media_id", "kind", "payload")
    img = spark.createDataFrame(
        [(100, "bmp", bytearray(encode_bmp(9, 8, list(range(72)))))],
        "media_id long, kind string, payload binary",
    )
    rows = with_dhash(byte_media.unionByName(img)).collect()
    assert len(rows) == 21
    for r in rows:
        assert r["phash"] == dhash64(bytes(r["payload"]), r["kind"])


# --- skew: mega-cluster censoring (r5 audit) ------------------------------


def test_phash_near_dups_mega_cluster_censored_and_reported(spark):
    # one asset duplicated 500x (over max_bucket=100): its buckets are
    # censored — the pigeonhole join stays bounded, normal planted
    # pairs are still found, and the census REPORTS what was dropped
    from pyspark.sql import functions as F

    from anomaly_detector_spark.operators.multimodal import (
        phash_block_rows,
        phash_near_dups,
        phash_oversized_buckets,
        synth_media,
        with_dhash,
    )

    base = synth_media(spark, 200, plant_every=25).select(
        "media_id", "kind", "payload"
    )
    clone = spark.range(500).select(
        (F.lit(10_000) + F.col("id")).alias("media_id"),
        F.lit("image").alias("kind"),
        F.sha2(F.lit("mega"), 256).cast("binary").alias("payload"),
    )
    c = base.unionByName(clone)
    pairs = {
        (r["media_id_a"], r["media_id_b"])
        for r in phash_near_dups(c, max_hamming=6, blocks=8, max_bucket=100).collect()
    }
    planted = {(k - 1, k) for k in range(24, 200, 25)}
    assert planted <= pairs
    assert not any(a >= 10_000 and b >= 10_000 for a, b in pairs)  # censored
    sigs = with_dhash(c).select(
        F.col("media_id").alias("_id"), F.col("phash").alias("_sig")
    )
    census = phash_oversized_buckets(phash_block_rows(sigs, 8), 100).collect()
    assert len(census) == 8  # the mega-cluster saturates all 8 blocks
    assert all(r["n_members"] >= 500 for r in census)


def test_incremental_blocks_mega_cluster_censored(spark):
    from pyspark.sql import functions as F

    from anomaly_detector_spark.operators.multimodal import (
        incremental_pairs_from_blocks,
        phash_block_rows,
        synth_media,
        with_dhash,
    )

    base = synth_media(spark, 100, plant_every=25).select(
        "media_id", "kind", "payload"
    )
    clone = spark.range(300).select(
        (F.lit(10_000) + F.col("id")).alias("media_id"),
        F.lit("image").alias("kind"),
        F.sha2(F.lit("mega"), 256).cast("binary").alias("payload"),
    )
    c = base.unionByName(clone)

    def blocked(pred):
        sigs = with_dhash(c.filter(pred)).select(
            F.col("media_id").alias("_id"), F.col("phash").alias("_sig")
        )
        return phash_block_rows(sigs, 8).localCheckpoint()

    new = blocked(F.col("media_id") % 2 == 1)
    old = blocked(F.col("media_id") % 2 == 0)
    pairs = {
        (r["media_id_a"], r["media_id_b"])
        for r in incremental_pairs_from_blocks(new, old, 6, max_bucket=100).collect()
    }
    planted = {(k - 1, k) for k in range(24, 100, 25)}
    assert planted <= pairs
    assert not any(a >= 10_000 and b >= 10_000 for a, b in pairs)
