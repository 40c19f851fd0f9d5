"""Real in-sandbox image codecs (operators/multimodal.py): BMP/PPM
encode-decode round trips, the decoded-pixel dHash path, and the
synth_media_images fixture family.

Closes the round-3 "decode is simulated" gap: these tests pin that
extract_image_features / dhash64 run on GENUINELY decoded pixels — a
decoder defect in stride, bottom-up row order, padding, or luma breaks
the exact round-trip assertions here (and the DuckDB oracles, which
derive ground-truth pixels from the sha256 formula without parsing the
container).
"""

import hashlib
import random

import pytest

from anomaly_detector_spark.operators.multimodal import (
    decode_image,
    dhash64,
    dhash64_pixels,
    encode_bmp,
    encode_ppm,
    extract_image_features,
    synth_media_images,
)


def _sha_pixels(mid: int, npx: int = 72) -> list[int]:
    out: list[int] = []
    for blk in range((npx + 31) // 32):
        out += hashlib.sha256(f"px{mid}/{blk}".encode()).digest()
    return out[:npx]


@pytest.mark.parametrize("enc", [encode_bmp, encode_ppm])
@pytest.mark.parametrize("dims", [(9, 8), (18, 16), (5, 3), (1, 1), (2, 7)])
def test_encode_decode_round_trip_exact(enc, dims):
    # R=G=B encoding + integer BT.601 luma (weights sum to 1000) make the
    # round trip EXACT — including BMP's bottom-up rows and 4-byte padding
    # (width 5 and 1 exercise nonzero pad; 2x7 an odd stride).
    w, h = dims
    rng = random.Random(w * 100 + h)
    px = [rng.randrange(256) for _ in range(w * h)]
    assert decode_image(enc(w, h, px)) == (w, h, px)


def test_decode_rejects_unknown_container():
    # no known magic at all: the retained stub path
    with pytest.raises(NotImplementedError):
        decode_image(b"ID3\x04\x00 not an image container")
    # JPEG is REAL now (r5, operators/jpeg.py) — a header-only fragment
    # is a CORRUPT payload (ValueError), not a stub refusal
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0\x00\x10JFIF....")
    # truncated PNG (signature without chunks) refuses, not crashes
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n....")


def test_dhash_cross_codec_identical_and_edit_bounded():
    px = _sha_pixels(3)
    h_bmp = dhash64(encode_bmp(9, 8, px))
    h_ppm = dhash64(encode_ppm(9, 8, px))
    # same pixels, different container -> identical perceptual hash
    assert h_bmp == h_ppm
    # one-pixel edit touches at most the 2 adjacent comparisons
    for j in (0, 30, 71):
        edited = list(px)
        edited[j] = (edited[j] + 128) % 256
        ham = bin((h_bmp ^ dhash64(encode_ppm(9, 8, edited))) & ((1 << 64) - 1)).count("1")
        assert ham <= 2


def test_dhash_resize_area_average_equivalence():
    # a 2x-replicated 18x16 image area-averages back to the 9x8 original
    px = _sha_pixels(11)
    big = [0] * (18 * 16)
    for y in range(16):
        for x in range(18):
            big[y * 18 + x] = px[(y // 2) * 9 + x // 2]
    assert dhash64_pixels(18, 16, big) == dhash64_pixels(9, 8, px)
    assert dhash64(encode_bmp(18, 16, big)) == dhash64(encode_ppm(9, 8, px))


def test_dhash_byte_fallback_unchanged_for_hex_payloads():
    # sha256-hex payloads can't start with BM/P6/P5 -> byte path; value
    # pinned so the legacy fixtures (and their oracles) stay stable
    payload = hashlib.sha256(b"payload0").hexdigest().encode()
    assert dhash64(payload) == 6527676635744518809
    assert dhash64(None) is None
    # degenerate media hash to NULL, not a shared constant: hashing
    # empty payloads and frame-less GIFs to 0 clustered unrelated broken
    # assets as hamming-0 "perfect dups" (r4 advice)
    assert dhash64(b"") is None


def test_synth_media_images_decodes_to_formula_pixels(spark):
    rows = synth_media_images(spark, 12).collect()
    assert len(rows) == 12
    for r in rows:
        expected_kind = {0: "bmp", 1: "ppm", 2: "png"}[r["media_id"] % 3]
        assert r["kind"] == expected_kind
        w, h, gray = decode_image(bytes(r["payload"]))
        assert (w, h) == (9, 8)
        assert gray == _sha_pixels(r["media_id"])


def test_synth_media_images_planted_cross_codec_near_dup(spark):
    rows = {r["media_id"]: bytes(r["payload"]) for r in synth_media_images(spark, 50, plant_every=25).collect()}
    # planted row 24 carries row 23's pixels (one bumped), but is encoded
    # in ITS OWN container (24 -> bmp, source 23 -> zlib-deflated png):
    # bytes differ entirely, decoded dHash lands within hamming 2
    assert rows[24][:2] == b"BM" and rows[23][:8] == b"\x89PNG\r\n\x1a\n"
    ham = bin((dhash64(rows[24]) ^ dhash64(rows[23])) & ((1 << 64) - 1)).count("1")
    assert ham <= 2
    # an unrelated pair sits far away
    far = bin((dhash64(rows[10]) ^ dhash64(rows[37])) & ((1 << 64) - 1)).count("1")
    assert far > 6


def test_extract_image_features_runs_on_decoded_pixels(spark):
    feats = {r["media_id"]: r for r in extract_image_features(synth_media_images(spark, 20)).collect()}
    assert len(feats) == 20
    for mid, r in feats.items():
        gray = _sha_pixels(mid)
        buckets = [0] * 8
        for v in gray:
            buckets[v >> 5] += 1
        assert (r["width"], r["height"], r["n_pixels"]) == (9, 8, 72)
        for i in range(8):
            assert r[f"f{i}"] == round(buckets[i] / 72, 6)


def test_png_round_trip_and_cross_codec_hash(spark=None):
    from anomaly_detector_spark.operators.multimodal import encode_png

    for dims in [(9, 8), (17, 5), (1, 1)]:
        w, h = dims
        rng = random.Random(w * 31 + h)
        px = [rng.randrange(256) for _ in range(w * h)]
        assert decode_image(encode_png(w, h, px)) == (w, h, px)
    px = _sha_pixels(5)
    # same pixels in three containers -> one perceptual hash
    assert (
        dhash64(encode_png(9, 8, px))
        == dhash64(encode_bmp(9, 8, px))
        == dhash64(encode_ppm(9, 8, px))
    )


def test_png_all_filters_and_rgb_luma():
    import struct
    import zlib

    from anomaly_detector_spark.operators.multimodal import _luma

    rng = random.Random(11)

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    w, h, ch = 6, 5, 3
    rgb = [tuple(rng.randrange(256) for _ in range(3)) for _ in range(w * h)]
    raw, prev = bytearray(), bytes(w * ch)
    for y in range(h):
        ft = [0, 1, 2, 3, 4][y % 5]  # exercise every scanline filter
        line = bytes(c for p in rgb[y * w : (y + 1) * w] for c in p)
        enc = bytearray(line)
        for i in range(len(line) - 1, -1, -1):
            a = line[i - ch] if i >= ch else 0
            up = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if ft == 1:
                enc[i] = (line[i] - a) & 0xFF
            elif ft == 2:
                enc[i] = (line[i] - up) & 0xFF
            elif ft == 3:
                enc[i] = (line[i] - ((a + up) >> 1)) & 0xFF
            elif ft == 4:
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                enc[i] = (line[i] - pred) & 0xFF
        raw.append(ft)
        raw += enc
        prev = line
    sig = b"\x89PNG\r\n\x1a\n"
    png = (
        sig
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert decode_image(png) == (w, h, [_luma(*p) for p in rgb])
    # interlaced PNGs stay on the stub path
    bad = sig + chunk(
        b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 1)
    ) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        decode_image(bad)


def test_incremental_phash_pairs_parity_with_full_batch(spark, tmp_path):
    # ingest cycles of real bmp/ppm/png media with planted near-dups;
    # the union of incremental pairs over all runs must equal full-batch
    # phash_near_dups over the whole corpus, cross-batch plants surface
    # as new_old, and compaction (family phash_blocks) between cycles
    # must not change later runs
    from anomaly_detector_spark.operators.multimodal import (
        incremental_phash_pairs,
        phash_near_dups,
        synth_media_images,
    )
    from anomaly_detector_spark.plans.stores import compact_store

    store = str(tmp_path / "phash_store")
    full = synth_media_images(spark, 150, plant_every=25).localCheckpoint()
    # split at id 74 so the (73, 74) planted pair crosses the boundary
    batches = [
        full.filter("media_id < 74"),
        full.filter("media_id >= 74"),
    ]

    got = set()
    kinds = {}
    for k, batch in enumerate(batches):
        for r in incremental_phash_pairs(spark, batch, store, f"r{k}").collect():
            got.add(
                (r["media_id_a"], r["media_id_b"], r["phash_a"], r["phash_b"], r["hamming"])
            )
            kinds[(r["media_id_a"], r["media_id_b"])] = r["pair_kind"]
        if k == 0:
            compact_store(spark, store, "phash_blocks")

    expect = {
        (r["media_id_a"], r["media_id_b"], r["phash_a"], r["phash_b"], r["hamming"])
        for r in phash_near_dups(full, max_hamming=6, blocks=8).collect()
    }
    assert got == expect and len(got) == 6  # plants at 24,49,74,99,124,149
    assert kinds[(73, 74)] == "new_old"  # crosses the ingest boundary
    assert kinds[(23, 24)] == "new_new" and kinds[(148, 149)] == "new_new"
    # crash-retry with the same run id after the first append: the
    # returned pairs for run r1 are exactly the run-1 pairs again
    again = {
        (r["media_id_a"], r["media_id_b"])
        for r in incremental_phash_pairs(spark, batches[1], store, "r1").collect()
    }
    assert again == {(a, b) for (a, b, *_) in got if b >= 74}


def test_wav_round_trip_and_stub():
    from anomaly_detector_spark.operators.multimodal import decode_audio, encode_wav

    rng = random.Random(9)
    for n in (64, 1, 7):  # odd data lengths exercise word alignment
        s = [rng.randrange(-32768, 32768) for _ in range(n)]
        assert decode_audio(encode_wav(16000, s)) == (16000, s)
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04\x00mp3....")
    with pytest.raises(NotImplementedError):
        decode_audio(b"RIFF\x00\x00\x00\x00AVI ....")  # RIFF but not WAVE


def test_audio_sign_hash_edit_bound_and_reencode_invariance():
    from anomaly_detector_spark.operators.multimodal import (
        decode_audio,
        encode_wav,
        sign_hash64,
    )

    rng = random.Random(13)
    s = [rng.randrange(-32768, 32768) for _ in range(64)]
    h = sign_hash64(s)
    # re-encode at a different sample rate: samples identical -> same hash
    assert sign_hash64(decode_audio(encode_wav(8000, s))[1]) == h
    for pos in (0, 30, 63):
        s2 = list(s)
        s2[pos] = max(-32768, min(32767, s2[pos] + 9000))
        ham = bin((h ^ sign_hash64(s2)) & ((1 << 64) - 1)).count("1")
        assert ham <= 2


def test_extract_audio_features_matches_hand_computation(spark):
    import math

    from anomaly_detector_spark.operators.multimodal import (
        decode_audio,
        extract_audio_features,
        synth_media_audio,
    )

    media = synth_media_audio(spark, 10, n_samples=64)
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    feats = {r["media_id"]: r for r in extract_audio_features(media).collect()}
    for mid, payload in payloads.items():
        rate, samples = decode_audio(payload)
        assert rate == 16000 and len(samples) == 64
        r = feats[mid]
        assert r["rms"] == round(math.sqrt(sum(s * s for s in samples) / 64) / 32768.0, 6)
        zc = sum(
            1
            for i in range(63)
            if (samples[i] >= 0) != (samples[i + 1] >= 0)
        )
        assert r["zcr"] == round(zc / 64, 6)
        assert abs(sum(r[f"a{i}"] for i in range(8)) - 1.0) < 1e-5


def test_phash_near_dups_works_on_audio_via_sign_fingerprint(spark):
    # dhash64 dispatches WAV payloads to the decoded-waveform sign hash;
    # the SAME pigeonhole block join finds planted audio near-dups, and
    # the shared RIFF header cannot fake similarity (byte path never runs)
    from anomaly_detector_spark.operators.multimodal import (
        phash_near_dups,
        synth_media_audio,
    )

    media = synth_media_audio(spark, 200, plant_every=25)
    pairs = {
        (r["media_id_a"], r["media_id_b"]): r["hamming"]
        for r in phash_near_dups(media, max_hamming=6, blocks=8).collect()
    }
    expect = {(k - 1, k) for k in range(24, 200, 25)}
    assert set(pairs) == expect
    assert all(h <= 2 for h in pairs.values())


def test_gif_round_trip_and_stub():
    from anomaly_detector_spark.operators.multimodal import decode_video, encode_gif

    rng = random.Random(21)
    frames = [[rng.randrange(256) for _ in range(72)] for _ in range(3)]
    assert decode_video(encode_gif(9, 8, frames)) == (9, 8, frames)
    # multi-subblock + periodic CLEAR codes (larger than one 255B block)
    big = [[rng.randrange(256) for _ in range(40 * 30)] for _ in range(2)]
    assert decode_video(encode_gif(40, 30, big))[2] == big
    with pytest.raises(NotImplementedError):
        decode_video(b"\x00\x00\x01\xb3mpeg....")


def test_gif_extension_blocks_and_delta_frames():
    # hand-built GIF89a: a graphic-control extension (skipped), a full
    # first frame, then a 3x2 sub-rectangle second image — the decoder
    # must render the delta onto the persistent canvas
    import struct

    from anomaly_detector_spark.operators.multimodal import (
        _gif_lzw_encode_uncompressed,
        decode_video,
    )

    rng = random.Random(23)
    w, h = 9, 8
    f0 = [rng.randrange(256) for _ in range(w * h)]
    patch = [rng.randrange(256) for _ in range(3 * 2)]

    def img_block(left, top, iw, ih, pixels):
        out = bytearray(b"\x2c" + struct.pack("<HHHH", left, top, iw, ih) + b"\x00")
        out.append(8)
        data = _gif_lzw_encode_uncompressed(8, pixels)
        for off in range(0, len(data), 255):
            blk = data[off : off + 255]
            out.append(len(blk))
            out += blk
        out.append(0)
        return bytes(out)

    gif = bytearray(b"GIF89a" + struct.pack("<HH", w, h) + bytes((0xF7, 0, 0)))
    for v in range(256):
        gif += bytes((v, v, v))
    gif += b"\x21\xf9\x04\x00\x0a\x00\x00\x00"  # graphic control ext
    gif += img_block(0, 0, w, h, f0)
    gif += img_block(4, 3, 3, 2, patch)  # delta frame
    gif += b"\x3b"

    gw, gh, frames = decode_video(bytes(gif))
    assert (gw, gh) == (w, h) and len(frames) == 2
    assert frames[0] == f0
    expect = list(f0)
    for y in range(2):
        for x in range(3):
            expect[(3 + y) * w + (4 + x)] = patch[y * 3 + x]
    assert frames[1] == expect


def test_extract_video_frames_matches_decode(spark):
    from anomaly_detector_spark.operators.multimodal import (
        decode_video,
        dhash64_pixels,
        extract_video_frames,
        synth_media_video,
    )

    media = synth_media_video(spark, 6, n_frames=3)
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    got = {
        (r["media_id"], r["frame_idx"]): r["phash"]
        for r in extract_video_frames(media).collect()
    }
    assert len(got) == 18
    for mid, payload in payloads.items():
        w, h, frames = decode_video(payload)
        for fi, fr in enumerate(frames):
            assert got[(mid, fi)] == dhash64_pixels(w, h, fr)
    # every_n sampling keeps frames 0 and 2 only
    sampled = {
        r["frame_idx"] for r in extract_video_frames(media, every_n=2).collect()
    }
    assert sampled == {0, 2}


def test_video_frame_overlap_pairs_finds_planted_copies_only(spark):
    from anomaly_detector_spark.operators.multimodal import (
        synth_media_video,
        video_frame_overlap_pairs,
    )

    media = synth_media_video(spark, 100, n_frames=4, plant_every=25)
    pairs = {
        (r["media_id_a"], r["media_id_b"]): r
        for r in video_frame_overlap_pairs(media, min_shared=2).collect()
    }
    assert set(pairs) == {(23, 24), (48, 49), (73, 74), (98, 99)}
    for r in pairs.values():
        assert r["n_shared_frames"] == 3  # one frame replaced
        assert r["overlap_frac"] == 0.75
        assert r["n_frames_a"] == r["n_frames_b"] == 4
    # clean corpus: no pairs at all
    assert video_frame_overlap_pairs(synth_media_video(spark, 60, n_frames=4)).count() == 0


def test_audio_segment_overlap_pairs_finds_planted_copies(spark):
    from anomaly_detector_spark.operators.multimodal import (
        audio_segment_overlap_pairs,
        synth_media_audio,
    )

    media = synth_media_audio(spark, 100, n_samples=64, plant_every=25)
    pairs = {
        (r["media_id_a"], r["media_id_b"]): r
        for r in audio_segment_overlap_pairs(media, segment_len=16, min_shared=2).collect()
    }
    planted = {(23, 24), (48, 49), (73, 74), (98, 99)}
    assert planted <= set(pairs)
    for key in planted:
        r = pairs[key]
        # one edited sample kills AT MOST one 16-sample window (a bump
        # that preserves the window's sign pattern kills none)
        assert r["n_shared_segments"] >= 3
        assert r["overlap_frac"] in (0.75, 1.0)
        assert r["n_segments_a"] == r["n_segments_b"] == 4


def test_dhash_dispatches_gif_to_first_frame_pixels(spark):
    # unrelated GIFs share magic + screen descriptor + the 768-byte
    # palette: the byte path would pair everything. First-frame pixel
    # dispatch keeps unrelated clips far apart and a first-frame-
    # sharing copy identical.
    from anomaly_detector_spark.operators.multimodal import (
        decode_video,
        dhash64,
        dhash64_pixels,
        phash_near_dups,
        synth_media_video,
    )

    media = synth_media_video(spark, 40, n_frames=3)
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    h0 = dhash64(payloads[0])
    w, h, frames = decode_video(payloads[0])
    assert h0 == dhash64_pixels(w, h, frames[0])
    far = bin((h0 ^ dhash64(payloads[7])) & ((1 << 64) - 1)).count("1")
    assert far > 6
    # a clean GIF corpus produces NO near-dup pairs (the header cannot
    # fake similarity)
    assert phash_near_dups(media, max_hamming=6, blocks=8).count() == 0
