"""Baseline JPEG codec tests (operators/jpeg.py).

The r4 verdict's top codec ask: real JPEG decode behind the existing
decode_image seam. Pinned here: exact round trip for constant blocks
(the oracle's exactness property), bounded error for arbitrary
content, cross-codec perceptual-hash agreement with PNG, honest
NotImplementedError variants, and corrupt-payload behavior.
"""

import random
import struct

import pytest

from anomaly_detector_spark.operators.jpeg import (
    NEAR_LOSSLESS_QT,
    decode_jpeg,
    encode_jpeg,
)
from anomaly_detector_spark.operators.multimodal import (
    decode_image,
    dhash64,
    encode_png,
    synth_media_jpeg,
    synth_media_mixed_jpeg,
)


def _quadrant_gray(vals):
    px = [0] * 256
    for q, (qy, qx) in enumerate([(0, 0), (0, 8), (8, 0), (8, 8)]):
        for y in range(8):
            for x in range(8):
                px[(qy + y) * 16 + (qx + x)] = vals[q]
    return px


def test_constant_block_round_trip_exact():
    # only a DC coefficient survives the FDCT of a constant block, and
    # the DC quant step of 8 divides 8*(v-128) for any byte v — the
    # exactness the SQL oracle relies on
    for vals in ([10, 200, 77, 145], [0, 255, 128, 1], [33, 33, 33, 33]):
        gray = _quadrant_gray(vals)
        w, h, dec = decode_jpeg(encode_jpeg(16, 16, gray))
        assert (w, h) == (16, 16) and dec == gray


def test_noise_round_trip_bounded_error():
    rng = random.Random(7)
    gray = [rng.randrange(256) for _ in range(256)]
    w, h, dec = decode_jpeg(encode_jpeg(16, 16, gray))
    assert (w, h) == (16, 16)
    assert max(abs(a - b) for a, b in zip(gray, dec)) <= 2


def test_non_multiple_of_8_dims_cropped():
    rng = random.Random(11)
    gray = [rng.randrange(256) for _ in range(9 * 8)]
    w, h, dec = decode_jpeg(encode_jpeg(9, 8, gray))
    assert (w, h) == (9, 8) and len(dec) == 72
    assert max(abs(a - b) for a, b in zip(gray, dec)) <= 2


def test_decode_image_dispatches_jpeg():
    gray = _quadrant_gray([9, 99, 199, 249])
    assert decode_image(encode_jpeg(16, 16, gray)) == (16, 16, gray)


def test_coarse_quant_table_still_decodes():
    # a lossier table (larger AC steps) must still decode; error grows
    # but the DC-only constant-block property is table-independent for
    # steps dividing 8*(v-128)... here just pin it runs and is close
    qt = [8] + [4] * 63
    rng = random.Random(3)
    gray = [rng.randrange(256) for _ in range(256)]
    w, h, dec = decode_jpeg(encode_jpeg(16, 16, gray, qtable=qt))
    assert (w, h) == (16, 16)
    assert max(abs(a - b) for a, b in zip(gray, dec)) <= 16


def test_unsupported_variants_raise_not_implemented():
    gray = _quadrant_gray([1, 2, 3, 4])
    payload = bytearray(encode_jpeg(16, 16, gray))
    sof = bytes(payload).index(b"\xff\xc0")
    # arithmetic-coded (SOF9): genuinely unsupported
    arith = bytearray(payload)
    arith[sof + 1] = 0xC9
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(arith))
    # SOF0 bytes relabeled SOF2: a baseline scan is not a valid
    # progressive scan script — CORRUPT, not stub (progressive itself
    # is supported since r5)
    prog = bytearray(payload)
    prog[sof + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(prog))
    # 4 components (CMYK-style): beyond the 1/3-component support
    # (offset +9: marker 2 + len 2 + precision 1 + height 2 + width 2)
    multi = bytearray(payload)
    multi[sof + 9] = 4
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(multi))
    # exotic sampling factors (3x3) on a single component
    samp = bytearray(payload)
    samp[sof + 11] = 0x33
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(samp))
    # not a JPEG at all
    with pytest.raises(NotImplementedError):
        decode_jpeg(b"no soi here")


def test_corrupt_jpeg_raises_corrupt_errors_and_dhash_nulls():
    gray = _quadrant_gray([1, 2, 3, 4])
    payload = encode_jpeg(16, 16, gray)
    truncated = payload[: len(payload) // 2]
    with pytest.raises((ValueError, struct.error, IndexError, KeyError)):
        decode_jpeg(truncated)
    # the dispatch hazard fix: a corrupt JPEG costs NULL, not the job,
    # and never falls to the byte path (every JFIF shares the header)
    assert dhash64(truncated) is None
    assert dhash64(payload) is not None


def test_cross_codec_jpeg_png_phash_agreement():
    # same pixels through the lossy JPEG round trip and the lossless
    # PNG one must land within hamming 2 — the planted-pair property
    # the media_jpeg_dups oracle relies on
    import hashlib

    def sha_pixels(tag):
        out = []
        for blk in range(8):
            out += hashlib.sha256(f"{tag}/{blk}".encode()).digest()
        return out[:256]

    px = sha_pixels("xcodec")
    hj = dhash64(encode_jpeg(16, 16, px))
    hp = dhash64(encode_png(16, 16, px))
    assert hj is not None and hp is not None
    assert bin((hj ^ hp) & ((1 << 64) - 1)).count("1") <= 2


def test_synth_media_jpeg_decodes_to_formula_quadrants(spark):
    import hashlib

    rows = synth_media_jpeg(spark, 12).collect()
    assert len(rows) == 12
    for r in rows:
        assert r["kind"] == "jpeg"
        w, h, dec = decode_image(bytes(r["payload"]))
        assert (w, h) == (16, 16)
        d = hashlib.sha256(f"jq{r['media_id']}".encode()).digest()
        assert dec == _quadrant_gray([d[0], d[1], d[2], d[3]])


def test_synth_media_mixed_planted_pairs_found(spark):
    from anomaly_detector_spark.operators.multimodal import phash_near_dups

    media = synth_media_mixed_jpeg(spark, 100, plant_every=25)
    pairs = {
        (r["media_id_a"], r["media_id_b"])
        for r in phash_near_dups(media, max_hamming=6, blocks=8).collect()
    }
    assert pairs == {(23, 24), (48, 49), (73, 74), (98, 99)}


# --- color (YCbCr, interleaved MCU) ---------------------------------------


def test_color_444_and_420_round_trip_luma():
    from anomaly_detector_spark.operators.jpeg import encode_jpeg_color

    rng = random.Random(5)
    w, h = 24, 16
    y = [rng.randrange(256) for _ in range(w * h)]
    cb = [rng.randrange(256) for _ in range(w * h)]
    cr = [rng.randrange(256) for _ in range(w * h)]
    for sub in ("444", "420"):
        W, H, dec = decode_jpeg(encode_jpeg_color(w, h, y, cb, cr, subsampling=sub))
        assert (W, H) == (w, h)
        assert max(abs(a - b) for a, b in zip(y, dec)) <= 2


def test_color_exact_quadrants_match_grayscale():
    # same luma through the gray writer and both color writers decodes
    # to identical exact pixels — color adds chroma blocks to step
    # over, never a different luma
    from anomaly_detector_spark.operators.jpeg import encode_jpeg_color

    gray = _quadrant_gray([10, 200, 77, 145])
    flat = [128] * 256
    _, _, d1 = decode_jpeg(encode_jpeg(16, 16, gray))
    _, _, d2 = decode_jpeg(encode_jpeg_color(16, 16, gray, flat, flat, "420"))
    _, _, d3 = decode_jpeg(encode_jpeg_color(16, 16, gray, flat, flat, "444"))
    assert d1 == d2 == d3 == gray


def test_color_odd_dims_420_cropped():
    from anomaly_detector_spark.operators.jpeg import encode_jpeg_color

    rng = random.Random(9)
    y = [rng.randrange(256) for _ in range(9 * 8)]
    c = [rng.randrange(256) for _ in range(9 * 8)]
    W, H, dec = decode_jpeg(encode_jpeg_color(9, 8, y, c, c, "420"))
    assert (W, H) == (9, 8)
    assert max(abs(a - b) for a, b in zip(y, dec)) <= 2


def test_synth_media_jpeg_color_decodes_to_formula_luma(spark):
    import hashlib

    from anomaly_detector_spark.operators.multimodal import synth_media_jpeg_color

    rows = synth_media_jpeg_color(spark, 9).collect()
    for r in rows:
        w, h, dec = decode_image(bytes(r["payload"]))
        d = hashlib.sha256(f"jc{r['media_id']}".encode()).digest()
        assert (w, h) == (16, 16)
        assert dec == _quadrant_gray([d[0], d[1], d[2], d[3]])


# --- restart intervals (DRI / RSTn) ---------------------------------------


def test_restart_intervals_round_trip_gray_and_color():
    from anomaly_detector_spark.operators.jpeg import encode_jpeg_color

    rng = random.Random(13)
    g = [rng.randrange(256) for _ in range(24 * 16)]
    for ri in (1, 3):
        payload = encode_jpeg(24, 16, g, restart_interval=ri)
        assert b"\xff\xdd" in payload and b"\xff\xd0" in payload
        _, _, dec = decode_jpeg(payload)
        assert max(abs(a - b) for a, b in zip(g, dec)) <= 2
    y = [rng.randrange(256) for _ in range(32 * 32)]
    c = [rng.randrange(256) for _ in range(32 * 32)]
    for ri in (1, 2):
        _, _, dec = decode_jpeg(
            encode_jpeg_color(32, 32, y, c, c, "420", restart_interval=ri)
        )
        assert max(abs(a - b) for a, b in zip(y, dec)) <= 2


def test_restart_intervals_keep_dc_exactness():
    gray = _quadrant_gray([10, 200, 77, 145])
    _, _, dec = decode_jpeg(encode_jpeg(16, 16, gray, restart_interval=2))
    assert dec == gray


def test_broken_restart_marker_is_corrupt():
    rng = random.Random(17)
    g = [rng.randrange(256) for _ in range(24 * 16)]
    pay = bytearray(encode_jpeg(24, 16, g, restart_interval=1))
    i = bytes(pay).find(b"\xff\xd0")
    pay[i + 1] = 0xD7  # out-of-order RST index
    with pytest.raises(ValueError):
        decode_jpeg(bytes(pay))
    assert dhash64(bytes(pay)) is None  # corrupt -> NULL, not the job


def test_color_422_round_trip_luma():
    from anomaly_detector_spark.operators.jpeg import encode_jpeg_color

    rng = random.Random(3)
    y = [rng.randrange(256) for _ in range(24 * 16)]
    c = [rng.randrange(256) for _ in range(24 * 16)]
    W, H, dec = decode_jpeg(encode_jpeg_color(24, 16, y, c, c, "422"))
    assert (W, H) == (24, 16)
    assert max(abs(a - b) for a, b in zip(y, dec)) <= 2
    # with restarts, odd dims
    W, H, dec = decode_jpeg(
        encode_jpeg_color(9, 8, y[:72], c[:72], c[:72], "422", restart_interval=1)
    )
    assert (W, H) == (9, 8)
    assert max(abs(a - b) for a, b in zip(y[:72], dec)) <= 2


# --- progressive (SOF2) ----------------------------------------------------


def test_progressive_bit_identical_to_baseline():
    # progressive transmits the SAME quantized coefficients, split
    # across scans — decode must match baseline decode exactly
    from anomaly_detector_spark.operators.jpeg import encode_jpeg_progressive

    rng = random.Random(42)
    for w, h in [(16, 16), (9, 8), (40, 33)]:
        g = [rng.randrange(256) for _ in range(w * h)]
        assert decode_jpeg(encode_jpeg_progressive(w, h, g)) == decode_jpeg(
            encode_jpeg(w, h, g)
        )
    # EOB-run-heavy cases: flat and sparse content
    flat = [77] * (32 * 24)
    assert decode_jpeg(encode_jpeg_progressive(32, 24, flat))[2] == flat
    sp = [100] * 1600
    for i in range(0, 1600, 173):
        sp[i] = 250
    assert decode_jpeg(encode_jpeg_progressive(40, 40, sp)) == decode_jpeg(
        encode_jpeg(40, 40, sp)
    )


def test_progressive_exact_quadrants_and_dispatch():
    from anomaly_detector_spark.operators.jpeg import encode_jpeg_progressive

    gray = _quadrant_gray([10, 200, 77, 145])
    payload = encode_jpeg_progressive(16, 16, gray)
    assert decode_image(payload) == (16, 16, gray)  # seam dispatch
    # perceptual hash agrees across baseline/progressive of same pixels
    assert dhash64(payload) == dhash64(encode_jpeg(16, 16, gray))


def test_progressive_corrupt_truncation_is_null():
    from anomaly_detector_spark.operators.jpeg import encode_jpeg_progressive

    rng = random.Random(4)
    g = [rng.randrange(256) for _ in range(256)]
    payload = encode_jpeg_progressive(16, 16, g)
    truncated = payload[: len(payload) * 2 // 3]
    with pytest.raises((ValueError, struct.error, IndexError, KeyError)):
        decode_jpeg(truncated)
    assert dhash64(truncated) is None


def test_progressive_color_luma_bit_identical_and_chroma_skipped():
    # color progressive: interleaved multi-component DC scans with
    # per-component predictors + the decoder's skip-chroma-AC-scan
    # shortcut; luma must come out bit-identical to the baseline gray
    # decode of the same plane
    from anomaly_detector_spark.operators.jpeg import encode_jpeg_progressive_color

    rng = random.Random(77)
    for sub in ("444", "422", "420"):
        for w, h in [(16, 16), (9, 8), (40, 33)]:
            y = [rng.randrange(256) for _ in range(w * h)]
            c = [rng.randrange(256) for _ in range(w * h)]
            assert decode_jpeg(
                encode_jpeg_progressive_color(w, h, y, c, c, sub)
            ) == decode_jpeg(encode_jpeg(w, h, y))
