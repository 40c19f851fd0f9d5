"""Decode-kernel throughput ceiling: assets/sec per pure-Python codec.

The r4 verdict asked for the fixture-grade decoders' measured ceiling
as a documented number, so the native-codec swap-in point (behind the
decode_image / decode_audio / decode_video seams in
operators/multimodal.py) is a fact, not vibes. Measures single-core
decode throughput per codec and the projected local[32] ceiling
(decode kernels parallelize embarrassingly across Arrow batches — the
32x projection was spot-checked against a mapInPandas run).

Usage: python tools/bench_codecs.py  [n_assets]
Prints one JSON line per codec and a markdown table for BASELINE.md.
"""

from __future__ import annotations

import hashlib
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from anomaly_detector_spark.operators.jpeg import (  # noqa: E402
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_color,
)
from anomaly_detector_spark.operators.multimodal import (  # noqa: E402
    decode_audio,
    decode_image,
    decode_video,
    encode_bmp,
    encode_gif,
    encode_png,
    encode_ppm,
    encode_wav,
)


def _pixels(tag: str, npx: int) -> list[int]:
    out: list[int] = []
    for blk in range((npx + 31) // 32):
        out += hashlib.sha256(f"{tag}/{blk}".encode()).digest()
    return out[:npx]


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    w, h = 64, 64  # more realistic than the 9x8 oracle fixtures
    npx = w * h
    cases = []
    for name, enc, dec in [
        ("bmp", encode_bmp, decode_image),
        ("ppm", encode_ppm, decode_image),
        ("png", encode_png, decode_image),
        ("jpeg", lambda W, H, px: encode_jpeg(W, H, px), decode_image),
        (
            "jpeg_420",
            lambda W, H, px: encode_jpeg_color(
                W, H, px, _pixels("cb", W * H), _pixels("cr", W * H), "420"
            ),
            decode_image,
        ),
    ]:
        payloads = [enc(w, h, _pixels(f"{name}{i}", npx)) for i in range(n)]
        cases.append((name, payloads, dec))
    wav_payloads = [
        encode_wav(16000, [v - 128 for v in _pixels(f"wav{i}", 16000)])
        for i in range(n)
    ]  # 1 second of audio per clip
    cases.append(("wav_1s", wav_payloads, decode_audio))
    gif_payloads = [
        encode_gif(w, h, [_pixels(f"gif{i}/{f}", npx) for f in range(4)])
        for i in range(n)
    ]
    cases.append(("gif_4f", gif_payloads, decode_video))

    print(f"| codec | asset | 1-core assets/s | local[32] ceiling (proj) |")
    print("|---|---|---|---|")
    rows = {}
    for name, payloads, dec in cases:
        t0 = time.time()
        for p in payloads:
            dec(p)
        dt = time.time() - t0
        rate = len(payloads) / dt
        rows[name] = round(rate, 1)
        desc = {
            "bmp": "64x64 gray", "ppm": "64x64 gray", "png": "64x64 gray",
            "jpeg": "64x64 gray baseline", "jpeg_420": "64x64 YCbCr 4:2:0",
            "wav_1s": "1 s 16 kHz PCM", "gif_4f": "64x64, 4 frames",
        }[name]
        print(f"| {name} | {desc} | {rate:,.1f} | {rate * 32:,.0f} |")
    print(json.dumps({"metric": "codec_assets_per_sec_1core", "rates": rows, "n": n}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
