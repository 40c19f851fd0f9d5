"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a
metadata struct; decode/feature steps run as Arrow-batched pandas
iterators over ``mapInPandas`` so each Python worker sees columnar
batches, never one row at a time. Decode is REAL for BMP (24-bit
BI_RGB), binary PPM/PGM, PNG (8-bit, stdlib-zlib inflate + defilter),
baseline JPEG (SOF0 grayscale — operators/jpeg.py), animated GIF and
16-bit mono PCM WAV — pure-Python parsers, no codec libraries needed —
so features and perceptual hashes run on genuinely decoded
pixels/samples; JPEG covers baseline gray + YCbCr color
(4:4:4/4:2:2/4:2:0, restart markers) AND progressive (SOF2: spectral
selection + DC successive approximation). The remaining compressed
codecs (mp3/ogg, h264) and the progressive AC-successive-approximation
slice keep the documented NotImplementedError stub path.

These interpreted-Python decoders are fixture-grade: the measured
throughput ceiling per codec (and the ~100-1000x native swap-in behind
the decode_image/decode_audio/decode_video seams) is documented in
BASELINE.md "Decode-kernel throughput ceiling" and measured by
tools/bench_codecs.py.
"""

from __future__ import annotations

import struct
import sys
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.errors import AnalysisException
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

# What a malformed-but-magic-matching payload can raise out of the
# pure-Python decoders: truncated BMP/PPM rasters -> ValueError or
# IndexError, corrupt PNG IDAT -> zlib.error, short WAV fmt chunk ->
# struct.error, bad GIF code tables -> IndexError/KeyError. Kernels
# treat any of these as "this one asset is corrupt" (NULL/skip), never
# letting one bad payload fail a whole batch job or streaming query.
# NotImplementedError stays separate: it is the DOCUMENTED stub-path
# contract for containers the sandbox cannot decode (mp3, h264,
# JPEG's AC-successive-approximation slice), and extract_* keeps
# propagating it so callers must filter
# to decodable kinds deliberately.
CORRUPT_ERRORS = (ValueError, struct.error, zlib.error, IndexError, KeyError)
DECODE_ERRORS = (NotImplementedError,) + CORRUPT_ERRORS

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


# --- real in-sandbox image codecs (pure Python, no libraries) -------------
#
# Closes the "decode is simulated" gap: BMP (24-bit uncompressed BI_RGB,
# the classic 54-byte header) and binary PPM/PGM (P6/P5) are simple
# enough to parse without codec libraries — and PNG needs only stdlib
# zlib — so fixture payloads are REAL encoded images and the
# feature/dHash paths run on genuinely decoded pixels. Exotic codecs
# (JPEG/audio/video) still raise NotImplementedError — the stub path.


def _luma(r: int, g: int, b: int) -> int:
    # integer BT.601 luma; weights sum to 1000, so R=G=B=v decodes to
    # exactly v (what makes the SQL oracles derivable from the pixel
    # formula without float rounding)
    return (299 * r + 587 * g + 114 * b) // 1000


def encode_bmp(width: int, height: int, gray: list[int]) -> bytes:
    """24-bit uncompressed BI_RGB BMP of a grayscale image (R=G=B).

    ``gray`` is row-major top-down; BMP stores rows bottom-up with each
    row padded to 4 bytes — the decoder must undo both."""
    row_raw = width * 3
    pad = (4 - row_raw % 4) % 4
    img_size = (row_raw + pad) * height
    header = (
        b"BM"
        + (54 + img_size).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + width.to_bytes(4, "little")
        + height.to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB
        + img_size.to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    body = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        for x in range(width):
            v = gray[y * width + x] & 0xFF
            body += bytes((v, v, v))  # BGR, equal channels
        body += b"\x00" * pad
    return header + bytes(body)


def encode_ppm(width: int, height: int, gray: list[int]) -> bytes:
    """Binary PPM (P6, maxval 255) of a grayscale image (R=G=B)."""
    header = f"P6\n{width} {height}\n255\n".encode()
    body = bytearray()
    for v in gray:
        v &= 0xFF
        body += bytes((v, v, v))
    return header + bytes(body)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(width: int, height: int, gray: list[int]) -> bytes:
    """8-bit grayscale PNG (color type 0, filter 0 rows, zlib-deflated)
    — a REAL PNG any viewer opens; stdlib zlib only."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter type None
        raw += bytes(v & 0xFF for v in gray[y * width : (y + 1) * width])
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _decode_png(b: bytes) -> tuple[int, int, list[int]]:
    """Pure-Python PNG decode: 8-bit gray/gray+alpha/RGB/RGBA,
    non-interlaced, all five scanline filters (None/Sub/Up/Average/
    Paeth). zlib inflates the IDAT stream; everything else is the PNG
    spec's byte arithmetic."""
    import struct
    import zlib

    if b[: len(_PNG_SIG)] != _PNG_SIG:
        raise NotImplementedError("not a PNG signature")
    pos, width = len(_PNG_SIG), None
    idat = bytearray()
    height = bitdepth = colortype = interlace = None
    while pos + 8 <= len(b):
        (ln,) = struct.unpack(">I", b[pos : pos + 4])
        tag = b[pos + 4 : pos + 8]
        body = b[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # len + tag + body + crc
        if tag == b"IHDR":
            width, height, bitdepth, colortype, _c, _f, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None:
        raise NotImplementedError("PNG missing IHDR")
    if bitdepth != 8 or interlace != 0:
        raise NotImplementedError("only 8-bit non-interlaced PNG supported")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(colortype)
    if channels is None:
        raise NotImplementedError(f"unsupported PNG color type {colortype}")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    prev = bytearray(stride)
    gray = [0] * (width * height)
    off = 0
    for y in range(height):
        ft = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        off += 1 + stride
        for i in range(stride):
            a = line[i - channels] if i >= channels else 0  # left
            up = prev[i]
            if ft == 1:
                line[i] = (line[i] + a) & 0xFF
            elif ft == 2:
                line[i] = (line[i] + up) & 0xFF
            elif ft == 3:
                line[i] = (line[i] + ((a + up) >> 1)) & 0xFF
            elif ft == 4:
                c = prev[i - channels] if i >= channels else 0  # upper-left
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
            elif ft != 0:
                raise NotImplementedError(f"unknown PNG filter {ft}")
        prev = line
        for x in range(width):
            px = line[x * channels : (x + 1) * channels]
            if channels >= 3:
                gray[y * width + x] = _luma(px[0], px[1], px[2])
            else:
                gray[y * width + x] = px[0]
    return width, height, gray


def decode_image(payload: bytes) -> tuple[int, int, list[int]]:
    """Decode a BMP (24-bit BI_RGB), binary PPM/PGM, PNG (8-bit
    gray/LA/RGB/RGBA non-interlaced — stdlib zlib inflate + defilter),
    or baseline JPEG (SOF0 grayscale — operators/jpeg.py: Huffman
    decode, dequant, IDCT) payload to ``(width, height, grayscale
    row-major top-down)``.

    Raises NotImplementedError for any other container or variant
    (mp3, h264, JPEG's AC-successive-approximation slice) — the
    retained stub path for codecs this sandbox cannot host."""
    b = bytes(payload)
    if b[: len(_PNG_SIG)] == _PNG_SIG:
        return _decode_png(b)
    if b[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(b)
    if b[:2] == b"BM":
        if len(b) < 54:
            raise NotImplementedError("truncated BMP header")
        off = int.from_bytes(b[10:14], "little")
        hdr = int.from_bytes(b[14:18], "little")
        width = int.from_bytes(b[18:22], "little", signed=True)
        height = int.from_bytes(b[22:26], "little", signed=True)
        bpp = int.from_bytes(b[28:30], "little")
        comp = int.from_bytes(b[30:34], "little")
        if hdr < 40 or bpp != 24 or comp != 0:
            raise NotImplementedError("only 24-bit BI_RGB BMP supported")
        top_down = height < 0
        height = abs(height)
        row_raw = width * 3
        stride = row_raw + (4 - row_raw % 4) % 4
        gray = [0] * (width * height)
        for row in range(height):
            y = row if top_down else height - 1 - row
            base = off + row * stride
            for x in range(width):
                bb, gg, rr = b[base + 3 * x : base + 3 * x + 3]
                gray[y * width + x] = _luma(rr, gg, bb)
        return width, height, gray
    if b[:2] in (b"P6", b"P5"):
        # header: magic, width, height, maxval — whitespace/comment
        # separated, then a single whitespace byte before the raster
        fields, i = [], 2
        while len(fields) < 3:
            while i < len(b) and b[i : i + 1].isspace():
                i += 1
            if b[i : i + 1] == b"#":
                while i < len(b) and b[i] != 0x0A:
                    i += 1
                continue
            j = i
            while j < len(b) and not b[j : j + 1].isspace():
                j += 1
            fields.append(int(b[i:j]))
            i = j
        i += 1  # the single whitespace after maxval
        width, height, maxval = fields
        if maxval != 255:
            raise NotImplementedError("only maxval-255 PPM/PGM supported")
        n = width * height
        if b[:2] == b"P5":
            return width, height, [b[i + k] for k in range(n)]
        gray = [0] * n
        for k in range(n):
            rr, gg, bb = b[i + 3 * k : i + 3 * k + 3]
            gray[k] = _luma(rr, gg, bb)
        return width, height, gray
    raise NotImplementedError("unsupported media container (stub path)")


def _resize_area(width: int, height: int, gray: list[int], ow: int, oh: int) -> list[int]:
    """Integer area-average downscale to ``ow x oh`` (box filter over the
    source cells each output pixel covers; exact mean via // when the
    scale divides evenly — the fixture case)."""
    out = [0] * (ow * oh)
    for oy in range(oh):
        y0, y1 = oy * height // oh, max((oy + 1) * height // oh, oy * height // oh + 1)
        for ox in range(ow):
            x0, x1 = ox * width // ow, max((ox + 1) * width // ow, ox * width // ow + 1)
            s = 0
            for y in range(y0, y1):
                for x in range(x0, x1):
                    s += gray[y * width + x]
            out[oy * ow + ox] = s // ((y1 - y0) * (x1 - x0))
    return out


def dhash64_pixels(width: int, height: int, gray: list[int]) -> int:
    """dHash over decoded pixels: resize to 9x8 (area average) unless
    already 9x8, then bit (y*8+x) = pixel[y][x] > pixel[y][x+1], packed
    little-endian into a signed 64-bit value."""
    if (width, height) != (9, 8):
        gray = _resize_area(width, height, gray, 9, 8)
    h = 0
    for y in range(8):
        for x in range(8):
            if gray[y * 9 + x] > gray[y * 9 + x + 1]:
                h |= 1 << (y * 8 + x)
    if h >= 1 << 63:
        h -= 1 << 64
    return h


def synth_media_images(
    spark, n_rows: int, plant_every: int | None = None, width: int = 9, height: int = 8
) -> DataFrame:
    """Deterministic REAL-image media table: payload = an actual encoded
    BMP (id % 3 == 0), binary PPM (id % 3 == 1), or zlib-deflated PNG
    (id % 3 == 2) whose grayscale pixel at row-major index ``idx`` is
    byte ``idx % 32`` of ``sha256('px' + id + '/' + idx//32)`` —
    sha-derived (so unrelated images sit at dHash hamming >= 11; a
    polynomial-mod-256 formula is far too structured) yet re-derivable
    in any SQL engine via hex-char arithmetic, no container parsing
    needed (the oracle derives PIXELS, so even the compressed PNG path
    is exactly checkable).

    ``plant_every``: every k-th row (id % k == k-1, id > 0) carries the
    PIXELS of row id-1 with the single pixel at idx = id % (w*h) bumped
    by +128 (mod 256) — but encoded in this row's own container, which
    usually differs from the source's. The planted ground truth is
    therefore a CROSS-CODEC near-duplicate: byte-level comparison sees
    nothing, while the decoded dHash lands within hamming 2.
    """
    npx = width * height

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def raw_pixels(src: int) -> list[int]:
            out: list[int] = []
            for blk in range((npx + 31) // 32):
                out += hashlib.sha256(f"px{src}/{blk}".encode()).digest()
            return out[:npx]

        def pixels(mid: int) -> list[int]:
            if plant_every is not None and mid % plant_every == plant_every - 1 and mid > 0:
                px = raw_pixels(mid - 1)
                j = mid % npx
                px[j] = (px[j] + 128) % 256
                return px
            return raw_pixels(mid)

        for pdf in batches:
            rows = []
            encoders = {
                0: ("bmp", encode_bmp),
                1: ("ppm", encode_ppm),
                2: ("png", encode_png),
            }
            for mid in pdf["id"]:
                mid = int(mid)
                px = pixels(mid)
                kind, enc = encoders[mid % 3]
                payload = enc(width, height, px)
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "payload": payload,
                        "meta": {
                            "width": width,
                            "height": height,
                            "sample_rate": None,
                            "duration_ms": None,
                            "codec": kind,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n_rows).mapInPandas(kernel, MEDIA_SCHEMA)


def synth_media_jpeg(
    spark, n_rows: int, plant_every: int | None = None, progressive: bool = False
) -> DataFrame:
    """Deterministic REAL-JPEG media table for the exact-oracle path:
    each payload is an actual baseline grayscale JPEG (operators/
    jpeg.py) of a 16x16 image whose four 8x8 quadrants are CONSTANT,
    quadrant q's value = hex-pair q of ``sha256('jq' + id)`` — so the
    full decode pipeline (Huffman + dequant + IDCT) round-trips EXACTLY
    (constant blocks carry only a DC coefficient; the near-lossless
    table's DC step 8 makes round(8(v-128)/8)*8 lossless for any v) and
    a DuckDB oracle can derive the ground-truth pixels from the sha
    formula without modeling the DCT. Any decoder defect — wrong
    Huffman table, zigzag slip, IDCT scaling — lands whole quadrants on
    wrong values and hash-fails immediately.

    ``plant_every``: every k-th row (id % k == k-1, id > 0) carries row
    id-1's quadrant values with quadrant (id % 4) bumped +128 mod 256.

    ``progressive``: encode the SAME pixels as multi-scan progressive
    (SOF2) files — decode is pinned bit-identical to baseline, so the
    same formula oracle certifies the progressive path.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from .jpeg import encode_jpeg, encode_jpeg_progressive

        enc = encode_jpeg_progressive if progressive else encode_jpeg

        def quads(mid: int) -> list[int]:
            d = hashlib.sha256(f"jq{mid}".encode()).digest()
            return [d[0], d[1], d[2], d[3]]

        def gray(mid: int) -> list[int]:
            if plant_every is not None and mid % plant_every == plant_every - 1 and mid > 0:
                v = quads(mid - 1)
                v[mid % 4] = (v[mid % 4] + 128) % 256
            else:
                v = quads(mid)
            px = [0] * 256
            for q, (qy, qx) in enumerate([(0, 0), (0, 8), (8, 0), (8, 8)]):
                for y in range(8):
                    for x in range(8):
                        px[(qy + y) * 16 + (qx + x)] = v[q]
            return px

        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                rows.append(
                    {
                        "media_id": mid,
                        "kind": "jpeg",
                        "payload": enc(16, 16, gray(mid)),
                        "meta": {
                            "width": 16,
                            "height": 16,
                            "sample_rate": None,
                            "duration_ms": None,
                            "codec": "jpeg-progressive" if progressive else "jpeg",
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n_rows).mapInPandas(kernel, MEDIA_SCHEMA)


def synth_media_jpeg_color(spark, n_rows: int) -> DataFrame:
    """COLOR (YCbCr 4:2:0 interleaved-MCU) twin of synth_media_jpeg:
    the container shape of virtually every real-world JPEG. The luma
    plane is the same quadrant-constant sha formula (tag 'jc'), so the
    exact-DC oracle still derives ground truth; the CHROMA planes carry
    sha-derived noise (tag 'jcc') — real nonzero AC data the decoder
    must entropy-decode and step over correctly, or luma comes out
    garbled and the oracle hash-fails. Decoded gray == Y (JPEG's Y is
    BT.601 luma)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from .jpeg import encode_jpeg_color

        def quads(mid: int) -> list[int]:
            d = hashlib.sha256(f"jc{mid}".encode()).digest()
            return [d[0], d[1], d[2], d[3]]

        def planes(mid: int) -> tuple[list[int], list[int], list[int]]:
            v = quads(mid)
            y = [0] * 256
            for q, (qy, qx) in enumerate([(0, 0), (0, 8), (8, 0), (8, 8)]):
                for yy in range(8):
                    for xx in range(8):
                        y[(qy + yy) * 16 + (qx + xx)] = v[q]
            d = hashlib.sha256(f"jcc{mid}".encode()).digest()
            cb = [d[k % 32] for k in range(256)]
            cr = [d[(k + 7) % 32] for k in range(256)]
            return y, cb, cr

        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                y, cb, cr = planes(mid)
                rows.append(
                    {
                        "media_id": mid,
                        "kind": "jpeg",
                        "payload": encode_jpeg_color(16, 16, y, cb, cr, "420"),
                        "meta": {
                            "width": 16,
                            "height": 16,
                            "sample_rate": None,
                            "duration_ms": None,
                            "codec": "jpeg-ycbcr420",
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n_rows).mapInPandas(kernel, MEDIA_SCHEMA)


def synth_media_mixed_jpeg(
    spark, n_rows: int, plant_every: int | None = None
) -> DataFrame:
    """Deterministic mixed JPEG/PNG media table for cross-codec near-dup
    detection: 16x16 sha-noise pixels (byte idx%32 of
    ``sha256('jp' + id + '/' + idx//32)``), encoded as baseline JPEG
    (even ids) or PNG (odd ids). JPEG is lossy — the near-lossless
    table bounds decode error to ~±1/pixel — so planted pairs are found
    ONLY by hashing genuinely decoded pixels: measured over 1000
    fixtures, planted pairs sit at dHash hamming <= 2 and the closest
    unrelated pair at 11 (threshold 6 splits them with margin).

    ``plant_every``: every k-th row (id % k == k-1, id > 0) carries row
    id-1's pixels with pixel idx = id % 256 bumped +128 mod 256,
    encoded in this row's own container — every planted pair is
    JPEG-vs-PNG (parities differ), the hard cross-codec case."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from .jpeg import encode_jpeg

        def raw_pixels(src: int) -> list[int]:
            out: list[int] = []
            for blk in range(8):
                out += hashlib.sha256(f"jp{src}/{blk}".encode()).digest()
            return out[:256]

        def pixels(mid: int) -> list[int]:
            if plant_every is not None and mid % plant_every == plant_every - 1 and mid > 0:
                px = raw_pixels(mid - 1)
                j = mid % 256
                px[j] = (px[j] + 128) % 256
                return px
            return raw_pixels(mid)

        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                px = pixels(mid)
                if mid % 2 == 0:
                    kind, payload = "jpeg", encode_jpeg(16, 16, px)
                else:
                    kind, payload = "png", encode_png(16, 16, px)
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "payload": payload,
                        "meta": {
                            "width": 16,
                            "height": 16,
                            "sample_rate": None,
                            "duration_ms": None,
                            "codec": kind,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n_rows).mapInPandas(kernel, MEDIA_SCHEMA)


IMAGE_FEATURE_SCHEMA = (
    "media_id long, kind string, width int, height int, n_pixels long, "
    + ", ".join(f"f{i} double" for i in range(8))
)


def extract_image_features(df: DataFrame) -> DataFrame:
    """Decoded-pixel feature extraction: REALLY decodes each payload
    (BMP/PPM/PGM via :func:`decode_image`) and emits the 8-bucket
    grayscale histogram (bucket = gray >> 5) as fractions, plus decoded
    dimensions. Arrow-batched mapInPandas; unsupported containers
    propagate NotImplementedError (the stub path) — callers filter to
    decodable kinds first — but a CORRUPT payload inside a recognized
    container (truncated raster, bad IDAT: ``CORRUPT_ERRORS``) emits a
    NULL-feature row instead of failing the whole batch job (r4
    advice)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                try:
                    w, h, gray = decode_image(payload)
                except CORRUPT_ERRORS:
                    rows.append(
                        {
                            "media_id": int(mid),
                            "kind": kind,
                            "width": None,
                            "height": None,
                            "n_pixels": None,
                            **{f"f{i}": None for i in range(8)},
                        }
                    )
                    continue
                buckets = [0] * 8
                for v in gray:
                    buckets[v >> 5] += 1
                n = max(len(gray), 1)
                row = {
                    "media_id": int(mid),
                    "kind": kind,
                    "width": w,
                    "height": h,
                    "n_pixels": len(gray),
                }
                for i in range(8):
                    row[f"f{i}"] = round(buckets[i] / n, 6)
                rows.append(row)
            yield pd.DataFrame(rows)

    return df.mapInPandas(kernel, IMAGE_FEATURE_SCHEMA)


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

# Declared-kind vocabulary -> decode modality. synth fixtures declare
# codec names ("bmp"/"ppm"/"png"/"wav"/"gif"); real catalogs declare
# modalities ("image"/"audio"/"video"); both dispatch the same.
_IMAGE_KINDS = frozenset({"image", "bmp", "ppm", "pgm", "png", "jpeg", "jpg"})
_AUDIO_KINDS = frozenset({"audio", "wav", "pcm16"})
_VIDEO_KINDS = frozenset({"video", "gif"})


def _sniff_modality(b: bytes) -> str | None:
    """Container magic -> decode modality (None = no known magic)."""
    if (
        b[:2] in (b"BM", b"P6", b"P5")
        or b[: len(_PNG_SIG)] == _PNG_SIG
        or b[:2] == b"\xff\xd8"  # JPEG SOI
    ):
        return "image"
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "audio"
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return "video"
    return None


def _dispatch_modality(b: bytes, kind: str | None) -> str | None:
    """The hardened dhash64 dispatch decision: which decoder family (if
    any) this payload takes. None = the byte path. A decoder is chosen
    only when the declared kind (which outranks sniffing; an explicit
    non-media kind pins the byte path) and the container magic AGREE."""
    sniffed = _sniff_modality(b)
    if kind is None:
        return sniffed
    k = str(kind).lower()
    if k in _IMAGE_KINDS:
        declared = "image"
    elif k in _AUDIO_KINDS:
        declared = "audio"
    elif k in _VIDEO_KINDS:
        declared = "video"
    else:
        return None
    return declared if sniffed == declared else None


def dhash64(payload: bytes | None, kind: str | None = None) -> int | None:
    """Scalar dHash. Payloads in a supported container (BMP 24-bit,
    binary PPM/PGM, PNG, baseline JPEG) are REALLY decoded —
    :func:`decode_image` — and hashed over their pixels
    (:func:`dhash64_pixels`: area-resize to 9x8, one bit per
    adjacent-pixel comparison); WAV payloads hash the decoded
    waveform's sign-of-delta fingerprint; GIF payloads hash the decoded
    first frame. Anything else falls back to the byte-comparison dHash:
    bit i = payload[i % n] > payload[(i+1) % n], packed little-endian
    into one SIGNED long (two's complement — the same value any engine
    gets from the same bits). NULL -> NULL.

    Dispatch (hardened per the r4 advice): the DECLARED ``kind`` wins
    when given — magic sniffing runs only as fallback — so an
    adversarial text payload whose leading bytes collide with a magic
    (e.g. text starting "BM") never reaches the image decoder when its
    catalog row declares otherwise. A decoder is attempted only when
    declaration and magic AGREE (byte fixtures like synth_media declare
    image/audio/video over sha-hex payloads; no magic -> byte path,
    exactly as before).

    A payload whose container IS recognized but does not decode —
    corrupt bytes (``CORRUPT_ERRORS``) or an unsupported variant
    (stereo WAV, interlaced GIF: NotImplementedError) — returns NULL
    rather than falling to the byte path: every WAV shares the 44-byte
    RIFF header and every GIF its magic + screen descriptor + palette,
    so header-dominated byte comparisons would fake near-dup pairs
    between unrelated clips (and PNGs share sig + IHDR prefix bytes the
    same way). NULL signatures are dropped by the block join, excluding
    the asset from pairing. Degenerate media — empty payloads,
    frame-less GIFs — also return NULL for the same reason: hashing
    them to a common constant (the old 0) clustered unrelated broken
    assets as hamming-0 "perfect dups".

    Edit-distance property (what makes it a NEAR-dup hash): a one-pixel
    (or, byte path with n >= 64, one-byte) edit touches exactly the two
    adjacent comparisons, so hamming <= 2; shorter byte payloads wrap,
    relaxing the bound to 2*ceil(64/n) (pinned by a hypothesis
    property). Pixel-path hashes survive re-encoding: the same pixels
    in a BMP, a PPM and a PNG hash identically (cross-codec near-dup
    test)."""
    if payload is None:
        return None
    b = bytes(payload)
    n = len(b)
    if n == 0:
        return None
    modality = _dispatch_modality(b, kind)
    if modality is not None:
        try:
            if modality == "image":
                return dhash64_pixels(*decode_image(b))
            if modality == "audio":
                samples = decode_audio(b)[1]
                return sign_hash64(samples) if samples else None
            w, h, frames = decode_video(b)
            return dhash64_pixels(w, h, frames[0]) if frames else None
        except DECODE_ERRORS:
            return None  # recognized container, undecodable -> exclude
    h = 0
    for i in range(DHASH_BITS):
        if b[i % n] > b[(i + 1) % n]:
            h |= 1 << i
    if h >= 1 << 63:  # two's complement into a signed long
        h -= 1 << 64
    return h


def dhash64_bytes_batch(payloads: list[bytes]) -> "list[int]":
    """Vectorized byte-path dHash over a batch of payloads: one numpy
    comparison matrix per length group instead of a Python loop per
    byte — the first thing to fall at scale after decode itself (r4
    verdict #8). Semantics identical to the scalar byte path (pinned by
    test): bit i = b[i % n] > b[(i+1) % n], little-endian signed 64."""
    import numpy as np

    out: list[int] = [0] * len(payloads)
    by_len: dict[int, list[int]] = {}
    for j, p in enumerate(payloads):
        by_len.setdefault(len(p), []).append(j)
    idx = np.arange(64)
    for n, rows in by_len.items():
        # ONE buffer join + reshape per length group: per-payload
        # frombuffer/stack costs as much as the scalar loop (measured)
        mat = np.frombuffer(
            b"".join(payloads[j] for j in rows), dtype=np.uint8
        ).reshape(len(rows), n)
        if n >= 65:
            # contiguous slices, no gather copy
            bits = mat[:, :64] > mat[:, 1:65]
        else:
            bits = mat[:, idx % n] > mat[:, (idx + 1) % n]
        # little-endian packbits IS the bit-packing convention: bit i of
        # output byte j = bits[:, j*8 + i]; 8 bytes view as signed 64
        hashes = np.ascontiguousarray(
            np.packbits(bits, axis=1, bitorder="little")
        ).view("<i8")[:, 0]
        for j, h in zip(rows, hashes):
            out[j] = int(h)
    return out


def with_dhash(df: DataFrame, out_col: str = "phash") -> DataFrame:
    """64-bit dHash per media row (Arrow-batched mapInPandas; this
    module is registered pickle-by-value — no --py-files footgun).
    When the frame carries a ``kind`` column it is passed through as
    the declared kind, so dispatch never relies on magic sniffing alone
    (see dhash64's hardened-dispatch note).

    Rows on the BYTE path (no decoder dispatched) are hashed with the
    numpy-vectorized :func:`dhash64_bytes_batch`; decode-path rows call
    the scalar :func:`dhash64` (decode dominates there anyway)."""

    out_schema = ", ".join(
        f"{name} {typ}" for name, typ in df.dtypes
    ) + f", {out_col} long"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            kinds = pdf["kind"] if "kind" in pdf.columns else None
            n_rows = len(pdf)
            hashes: list = [None] * n_rows
            byte_rows: list[int] = []
            byte_payloads: list[bytes] = []
            for i, p in enumerate(pdf["payload"]):
                if p is None:
                    continue
                b = bytes(p)
                if not b:
                    continue
                k = kinds.iloc[i] if kinds is not None else None
                if _dispatch_modality(b, k) is None:
                    byte_rows.append(i)
                    byte_payloads.append(b)
                else:
                    hashes[i] = dhash64(b, k)
            if byte_rows:
                for i, h in zip(byte_rows, dhash64_bytes_batch(byte_payloads)):
                    hashes[i] = h
            out[out_col] = pd.array(hashes, dtype="Int64")
            yield out

    return df.mapInPandas(kernel, out_schema)


def phash_block_rows(sigs: DataFrame, blocks: int = 8) -> DataFrame:
    """Pigeonhole block rows for a (_id, _sig) signature frame: one row
    per (id, block) with the block's bit-slice as the join key — shared
    by the batch self-join and the incremental store."""
    width = DHASH_BITS // blocks
    return sigs.select(
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


def phash_oversized_buckets(
    blocked: DataFrame, max_bucket: int
) -> DataFrame:
    """Censoring census for the pigeonhole join: (block_idx, block_val,
    n_members) of every bucket past ``max_bucket``. This is how capping
    is REPORTED, not just applied — operators surface it so a silent
    mega-cluster (one asset duplicated millions of times) shows up as a
    loud census row instead of quietly missing pairs. Members of a
    censored bucket are near-identical by construction, so the cheap
    exact path (files_dup_keys / exact sha dedup) is the right tool for
    them — the r4 t-digest lesson applied to media."""
    return (
        blocked.groupBy("block_idx", "block_val")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .filter(F.col("n_members") > max_bucket)
    )


def phash_near_dups(
    df: DataFrame,
    max_hamming: int = 6,
    blocks: int = 8,
    id_col: str = "media_id",
    materialize: bool = True,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Near-duplicate media pairs by dHash hamming distance.

    Same pigeonhole geometry as operators/dedup.py simhash_near_dups:
    split the 64-bit signature into ``blocks`` chunks — any pair within
    ``max_hamming`` (< blocks) differing bits shares at least one exact
    chunk — bucket-join per chunk, then the exact bit_count(xor) filter.
    Cost is O(sum bucket^2) on 8-byte keys, never all-pairs; the
    payload column is pruned before the exchange (only id + sig ride
    the shuffle).

    ``max_bucket`` (r5 skew audit): buckets larger than this are
    dropped from pair generation — the dedup.py LSH discipline. Without
    it one mega-cluster (an asset duplicated k times shares ALL blocks)
    costs O(k^2 x blocks) join rows: measured, 20k copies = 3.2e9
    pre-filter rows. Censored members are near-identical, so exact
    dedup covers them cheaply; use :func:`phash_oversized_buckets` on
    :func:`phash_block_rows` output to REPORT what was censored.

    ``materialize``: eagerly localCheckpoint the 16-byte (id, sig)
    frame before the self-join — without it both join sides re-run the
    Python decode kernel (the plan shows TWO MapInPandas nodes), which
    at corpus scale doubles the expensive half of the job. Same rule as
    dedup.py's banded/containment stores."""
    if max_hamming >= blocks:
        raise ValueError("pigeonhole requires max_hamming < blocks")
    cols = [id_col, "payload"] + (["kind"] if "kind" in df.columns else [])
    sigs = with_dhash(df.select(*cols)).select(
        F.col(id_col).alias("_id"), F.col("phash").alias("_sig")
    )
    if materialize:
        sigs = sigs.localCheckpoint()
    blocked = phash_block_rows(sigs, blocks)
    oversized = phash_oversized_buckets(blocked, max_bucket).select(
        "block_idx", "block_val"
    )
    blocked = blocked.join(
        F.broadcast(oversized), ["block_idx", "block_val"], "left_anti"
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


def incremental_phash_pairs(
    spark,
    new_media: DataFrame,
    store_dir: str,
    run_id: str,
    max_hamming: int = 6,
    blocks: int = 8,
    id_col: str = "media_id",
    commit: bool = True,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Cross-run perceptual near-dup pairs: new media vs themselves AND
    every earlier run — the media member of the incremental-store family
    (operators/dedup.py incremental_lsh_candidates for MinHash bands,
    incremental_containment_pairs for winnow fingerprints).

    The persisted artifact is the pigeonhole block assignment
    (media_id, block_idx, block_val, phash, run_id): ``blocks`` rows of
    four longs per asset — bytes-per-asset is FIXED no matter how large
    the decoded media is, so the store stays a vanishing fraction of
    corpus bytes. Each increment decodes/hashes ONLY the new batch and
    equi-joins its block rows against the store; earlier media are never
    re-decoded. Same commit protocol as the band store: append (with
    run_id) before compute, old side filters ``run_id != this run``, so
    a crash-retry with the same run_id is safe and retry-duplicated rows
    collapse via the deterministic-row dedupe on read (block rows are a
    pure function of payload). plans/stores.py compaction: family
    'phash_blocks'.

    Returns (media_id_a, media_id_b, phash_a, phash_b, hamming,
    pair_kind) with hamming <= max_hamming and at least one side new
    this run; pair_kind 'new_new' | 'new_old'. The union over all runs
    equals full-batch :func:`phash_near_dups` over the whole corpus
    (pinned by test)."""
    if max_hamming >= blocks:
        raise ValueError("pigeonhole requires max_hamming < blocks")
    cols = [id_col, "payload"] + (["kind"] if "kind" in new_media.columns else [])
    sigs = with_dhash(new_media.select(*cols)).select(
        F.col(id_col).alias("_id"), F.col("phash").alias("_sig")
    )
    blocked_new = phash_block_rows(sigs, blocks).localCheckpoint()

    if commit:
        (
            blocked_new.select(
                F.col("_id").alias("media_id"),
                "block_idx",
                "block_val",
                F.col("_sig").alias("phash"),
                F.lit(run_id).alias("run_id"),
            )
            .write.mode("append")
            .parquet(store_dir)
        )

    try:
        old = (
            spark.read.parquet(store_dir)
            .filter(F.col("run_id") != F.lit(run_id))
            .select(
                F.col("media_id").alias("_id"),
                F.col("phash").alias("_sig"),
                "block_idx",
                "block_val",
            )
            .dropDuplicates(["_id", "block_idx"])  # retry-appended rows identical
        )
    except AnalysisException:  # first run: store path absent (or commit=False);
        # any OTHER read failure (corrupt store, FS error) must fail loudly —
        # swallowing it would silently drop every new_old pair (r4 advice)
        old = blocked_new.filter(F.lit(False))

    return incremental_pairs_from_blocks(blocked_new, old, max_hamming, max_bucket)


def incremental_pairs_from_blocks(
    blocked_new: DataFrame,
    blocked_old: DataFrame,
    max_hamming: int = 6,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Pure-plan core of incremental_phash_pairs: near-dup pairs touching
    the new side. Both inputs are (_id, _sig, block_idx, block_val)
    frames (phash_block_rows shape); exposed separately so the
    store-free form is query/oracle-testable (the
    incremental_pairs_from_bands precedent, operators/dedup.py).

    ``max_bucket``: oversized-bucket census over the UNION (so
    degenerate buckets are capped consistently on both sides — the
    bands-twin discipline); censored buckets are reportable via
    :func:`phash_oversized_buckets`."""
    all_rows = blocked_new.unionByName(blocked_old)
    oversized = phash_oversized_buckets(all_rows, max_bucket).select(
        "block_idx", "block_val"
    )
    blocked_new = blocked_new.join(
        F.broadcast(oversized), ["block_idx", "block_val"], "left_anti"
    )
    blocked_old = blocked_old.join(
        F.broadcast(oversized), ["block_idx", "block_val"], "left_anti"
    )

    def pairs(left, right, kind, anti_self):
        j = left.alias("a").join(
            right.alias("b"), on=["block_idx", "block_val"], how="inner"
        )
        j = j.filter(
            F.col("a._id") < F.col("b._id")
            if anti_self
            else F.col("a._id") != F.col("b._id")
        )
        return (
            j.select(
                F.least(F.col("a._id"), F.col("b._id")).alias("media_id_a"),
                F.greatest(F.col("a._id"), F.col("b._id")).alias("media_id_b"),
                F.when(F.col("a._id") < F.col("b._id"), F.col("a._sig"))
                .otherwise(F.col("b._sig"))
                .alias("phash_a"),
                F.when(F.col("a._id") < F.col("b._id"), F.col("b._sig"))
                .otherwise(F.col("a._sig"))
                .alias("phash_b"),
                F.bit_count(F.col("a._sig").bitwiseXOR(F.col("b._sig"))).alias(
                    "hamming"
                ),
            )
            .filter(F.col("hamming") <= max_hamming)
            .dropDuplicates(["media_id_a", "media_id_b"])
            .withColumn("pair_kind", F.lit(kind))
        )

    return pairs(blocked_new, blocked_new, "new_new", anti_self=True).unionByName(
        pairs(blocked_new, blocked_old, "new_old", anti_self=False)
    )


# --- real audio codec (RIFF/WAVE PCM, pure Python) -------------------------
#
# The audio twin of the image codecs: 16-bit mono PCM WAV is a plain
# struct layout (RIFF header + fmt + data chunks), so audio fixtures are
# REAL playable files and the feature/fingerprint paths run on genuinely
# decoded samples. Compressed audio (mp3/ogg/aac) stays on the
# NotImplementedError stub path.


def encode_wav(sample_rate: int, samples: list[int]) -> bytes:
    """16-bit mono PCM RIFF/WAVE — a real WAV any player opens."""
    import struct

    data = b"".join(struct.pack("<h", max(-32768, min(32767, s))) for s in samples)
    byte_rate = sample_rate * 2
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, byte_rate, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_audio(payload: bytes) -> tuple[int, list[int]]:
    """Decode a 16-bit mono PCM WAV to (sample_rate, samples).

    Raises NotImplementedError for any other container/codec — the
    audio stub path."""
    import struct

    b = bytes(payload)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise NotImplementedError("unsupported audio container (stub path)")
    pos, sample_rate, data = 12, None, None
    while pos + 8 <= len(b):
        tag = b[pos : pos + 4]
        (ln,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        body = b[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            audio_fmt, channels, sample_rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise NotImplementedError("only 16-bit mono PCM WAV supported")
        elif tag == b"data":
            data = body
    if sample_rate is None or data is None:
        raise NotImplementedError("WAV missing fmt/data chunk")
    n = len(data) // 2
    return sample_rate, list(struct.unpack(f"<{n}h", data[: 2 * n]))


def sign_hash64(samples: list[int]) -> int:
    """64-bit sign-of-delta audio fingerprint: bit i = samples[i+1] >
    samples[i] (wraparound for short clips), packed little-endian signed
    — the waveform twin of the image dHash: a one-sample edit flips at
    most the two adjacent comparisons, re-encoding (container changes)
    flips none, so the SAME pigeonhole block machinery
    (phash_block_rows / incremental_pairs_from_blocks) finds near-dup
    audio."""
    n = len(samples)
    if n == 0:
        return 0
    h = 0
    for i in range(DHASH_BITS):
        if samples[(i + 1) % n] > samples[i % n]:
            h |= 1 << i
    if h >= 1 << 63:
        h -= 1 << 64
    return h


AUDIO_FEATURE_SCHEMA = (
    "media_id long, sample_rate int, n_samples long, rms double, zcr double, "
    + ", ".join(f"a{i} double" for i in range(8))
)


def extract_audio_features(df: DataFrame) -> DataFrame:
    """Decoded-sample audio features: RMS (of the full-scale fraction),
    zero-crossing rate, and the 8-bucket |amplitude| histogram
    (bucket = |s| >> 12) — Arrow-batched mapInPandas over REALLY decoded
    WAV samples."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    rate, samples = decode_audio(payload)
                except CORRUPT_ERRORS:  # corrupt WAV: NULL row, don't fail the job
                    rows.append(
                        {
                            "media_id": int(mid),
                            "sample_rate": None,
                            "n_samples": None,
                            "rms": None,
                            "zcr": None,
                            **{f"a{i}": None for i in range(8)},
                        }
                    )
                    continue
                n = max(len(samples), 1)
                ss = sum(s * s for s in samples)
                zc = sum(
                    1
                    for i in range(len(samples) - 1)
                    if (samples[i] >= 0) != (samples[i + 1] >= 0)
                )
                buckets = [0] * 8
                for s in samples:
                    buckets[min(abs(s) >> 12, 7)] += 1
                row = {
                    "media_id": int(mid),
                    "sample_rate": rate,
                    "n_samples": len(samples),
                    "rms": round(math.sqrt(ss / n) / 32768.0, 6),
                    "zcr": round(zc / n, 6),
                }
                for i in range(8):
                    row[f"a{i}"] = round(buckets[i] / n, 6)
                rows.append(row)
            yield pd.DataFrame(rows)

    return df.mapInPandas(kernel, AUDIO_FEATURE_SCHEMA)


def synth_media_audio(
    spark,
    n_rows: int,
    n_samples: int = 64,
    sample_rate: int = 16000,
    plant_every: int | None = None,
) -> DataFrame:
    """Deterministic REAL-audio media table: payload = an actual 16-bit
    mono PCM WAV whose sample at index ``idx`` is
    ``(byte-pair idx of the sha256('au' + id + '/' + idx//16) stream)
    - 32768`` — sha-derived yet re-derivable in SQL via hex-char
    arithmetic (the synth_media_images discipline for waveforms).

    ``plant_every``: every k-th clip (id % k == k-1, id > 0) carries
    clip id-1's samples with the single sample at idx = id % n_samples
    bumped +9000 (clamped) — the planted near-dup ground truth for the
    sign-of-delta fingerprint (hamming <= 2)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def raw_samples(mid: int) -> list[int]:
            out: list[int] = []
            for blk in range((n_samples + 15) // 16):
                d = hashlib.sha256(f"au{mid}/{blk}".encode()).digest()
                for k in range(16):
                    out.append(d[2 * k] * 256 + d[2 * k + 1] - 32768)
            return out[:n_samples]

        def samples(mid: int) -> list[int]:
            if plant_every is not None and mid % plant_every == plant_every - 1 and mid > 0:
                s = raw_samples(mid - 1)
                j = mid % n_samples
                s[j] = max(-32768, min(32767, s[j] + 9000))
                return s
            return raw_samples(mid)

        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                rows.append(
                    {
                        "media_id": mid,
                        "kind": "wav",
                        "payload": encode_wav(sample_rate, samples(mid)),
                        "meta": {
                            "width": None,
                            "height": None,
                            "sample_rate": sample_rate,
                            "duration_ms": n_samples * 1000 // sample_rate,
                            "codec": "pcm16",
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n_rows).mapInPandas(kernel, MEDIA_SCHEMA)


# --- real video codec (animated GIF, pure Python LZW) ----------------------
#
# The video member of the codec family: GIF87a/89a is a public container
# whose raster is plain LZW — implementable without any library — so
# "video" fixtures are REAL animated files and FRAME SAMPLING genuinely
# decodes frames (frame_sample_plan was the plan-only precursor).
# Compressed true-video codecs (h264 etc.) stay on the stub path.


def _gif_lzw_decode(min_code: int, data: bytes) -> list[int]:
    """LZW decode of a GIF image data stream (codes packed LSB-first)."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    out: list[int] = []
    dictionary: list[list[int]] = []

    def reset():
        nonlocal dictionary, width
        dictionary = [[i] for i in range(1 << min_code)] + [[], []]
        width = min_code + 1

    width = min_code + 1
    reset()
    acc = bits = 0
    prev: list[int] | None = None
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == end:
                return out
            if code < len(dictionary) and (code < clear or dictionary[code]):
                entry = dictionary[code]
            elif code == len(dictionary) and prev is not None:
                entry = prev + [prev[0]]
            else:
                raise NotImplementedError("corrupt GIF LZW stream")
            out.extend(entry)
            if prev is not None and len(dictionary) < 4096:
                dictionary.append(prev + [entry[0]])
                if len(dictionary) == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return out


def _gif_lzw_encode_uncompressed(min_code: int, pixels: list[int]) -> bytes:
    """Valid-but-uncompressed GIF LZW stream: literal codes with a CLEAR
    every 250 symbols so the code width never grows past min_code+1 —
    the classic library-free GIF writer."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    acc = bits = 0
    out = bytearray()

    def emit(code: int):
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    emit(clear)
    for i, p in enumerate(pixels):
        if i and i % 250 == 0:
            emit(clear)
        emit(p)
    emit(end)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(width: int, height: int, frames: list[list[int]]) -> bytes:
    """Animated GIF89a of grayscale frames (256-entry gray palette,
    full-frame images, uncompressed LZW) — a real GIF any viewer plays."""
    import struct

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes((0xF7, 0, 0))  # global 256-color table, bg 0, aspect 0
    for v in range(256):
        out += bytes((v, v, v))
    for frame in frames:
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
        out.append(8)  # LZW min code size
        data = _gif_lzw_encode_uncompressed(8, [v & 0xFF for v in frame])
        for off in range(0, len(data), 255):
            blk = data[off : off + 255]
            out.append(len(blk))
            out += blk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


def decode_video(payload: bytes) -> tuple[int, int, list[list[int]]]:
    """Decode an animated GIF to (width, height, [grayscale frame, ...]).

    Supports GIF87a/89a, global/local color tables, non-interlaced
    images; each image descriptor renders onto the persistent canvas
    (disposal 'do not dispose'), and every rendered state is one frame.
    Raises NotImplementedError for other containers — the video stub
    path."""
    import struct

    b = bytes(payload)
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError("unsupported video container (stub path)")
    width, height = struct.unpack("<HH", b[6:10])
    packed, _bg, _aspect = b[10], b[11], b[12]
    pos = 13
    global_table: list[int] | None = None
    if packed & 0x80:
        n = 2 ** ((packed & 0x07) + 1)
        global_table = [
            _luma(b[pos + 3 * i], b[pos + 3 * i + 1], b[pos + 3 * i + 2])
            for i in range(n)
        ]
        pos += 3 * n
    canvas = [0] * (width * height)
    frames: list[list[int]] = []
    while pos < len(b):
        tag = b[pos]
        pos += 1
        if tag == 0x3B:  # trailer
            break
        if tag == 0x21:  # extension: label + sub-blocks
            pos += 1
            while b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
            continue
        if tag != 0x2C:
            raise NotImplementedError(f"unknown GIF block 0x{tag:02x}")
        left, top, w, h = struct.unpack("<HHHH", b[pos : pos + 8])
        ipacked = b[pos + 8]
        pos += 9
        if ipacked & 0x40:
            raise NotImplementedError("interlaced GIF unsupported")
        table = global_table
        if ipacked & 0x80:
            n = 2 ** ((ipacked & 0x07) + 1)
            table = [
                _luma(b[pos + 3 * i], b[pos + 3 * i + 1], b[pos + 3 * i + 2])
                for i in range(n)
            ]
            pos += 3 * n
        if table is None:
            raise NotImplementedError("GIF image without a color table")
        min_code = b[pos]
        pos += 1
        data = bytearray()
        while b[pos] != 0:
            ln = b[pos]
            data += b[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _gif_lzw_decode(min_code, bytes(data))
        for y in range(h):
            for x in range(w):
                canvas[(top + y) * width + (left + x)] = table[idx[y * w + x]]
        frames.append(list(canvas))
    return width, height, frames


VIDEO_FRAME_SCHEMA = "media_id long, frame_idx int, width int, height int, phash long"


def extract_video_frames(df: DataFrame, every_n: int = 1) -> DataFrame:
    """REAL frame sampling: decode each video payload (animated GIF),
    keep every ``every_n``-th frame, and emit its decoded-pixel dHash —
    one row per sampled frame, Arrow-batched mapInPandas. The realized
    form of ``frame_sample_plan`` (which plans the fan-out without
    decoding); per-frame hashes feed the same pigeonhole near-dup
    machinery as images and audio."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, frames = decode_video(payload)
                except CORRUPT_ERRORS:  # corrupt GIF: no frames, don't fail the job
                    continue
                for fi in range(0, len(frames), every_n):
                    rows.append(
                        {
                            "media_id": int(mid),
                            "frame_idx": fi,
                            "width": w,
                            "height": h,
                            "phash": dhash64_pixels(w, h, frames[fi]),
                        }
                    )
            yield pd.DataFrame(rows)

    return df.mapInPandas(kernel, VIDEO_FRAME_SCHEMA)


def synth_media_video(
    spark,
    n_rows: int,
    n_frames: int = 4,
    width: int = 9,
    height: int = 8,
    plant_every: int | None = None,
) -> DataFrame:
    """Deterministic REAL-video media table: payload = an actual animated
    GIF whose frame f's pixel at row-major idx is byte idx%32 of
    ``sha256('vid' + id + '/' + f + '/' + idx//32)`` — the image/audio
    sha-formula discipline extended with a frame axis, so per-frame
    derivations (dHash, features) are re-derivable in SQL.

    ``plant_every``: every k-th clip (id % k == k-1, id > 0) carries
    clip id-1's frames with the single frame at index id % n_frames
    replaced by its OWN formula frame — the planted ground truth for
    frame-overlap detection (shares n_frames-1 frames with its
    source)."""
    npx = width * height

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def frame(mid: int, f: int) -> list[int]:
            out: list[int] = []
            for blk in range((npx + 31) // 32):
                out += hashlib.sha256(f"vid{mid}/{f}/{blk}".encode()).digest()
            return out[:npx]

        def clip(mid: int) -> list[list[int]]:
            if plant_every is not None and mid % plant_every == plant_every - 1 and mid > 0:
                fs = [frame(mid - 1, f) for f in range(n_frames)]
                fs[mid % n_frames] = frame(mid, mid % n_frames)
                return fs
            return [frame(mid, f) for f in range(n_frames)]

        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                payload = encode_gif(width, height, clip(mid))
                rows.append(
                    {
                        "media_id": mid,
                        "kind": "gif",
                        "payload": payload,
                        "meta": {
                            "width": width,
                            "height": height,
                            "sample_rate": None,
                            "duration_ms": n_frames * 100,
                            "codec": "gif",
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n_rows).mapInPandas(kernel, MEDIA_SCHEMA)


def video_frame_overlap_pairs(
    df: DataFrame,
    min_shared: int = 2,
    every_n: int = 1,
    id_col: str = "media_id",
    materialize: bool = True,
) -> DataFrame:
    """Clip pairs sharing decoded frames — the VIDEO twin of the
    document containment check (operators/dedup.py containment_pairs):
    a re-encoded / trimmed / lightly-edited copy of a clip shares most
    of its per-frame dHashes even when the container bytes share
    nothing.

    One decode pass (``extract_video_frames``), then an equi-self-join
    on the 8-byte frame hash — never all-pairs over clips, and the
    payload column is pruned before any exchange. Returns
    (media_id_a, media_id_b, n_shared_frames, n_frames_a, n_frames_b,
    overlap_frac) for pairs sharing >= ``min_shared`` sampled frames,
    where overlap_frac = shared / min(n_a, n_b) (the containment
    convention: a short clip fully inside a long one scores 1.0).

    ``materialize`` eagerly localCheckpoints the (id, frame hash) frame
    so the join's two sides and the per-clip counts reuse ONE decode
    (three consumers otherwise re-run the Python kernel)."""
    frames = extract_video_frames(
        df.select(F.col(id_col).alias("media_id"), "payload"), every_n=every_n
    ).select(F.col("media_id").alias("_id"), "phash")
    if materialize:
        frames = frames.localCheckpoint()
    counts = frames.groupBy("_id").agg(F.count(F.lit(1)).alias("n_frames"))
    a, b = frames.alias("a"), frames.alias("b")
    shared = (
        a.join(b, on="phash", how="inner")
        .filter(F.col("a._id") < F.col("b._id"))
        .groupBy(F.col("a._id").alias("media_id_a"), F.col("b._id").alias("media_id_b"))
        .agg(F.count_distinct("phash").alias("n_shared_frames"))
        .filter(F.col("n_shared_frames") >= min_shared)
    )
    ca = counts.select(F.col("_id").alias("media_id_a"), F.col("n_frames").alias("n_frames_a"))
    cb = counts.select(F.col("_id").alias("media_id_b"), F.col("n_frames").alias("n_frames_b"))
    return (
        shared.join(F.broadcast(ca), "media_id_a")
        .join(F.broadcast(cb), "media_id_b")
        .select(
            "media_id_a",
            "media_id_b",
            "n_shared_frames",
            "n_frames_a",
            "n_frames_b",
            F.round(
                F.col("n_shared_frames")
                / F.least(F.col("n_frames_a"), F.col("n_frames_b")),
                6,
            ).alias("overlap_frac"),
        )
    )


def audio_segment_overlap_pairs(
    df: DataFrame,
    segment_len: int = 16,
    min_shared: int = 2,
    id_col: str = "media_id",
    materialize: bool = True,
) -> DataFrame:
    """Clip pairs sharing decoded AUDIO segments — the audio member of
    the per-granule overlap family (docs: segment dedup; video: frame
    overlap): clips are split into fixed windows of ``segment_len``
    samples, each window fingerprinted with the sign-of-delta hash, and
    clips sharing >= ``min_shared`` window fingerprints pair up. Catches
    spliced / partially-copied audio that whole-clip hashing misses.

    One decode pass (Arrow-batched), then an equi-self-join on the
    8-byte window hash; payload bytes never ride a shuffle. Returns
    (media_id_a, media_id_b, n_shared_segments, n_segments_a,
    n_segments_b, overlap_frac) with overlap_frac = shared / min(n_a,
    n_b)."""
    seg_schema = "media_id long, seg_idx int, seg_hash long"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    _rate, samples = decode_audio(payload)
                except CORRUPT_ERRORS:  # corrupt WAV: no segments, don't fail the job
                    continue
                for si in range(len(samples) // segment_len):
                    seg = samples[si * segment_len : (si + 1) * segment_len]
                    rows.append(
                        {
                            "media_id": int(mid),
                            "seg_idx": si,
                            "seg_hash": sign_hash64(seg),
                        }
                    )
            yield pd.DataFrame(rows)

    segs = (
        df.select(F.col(id_col).alias("media_id"), "payload")
        .mapInPandas(kernel, seg_schema)
        .select("media_id", "seg_hash")
    )
    if materialize:
        segs = segs.localCheckpoint()
    counts = segs.groupBy("media_id").agg(F.count(F.lit(1)).alias("n_segments"))
    a, b = segs.alias("a"), segs.alias("b")
    shared = (
        a.join(b, on="seg_hash", how="inner")
        .filter(F.col("a.media_id") < F.col("b.media_id"))
        .groupBy(
            F.col("a.media_id").alias("media_id_a"),
            F.col("b.media_id").alias("media_id_b"),
        )
        .agg(F.count_distinct("seg_hash").alias("n_shared_segments"))
        .filter(F.col("n_shared_segments") >= min_shared)
    )
    ca = counts.select(F.col("media_id").alias("media_id_a"), F.col("n_segments").alias("n_segments_a"))
    cb = counts.select(F.col("media_id").alias("media_id_b"), F.col("n_segments").alias("n_segments_b"))
    return (
        shared.join(F.broadcast(ca), "media_id_a")
        .join(F.broadcast(cb), "media_id_b")
        .select(
            "media_id_a",
            "media_id_b",
            "n_shared_segments",
            "n_segments_a",
            "n_segments_b",
            F.round(
                F.col("n_shared_segments")
                / F.least(F.col("n_segments_a"), F.col("n_segments_b")),
                6,
            ).alias("overlap_frac"),
        )
    )
