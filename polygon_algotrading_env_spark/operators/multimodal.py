"""Multimodal (image/audio/video) column conventions + processing plumbing.

Extension surface (BASELINE.json north star): at 100 TB training-data
scale, media travels as opaque ``binary`` columns with typed metadata
structs; all Spark-side mechanics — schemas, partition-friendly batch
processing via ``mapInPandas`` (Arrow record batches), frame fan-out — are
real and tested here. The codec step is isolated behind ``decoder``
callables, and all three declared kinds decode for real with pure-Python
parsers — no codec libraries needed: ``audio`` (RIFF/WAVE PCM +
native FLAC, lossless-compressed — operators/flac.py), ``image``
(three compressed containers — PNG via stdlib zlib, GIF87a/89a via
pure-Python LZW, baseline JPEG via pure-numpy Huffman+IDCT — plus
Netpbm P5/P6), ``video`` (YUV4MPEG2 planar). Other container formats
(mp4/mp3/webp…) need an injected decoder (ffmpeg etc. are not in this
container); the built-in parsers raise ValueError on bytes they don't
own, so misrouted blobs fail loudly.

Layout guidance at scale: media tables should be written with
``write_partitioned(..., ["kind"])`` and a bucket on ``media_id``; Arrow
batch sizes are bounded via ``spark.sql.execution.arrow.maxRecordsPerBatch``
so a batch of large blobs fits executor memory.
"""

from __future__ import annotations

import struct
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# Canonical media schema: one row per asset.
MEDIA_SCHEMA = (
    "media_id bigint, kind string, content binary, "
    "meta struct<mime:string, width:int, height:int, duration_s:double, fps:double>"
)

#: Output schema of :func:`extract_features`.
FEATURE_SCHEMA = "media_id bigint, kind string, n_bytes bigint, feature array<float>"


def attach_content_stats(media: DataFrame) -> DataFrame:
    """JVM-side stats every media pipeline wants before decoding: size and
    a content fingerprint (exact-dup detection on blobs — D1 for media)."""
    return media.withColumn("n_bytes", F.length("content")).withColumn(
        "content_fp", F.xxhash64("content")
    )


def decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """Pure-Python RIFF/WAVE PCM decode → (mono float64 samples in [-1, 1],
    sample_rate). Walks the chunk list explicitly (tolerates extra chunks
    like LIST/fact before data); supports PCM u8 / s16 / s32, any channel
    count (averaged to mono). Raises ValueError on malformed or
    non-PCM input — undecodable media must fail loudly, not yield
    garbage features."""
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(content):
        cid, size = content[pos : pos + 4], struct.unpack_from("<I", content, pos + 4)[0]
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if audio_format != 1:
        raise ValueError(f"unsupported WAVE format code {audio_format} (PCM only)")
    if bits == 8:  # u8 is offset-binary
        samples = (
            np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0
        ) / 128.0
    elif bits == 16:
        samples = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 32:
        samples = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM bit depth {bits}")
    if n_channels > 1:
        samples = samples[: len(samples) - len(samples) % n_channels]
        samples = samples.reshape(-1, n_channels).mean(axis=1)
    return samples, int(sample_rate)


def encode_wav(samples, sample_rate: int) -> bytes:
    """Inverse of :func:`decode_wav` (mono s16 PCM) — lets tests and
    fixtures synthesize real media bytes without codec libraries."""
    pcm = (np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0) * 32767.0)
    body = pcm.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(body), b"WAVE", b"fmt ", 16,
        1, 1, sample_rate, sample_rate * 2, 2, 16, b"data", len(body),
    )
    return hdr + body


def decode_audio(content: bytes) -> tuple[np.ndarray, int]:
    """``kind=audio`` decode dispatch by magic bytes: RIFF/WAVE PCM
    (uncompressed) or native FLAC (lossless-compressed, pure Python —
    operators/flac.py) → (mono float64 samples, rate)."""
    if content[:4] == b"fLaC":
        from polygon_algotrading_env_spark.operators.flac import decode_flac

        return decode_flac(content)
    return decode_wav(content)


def wav_features(content: bytes, dim: int = 8) -> list[float]:
    """Real audio features from WAV or FLAC bytes (magic-byte dispatch):
    duration, normalized rate, RMS, peak, zero-crossing rate, plus
    low/mid/high spectral band energy — the standard cheap descriptors a
    curation pass filters on (silence, clipping, tone-vs-noise)."""
    samples, rate = decode_audio(content)
    n = len(samples)
    if n == 0:
        return [0.0] * dim
    rms = float(np.sqrt(np.mean(samples**2)))
    peak = float(np.max(np.abs(samples)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(samples).astype(np.int8))))) if n > 1 else 0.0
    spec = np.abs(np.fft.rfft(samples))
    total = float(spec.sum()) or 1.0
    thirds = np.array_split(spec, 3)
    bands = [float(t.sum()) / total for t in thirds]
    feats = [n / rate, rate / 48000.0, rms, peak, zcr, *bands]
    return feats[:dim] + [0.0] * max(0, dim - len(feats))


def decode_ppm(content: bytes) -> np.ndarray:
    """Pure-Python Netpbm decode → HxWx3 uint8 array. Supports binary P6
    (RGB) and P5 (grayscale, broadcast to 3 channels), maxval <= 255,
    with ``#`` comments anywhere in the header. Raises ValueError on
    malformed or non-Netpbm input — undecodable media must fail loudly,
    not yield garbage features."""
    if len(content) < 2 or content[:1] != b"P" or content[1:2] not in b"56":
        raise ValueError("not a binary Netpbm (P5/P6) stream")
    channels = 3 if content[1:2] == b"6" else 1

    # Header tokenizer: whitespace-separated ints, '#' starts a comment
    # that runs to end-of-line. Exactly one whitespace byte follows the
    # maxval token before the raster begins.
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(content):
            raise ValueError("truncated Netpbm header")
        b = content[pos : pos + 1]
        if b == b"#":
            while pos < len(content) and content[pos : pos + 1] != b"\n":
                pos += 1
        elif b.isspace():
            pos += 1
        elif b.isdigit():
            start = pos
            while pos < len(content) and content[pos : pos + 1].isdigit():
                pos += 1
            tokens.append(int(content[start:pos]))
        else:
            raise ValueError(f"unexpected header byte {b!r}")
    width, height, maxval = tokens
    if width <= 0 or height <= 0:
        raise ValueError(f"bad dimensions {width}x{height}")
    if not (0 < maxval <= 255):
        raise ValueError(f"unsupported maxval {maxval} (8-bit only)")
    pos += 1  # the single whitespace after maxval
    n = width * height * channels
    raster = content[pos : pos + n]
    if len(raster) < n:
        raise ValueError("truncated Netpbm raster")
    arr = np.frombuffer(raster, dtype=np.uint8).reshape(height, width, channels)
    if maxval != 255:
        arr = (arr.astype(np.uint16) * 255 // maxval).astype(np.uint8)
    if channels == 1:
        arr = np.repeat(arr, 3, axis=2)
    return arr


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Inverse of :func:`decode_ppm` (binary P6) — lets tests and fixtures
    synthesize real image bytes without codec libraries."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected HxWx3 uint8, got shape {arr.shape}")
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(content: bytes) -> np.ndarray:
    """Pure-stdlib PNG decode → HxWx3 uint8 array (zlib inflate + the five
    scanline filters — None/Sub/Up/Average/Paeth, RFC 2083). The first
    COMPRESSED container in the codec set: 8-bit gray (0), RGB (2),
    gray+alpha (4) and RGBA (6) color types, non-interlaced; alpha is
    dropped and gray broadcast to 3 channels so every image kind lands in
    the same HxWx3 contract as :func:`decode_ppm`. Chunk CRCs are
    verified. Raises ValueError on anything else (palette, 16-bit,
    Adam7) — undecodable media must fail loudly, not yield garbage
    features."""
    import zlib

    if not content.startswith(_PNG_SIG):
        raise ValueError("not a PNG stream")
    pos, ihdr, idat = len(_PNG_SIG), None, []
    while pos + 8 <= len(content):
        (length,) = struct.unpack_from(">I", content, pos)
        ctype = content[pos + 4 : pos + 8]
        body = content[pos + 8 : pos + 8 + length]
        if len(body) < length or pos + 12 + length > len(content):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", content, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    width, height, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if width <= 0 or height <= 0:
        raise ValueError(f"bad dimensions {width}x{height}")
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (8-bit only)")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color} (no palette)")
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard PNG compression/filter method")
    if interlace != 0:
        raise ValueError("Adam7 interlacing not supported")
    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG raster size mismatch")

    # Unfilter. None/Up are whole-row vectorized; Sub is a per-channel
    # prefix sum mod 256, so it vectorizes EXACTLY as cumsum along the
    # pixel axis (uint8 wraparound ≡ mod-256 arithmetic on the running
    # sum). Average/Paeth carry a nonlinear (floor / abs-compare) left
    # dependency, so those rows loop the WIDTH once with numpy ops over
    # the channel stride — O(W) interpreter iterations per row instead of
    # O(W·C) per-byte, and the dominant filters real encoders emit
    # (1/2/4 with 0 on row boundaries) all hit a vectorized or
    # column-vector path.
    out = np.zeros((height, stride), dtype=np.uint8)
    prev_px = np.zeros((width, channels), dtype=np.int16)
    for r in range(height):
        ftype = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1
        )
        if ftype == 0:
            px_row = line.reshape(width, channels).astype(np.int16)
        elif ftype == 2:  # Up: whole-row add
            px_row = (
                line.reshape(width, channels) + prev_px
            ) & 0xFF
        elif ftype == 1:  # Sub: exact per-channel running sum mod 256
            px_row = (
                np.cumsum(
                    line.reshape(width, channels), axis=0, dtype=np.uint64
                )
                & 0xFF
            ).astype(np.int16)
        elif ftype == 3:  # Average: floor((left + up) / 2) column loop
            cur = line.reshape(width, channels).astype(np.int16)
            cur[0] = (cur[0] + (prev_px[0] >> 1)) & 0xFF
            for x in range(1, width):
                cur[x] = (cur[x] + ((cur[x - 1] + prev_px[x]) >> 1)) & 0xFF
            px_row = cur
        elif ftype == 4:  # Paeth: min-distance predictor column loop
            cur = line.reshape(width, channels).astype(np.int16)
            cur[0] = (cur[0] + prev_px[0]) & 0xFF  # a = c = 0 → pred = b
            for x in range(1, width):
                a, b, c = cur[x - 1], prev_px[x], prev_px[x - 1]
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                )
                cur[x] = (cur[x] + pred) & 0xFF
            px_row = cur
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[r] = px_row.astype(np.uint8).reshape(stride)
        prev_px = px_row
    px = out.reshape(height, width, channels)
    if color == 0:
        return np.repeat(px, 3, axis=2)
    if color == 2:
        return px
    if color == 4:  # gray + alpha: drop alpha, broadcast
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]  # RGBA: drop alpha


def encode_png(pixels: np.ndarray) -> bytes:
    """Inverse of :func:`decode_png` (8-bit RGB, color type 2, filter 0
    rows, one zlib IDAT) — lets tests and fixtures synthesize real
    compressed image bytes without codec libraries."""
    import zlib

    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected HxWx3 uint8, got shape {arr.shape}")
    h, w = arr.shape[:2]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raster = b"".join(b"\x00" + arr[r].tobytes() for r in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raster))
        + chunk(b"IEND", b"")
    )


def decode_bmp(content: bytes) -> np.ndarray:
    """Pure-Python BMP decode (BITMAPINFOHEADER, uncompressed BI_RGB,
    24- or 32-bit) → HxWx3 uint8. Handles the format's three classic
    traps: BGR(A) channel order, rows padded to 4-byte boundaries, and
    bottom-up storage (positive height) vs top-down (negative height).
    Raises ValueError on non-BMP magic, compressed streams, palette
    depths, or truncated rasters."""
    if len(content) < 54 or content[:2] != b"BM":
        raise ValueError("not a BMP stream")
    data_off = struct.unpack("<I", content[10:14])[0]
    hdr_size = struct.unpack("<I", content[14:18])[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h_raw = struct.unpack("<ii", content[18:26])
    bpp = struct.unpack("<H", content[28:30])[0]
    compression = struct.unpack("<I", content[30:34])[0]
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression}")
    if bpp not in (24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    if w <= 0 or h_raw == 0 or w * abs(h_raw) > 1 << 26:
        raise ValueError(f"bad BMP dimensions {w}x{h_raw}")
    h, bottom_up = abs(h_raw), h_raw > 0
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    need = data_off + stride * h
    if len(content) < need:
        raise ValueError("truncated BMP raster")
    raster = np.frombuffer(
        content, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)
    px = raster[:, : w * nch].reshape(h, w, nch)
    if bottom_up:
        px = px[::-1]
    # BGR(A) -> RGB
    return np.ascontiguousarray(px[:, :, 2::-1])


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Inverse of :func:`decode_bmp` (24-bit BI_RGB, bottom-up,
    4-byte-padded rows) — round-trips any HxWx3 uint8 array exactly."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected HxWx3 uint8, got shape {arr.shape}")
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
    raster = rows.tobytes()
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster),
                      2835, 2835, 0, 0)
    )
    return header + raster


_QOI_SIG = b"qoif"


def decode_qoi(content: bytes) -> np.ndarray:
    """Pure-Python QOI decode (the public qoiformat.org spec) → HxWx3
    uint8. Supports both 3- and 4-channel streams (alpha dropped on
    return, like the other image decoders); all six op types: RGB, RGBA,
    INDEX (64-entry running hash table, hash = (3r+5g+7b+11a) mod 64),
    DIFF (2-bit channel deltas, bias 2), LUMA (6-bit green delta bias 32
    plus 4-bit red/blue deltas relative to it, bias 8), RUN (1..62,
    bias −1). Deltas wrap mod 256 per spec. Raises ValueError on bad
    magic, bad channel count, or a stream that ends before width·height
    pixels are produced."""
    if len(content) < 14 or content[:4] != _QOI_SIG:
        raise ValueError("not a QOI stream")
    w, h = struct.unpack(">II", content[4:12])
    channels, _colorspace = content[12], content[13]
    if channels not in (3, 4):
        raise ValueError(f"bad QOI channel count {channels}")
    if w <= 0 or h <= 0 or w * h > 1 << 26:
        raise ValueError(f"bad QOI dimensions {w}x{h}")
    npix = w * h
    out = np.empty((npix, 4), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos, emitted, n = 14, 0, len(content)
    while emitted < npix:
        if pos >= n:
            raise ValueError("truncated QOI stream")
        byte = content[pos]
        pos += 1
        if byte == 0xFE:  # QOI_OP_RGB
            if pos + 3 > n:
                raise ValueError("truncated QOI_OP_RGB")
            r, g, b = content[pos], content[pos + 1], content[pos + 2]
            pos += 3
        elif byte == 0xFF:  # QOI_OP_RGBA
            if pos + 4 > n:
                raise ValueError("truncated QOI_OP_RGBA")
            r, g, b, a = (
                content[pos],
                content[pos + 1],
                content[pos + 2],
                content[pos + 3],
            )
            pos += 4
        else:
            tag = byte >> 6
            if tag == 0:  # QOI_OP_INDEX
                r, g, b, a = index[byte & 0x3F]
            elif tag == 1:  # QOI_OP_DIFF
                r = (r + ((byte >> 4) & 3) - 2) & 0xFF
                g = (g + ((byte >> 2) & 3) - 2) & 0xFF
                b = (b + (byte & 3) - 2) & 0xFF
            elif tag == 2:  # QOI_OP_LUMA
                if pos >= n:
                    raise ValueError("truncated QOI_OP_LUMA")
                dg = (byte & 0x3F) - 32
                rb = content[pos]
                pos += 1
                r = (r + dg + ((rb >> 4) & 0xF) - 8) & 0xFF
                g = (g + dg) & 0xFF
                b = (b + dg + (rb & 0xF) - 8) & 0xFF
            else:  # QOI_OP_RUN
                run = (byte & 0x3F) + 1
                if emitted + run > npix:
                    raise ValueError("QOI run past end of image")
                out[emitted : emitted + run] = (r, g, b, a)
                emitted += run
                continue
        index[(r * 3 + g * 5 + b * 7 + a * 11) & 0x3F] = (r, g, b, a)
        out[emitted] = (r, g, b, a)
        emitted += 1
    return out[:, :3].reshape(h, w, 3)


def encode_qoi(pixels: np.ndarray) -> bytes:
    """Inverse of :func:`decode_qoi` (3-channel, spec-greedy op choice:
    RUN, then INDEX, then DIFF, then LUMA, then RGB) — losslessly
    round-trips any HxWx3 uint8 array; lets fixtures synthesize real
    compressed bytes for the fifth image container."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected HxWx3 uint8, got shape {arr.shape}")
    h, w = arr.shape[:2]
    flat = arr.reshape(-1, 3)
    out = bytearray(_QOI_SIG + struct.pack(">IIBB", w, h, 3, 0))
    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb = 0, 0, 0
    run = 0
    for r, g, b in flat.tolist():
        if (r, g, b) == (pr, pg, pb):
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        hidx = (r * 3 + g * 5 + b * 7 + 255 * 11) & 0x3F
        px = (r, g, b, 255)
        if index[hidx] == px:
            out.append(hidx)
        else:
            index[hidx] = px
            dr = ((r - pr + 128) & 0xFF) - 128
            dg = ((g - pg + 128) & 0xFF) - 128
            db = ((b - pb + 128) & 0xFF) - 128
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
            elif (
                -32 <= dg <= 31 and -8 <= dr - dg <= 7 and -8 <= db - dg <= 7
            ):
                out.append(0x80 | (dg + 32))
                out.append(((dr - dg + 8) << 4) | (db - dg + 8))
            else:
                out += bytes((0xFE, r, g, b))
        pr, pg, pb = r, g, b
    if run:
        out.append(0xC0 | (run - 1))
    out += b"\x00" * 7 + b"\x01"
    return bytes(out)


_GIF_SIGS = (b"GIF87a", b"GIF89a")
_GIF_MAX_CODE = 4096  # 12-bit LZW cap per the GIF spec


def _gif_lzw_decode(min_code: int, data: bytes, npix: int) -> np.ndarray:
    """Variable-width LSB-first LZW per the GIF87a spec: initial width
    min_code+1, clear/end codes, table growth to the 12-bit cap with
    deferred-clear tolerance (a full table keeps decoding, no implicit
    reset). The width bumps when the table reaches 1<<width — the exact
    dual of the encoder's next_code == (1<<width)+1 rule."""
    if not 2 <= min_code <= 11:
        raise ValueError(f"bad LZW min code size {min_code}")
    clear = 1 << min_code
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    cs = min_code + 1
    prev: bytes | None = None
    out = bytearray()
    acc = nbits = pos = 0
    while len(out) < npix:
        while nbits < cs:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << cs) - 1)
        acc >>= cs
        nbits -= cs
        if code == clear:
            table = list(base)
            cs = min_code + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("first GIF code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < _GIF_MAX_CODE:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < _GIF_MAX_CODE:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF LZW code out of range")
        if len(table) == (1 << cs) and cs < 12:
            cs += 1
        out += entry
        prev = entry
    if len(out) < npix:
        raise ValueError("GIF pixel data ended early")
    return np.frombuffer(bytes(out[:npix]), dtype=np.uint8)


def _gif_lzw_encode(min_code: int, indices: bytes) -> bytes:
    """Real LZW compression (not the clear-code-spam trick), emitting the
    stream :func:`_gif_lzw_decode` reads back: dictionary growth, width
    bumps one step ahead of the decoder's table (next_code ==
    (1<<width)+1 — the decoder lags one entry), explicit clear + reset
    at the 12-bit cap."""
    clear = 1 << min_code
    end = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    d: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = clear + 2
    cs = min_code + 1
    emit(clear, cs)
    w = b""
    for b in indices:
        wc = w + bytes([b])
        if wc in d:
            w = wc
            continue
        emit(d[w], cs)
        if next_code < _GIF_MAX_CODE:
            d[wc] = next_code
            next_code += 1
            if next_code == (1 << cs) + 1 and cs < 12:
                cs += 1
        else:
            emit(clear, cs)
            d = {bytes([i]): i for i in range(clear)}
            next_code = clear + 2
            cs = min_code + 1
        w = bytes([b])
    if w:
        emit(d[w], cs)
    emit(end, cs)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(content: bytes) -> np.ndarray:
    """Pure-stdlib GIF decode → HxWx3 uint8 (first frame). GIF87a core —
    logical screen descriptor, global/local color tables, interlaced or
    sequential rows, variable-width LZW — plus GIF89a streams (extension
    blocks are skipped; the first image frame is returned; transparency
    keeps its palette color since features carry no alpha). Raises
    ValueError on malformed input — undecodable media must fail loudly,
    not yield garbage features. Second compressed container next to PNG
    (the reference stores media externally; multimodal columns are
    extension surface)."""
    if content[:6] not in _GIF_SIGS:
        raise ValueError("not a GIF87a/GIF89a stream")
    if len(content) < 13:
        raise ValueError("truncated GIF header")
    packed = content[10]
    pos = 13
    gct: np.ndarray | None = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(content):
            raise ValueError("truncated global color table")
        gct = np.frombuffer(content[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    while True:
        if pos >= len(content):
            raise ValueError("no image descriptor before end of stream")
        intro = content[pos]
        pos += 1
        if intro == 0x3B:  # trailer
            raise ValueError("GIF ends with no image data")
        if intro == 0x21:  # extension: label then sub-blocks to a 0 byte
            pos += 1
            while pos < len(content) and content[pos]:
                pos += 1 + content[pos]
            pos += 1
            continue
        if intro != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{intro:02x}")
        break
    if pos + 9 > len(content):
        raise ValueError("truncated image descriptor")
    w = int.from_bytes(content[pos + 4 : pos + 6], "little")
    h = int.from_bytes(content[pos + 6 : pos + 8], "little")
    ipacked = content[pos + 8]
    pos += 9
    if w <= 0 or h <= 0:
        raise ValueError(f"bad GIF dimensions {w}x{h}")
    ct = gct
    if ipacked & 0x80:
        n = 2 << (ipacked & 0x07)
        if pos + 3 * n > len(content):
            raise ValueError("truncated local color table")
        ct = np.frombuffer(content[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    if ct is None:
        raise ValueError("GIF has neither global nor local color table")
    if pos >= len(content):
        raise ValueError("missing LZW minimum code size")
    min_code = content[pos]
    pos += 1
    chunks = []
    while True:
        if pos >= len(content):
            raise ValueError("unterminated GIF data sub-blocks")
        ln = content[pos]
        pos += 1
        if ln == 0:
            break
        chunks.append(content[pos : pos + ln])
        if len(chunks[-1]) < ln:
            raise ValueError("truncated GIF data sub-block")
        pos += ln
    idx = _gif_lzw_decode(min_code, b"".join(chunks), w * h)
    if idx.max(initial=0) >= len(ct):
        raise ValueError("GIF pixel index outside the color table")
    rows = idx.reshape(h, w)
    if ipacked & 0x40:  # interlaced: rows arrive in four passes
        order = [
            r for start, step in _GIF_INTERLACE_PASSES for r in range(start, h, step)
        ]
        de = np.empty_like(rows)
        de[order] = rows
        rows = de
    return ct[rows]


def encode_gif(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """Inverse of :func:`decode_gif` (GIF87a, global color table built
    from the image's unique colors — ≤256 required, real LZW). With
    ``interlace=True`` rows are written in the four-pass spec order with
    the interlace flag set, exercising the decoder's de-interleave."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected HxWx3 uint8, got shape {arr.shape}")
    h, w = arr.shape[:2]
    flat = arr.reshape(-1, 3)
    colors, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} colors exceed GIF's 256-entry table")
    ct_bits = max(1, (len(colors) - 1).bit_length())
    n = 1 << ct_bits
    table = np.zeros((n, 3), np.uint8)
    table[: len(colors)] = colors
    idx = inv.astype(np.uint8).reshape(h, w)
    if interlace:
        order = [
            r for start, step in _GIF_INTERLACE_PASSES for r in range(start, h, step)
        ]
        idx = idx[order]
    min_code = max(2, ct_bits)
    lzw = _gif_lzw_encode(min_code, idx.tobytes())
    blocks = b"".join(
        bytes([len(lzw[i : i + 255])]) + lzw[i : i + 255]
        for i in range(0, len(lzw), 255)
    )
    return (
        b"GIF87a"
        + w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
        + bytes([0x80 | (ct_bits - 1), 0, 0])
        + table.tobytes()
        + b"\x2c"
        + b"\x00\x00\x00\x00"
        + w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
        + bytes([0x40 if interlace else 0x00])
        + bytes([min_code])
        + blocks
        + b"\x00"
        + b"\x3b"
    )


def decode_gif_anim(content: bytes) -> tuple[np.ndarray, float]:
    """Animated-GIF decode → (frames as TxHxWx3 RGB uint8, fps) — the
    COMPRESSED video container next to uncompressed Y4M, reusing the
    still-GIF LZW machinery. Subset: every frame must cover the full
    logical screen with no local color table (what :func:`encode_gif_anim`
    emits); per-frame delays come from Graphic Control Extensions
    (centiseconds; fps = 100/mean delay, 10 fps when absent/zero).
    Raises ValueError on malformed input or partial-frame compositing."""
    if content[:6] not in _GIF_SIGS:
        raise ValueError("not a GIF87a/GIF89a stream")
    if len(content) < 13:
        raise ValueError("truncated GIF header")
    sw = int.from_bytes(content[6:8], "little")
    sh = int.from_bytes(content[8:10], "little")
    packed = content[10]
    pos = 13
    if not packed & 0x80:
        raise ValueError("animated GIF subset requires a global color table")
    n = 2 << (packed & 0x07)
    gct = np.frombuffer(content[pos : pos + 3 * n], np.uint8).reshape(n, 3)
    pos += 3 * n
    frames: list[np.ndarray] = []
    delays: list[int] = []
    pending_delay = 0
    while pos < len(content):
        intro = content[pos]
        pos += 1
        if intro == 0x3B:
            break
        if intro == 0x21:
            label = content[pos]
            pos += 1
            if label == 0xF9 and pos < len(content) and content[pos] >= 4:
                pending_delay = int.from_bytes(
                    content[pos + 2 : pos + 4], "little"
                )
            while pos < len(content) and content[pos]:
                pos += 1 + content[pos]
            pos += 1
            continue
        if intro != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{intro:02x}")
        left = int.from_bytes(content[pos : pos + 2], "little")
        top = int.from_bytes(content[pos + 2 : pos + 4], "little")
        w = int.from_bytes(content[pos + 4 : pos + 6], "little")
        h = int.from_bytes(content[pos + 6 : pos + 8], "little")
        ipacked = content[pos + 8]
        pos += 9
        if (left, top, w, h) != (0, 0, sw, sh) or ipacked & 0xC0:
            raise ValueError(
                "animated GIF subset requires full-screen, non-interlaced "
                "frames with the global color table"
            )
        min_code = content[pos]
        pos += 1
        chunks = []
        while True:
            if pos >= len(content):
                raise ValueError("unterminated GIF data sub-blocks")
            ln = content[pos]
            pos += 1
            if ln == 0:
                break
            chunks.append(content[pos : pos + ln])
            if len(chunks[-1]) < ln:
                raise ValueError("truncated GIF data sub-block")
            pos += ln
        idx = _gif_lzw_decode(min_code, b"".join(chunks), w * h)
        if idx.max(initial=0) >= len(gct):
            raise ValueError("GIF pixel index outside the color table")
        frames.append(gct[idx.reshape(h, w)])
        delays.append(pending_delay)
        pending_delay = 0
    if not frames:
        raise ValueError("GIF stream contains no frames")
    mean_delay = sum(delays) / len(delays)
    fps = 100.0 / mean_delay if mean_delay > 0 else 10.0
    return np.stack(frames), fps


def encode_gif_anim(frames: np.ndarray, fps: float = 10.0) -> bytes:
    """Inverse of :func:`decode_gif_anim` (GIF89a, one global color table
    from the union of all frames' colors — ≤256 required, real LZW, a
    Graphic Control Extension with the frame delay before every image)."""
    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim == 3:
        arr = np.repeat(arr[..., None], 3, axis=3)
    if arr.ndim != 4 or arr.shape[3] != 3 or not len(arr):
        raise ValueError(f"expected TxHxWx3 uint8, got shape {arr.shape}")
    t, h, w = arr.shape[:3]
    flat = arr.reshape(-1, 3)
    colors, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} colors exceed GIF's 256-entry table")
    ct_bits = max(1, (len(colors) - 1).bit_length())
    n = 1 << ct_bits
    table = np.zeros((n, 3), np.uint8)
    table[: len(colors)] = colors
    idx = inv.astype(np.uint8).reshape(t, h, w)
    min_code = max(2, ct_bits)
    delay = max(1, round(100.0 / fps))
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (ct_bits - 1), 0, 0]) + table.tobytes()
    for f in range(t):
        out += b"\x21\xf9\x04\x00" + delay.to_bytes(2, "little") + b"\x00\x00"
        out += b"\x2c" + b"\x00\x00\x00\x00"
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00"
        lzw = _gif_lzw_encode(min_code, idx[f].tobytes())
        out += bytes([min_code])
        for i in range(0, len(lzw), 255):
            out += bytes([len(lzw[i : i + 255])]) + lzw[i : i + 255]
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def decode_video(content: bytes) -> tuple[np.ndarray, float]:
    """``kind=video`` decode dispatch by magic bytes: YUV4MPEG2
    (uncompressed planar) or animated GIF (LZW-compressed) →
    (frames TxHxWx3, fps)."""
    if content[:6] in _GIF_SIGS:
        return decode_gif_anim(content)
    return decode_y4m(content)


# --- baseline JPEG (ITU-T T.81 sequential DCT, pure numpy) ----------------
#
# The third compressed container. Spec leverage: a JPEG stream EMBEDS its
# quantization (DQT) and Huffman (DHT) tables, so the decoder is fully
# general over baseline streams while the encoder may emit any VALID
# canonical tables — ours are simple fixed-length codes (12 DC categories
# at 5 bits, 162 AC symbols at 8 bits; Kraft-complete, no all-ones code,
# so the 1-padding at scan end can't alias a symbol). Interop therefore
# never depends on transcribing Annex K's optimized tables correctly.

_JPEG_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)


def _jpeg_dct_basis() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis C (FDCT: C @ B @ C.T on the
    level-shifted block; IDCT is the transpose pair)."""
    n = np.arange(8)
    c = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16) / 2.0
    c[0] /= np.sqrt(2.0)
    return c


def _jpeg_huff_lengths(nsymbols: int, length: int) -> list[int]:
    bits = [0] * 16
    bits[length - 1] = nsymbols
    return bits


# (BITS, HUFFVAL) for the encoder's stream-embedded tables
_JPEG_DC_SPEC = (_jpeg_huff_lengths(12, 5), list(range(12)))
_JPEG_AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_JPEG_AC_SPEC = (_jpeg_huff_lengths(len(_JPEG_AC_SYMBOLS), 8), _JPEG_AC_SYMBOLS)


def _jpeg_canonical_codes(bits, vals) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the T.81 canonical construction."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _JpegBitReader:
    """MSB-first entropy reader with 0xFF00 unstuffing; RST markers are
    surfaced to the MCU loop (predictor reset + realign)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("JPEG entropy data ended early")
        b = d[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = d[self.pos] if self.pos < len(d) else None
            if nxt == 0x00:
                self.pos += 1
            else:
                raise ValueError("unexpected marker inside JPEG scan")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.bit()
        return v

    def expect_restart(self) -> None:
        """Byte-align (dropping the encoder's 1-padding bits) and consume
        the RSTn marker that must sit at this restart boundary."""
        self.acc = 0
        self.n = 0
        d = self.data
        if (
            self.pos + 1 >= len(d)
            or d[self.pos] != 0xFF
            or not 0xD0 <= d[self.pos + 1] <= 0xD7
        ):
            raise ValueError("expected JPEG restart marker")
        self.pos += 2


def _jpeg_huff_decode_tree(bits, vals):
    """(code, length) -> symbol lookup dict keyed by (length, code)."""
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _jpeg_read_symbol(rd: _JpegBitReader, table) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | rd.bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _jpeg_extend(v: int, t: int) -> int:
    return v - ((1 << t) - 1) if t and v < (1 << (t - 1)) else v


def decode_jpeg(content: bytes) -> np.ndarray:
    """Baseline JPEG (SOF0) decode → HxWx3 uint8, pure numpy: marker
    walk, stream-embedded DQT/DHT tables, interleaved-MCU Huffman scan
    with 0xFF00 unstuffing and DRI/RSTn predictor resets, dequantize →
    inverse zigzag → matrix IDCT, nearest chroma upsample for any
    h/v sampling in {1,2} (4:4:4, 4:2:2, 4:2:0), JFIF full-range
    YCbCr→RGB, grayscale broadcast to 3 channels. Raises ValueError on
    non-baseline streams (progressive SOF2, 12-bit, arithmetic coding)
    — undecodable media must fail loudly."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (no SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    pos = 2
    while True:
        if pos + 4 > len(content):
            raise ValueError("truncated JPEG (no SOS)")
        if content[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at {pos}")
        marker = content[pos + 1]
        seglen = int.from_bytes(content[pos + 2 : pos + 4], "big")
        body = content[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables are not baseline")
                tab = np.frombuffer(body[i + 1 : i + 65], np.uint8)
                if len(tab) != 64:
                    raise ValueError("short quant table")
                qt[tq] = tab.astype(np.float64)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                if len(vals) != nv:
                    raise ValueError("short Huffman table")
                huff[(tc, th)] = _jpeg_huff_decode_tree(bits, vals)
                i += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            if body[0] != 8:
                raise ValueError("only 8-bit baseline JPEG supported")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count {nc}")
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline JPEG (SOF marker 0x{marker:02x})")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:  # SOS: entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF0")
            ns = body[0]
            scan_tables = []
            for c in range(ns):
                _cid, tsel = body[1 + 2 * c], body[2 + 2 * c]
                scan_tables.append((tsel >> 4, tsel & 0x0F))
            data_pos = pos + 2 + seglen
            break
        pos += 2 + seglen

    h, w, comps = frame
    if len(scan_tables) != len(comps):
        raise ValueError("scan/frame component mismatch")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if not all(c[1] in (1, 2) and c[2] in (1, 2) for c in comps):
        raise ValueError("sampling factors beyond 2 are unsupported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    basis = _jpeg_dct_basis()
    planes = [
        np.zeros((mcuy * ci[2] * 8, mcux * ci[1] * 8), np.float64)
        for ci in comps
    ]
    rd = _JpegBitReader(content, data_pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                rd.expect_restart()
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, (comp, (dct_id, act_id)) in enumerate(
                zip(comps, scan_tables)
            ):
                _cid, hi, vi, tq = comp
                if tq not in qt:
                    raise ValueError(f"missing quant table {tq}")
                for by in range(vi):
                    for bx in range(hi):
                        coeffs = np.zeros(64, np.float64)
                        t = _jpeg_read_symbol(rd, huff[(0, dct_id)])
                        diff = _jpeg_extend(rd.receive(t), t)
                        pred[ci] += diff
                        coeffs[0] = pred[ci]
                        k = 1
                        while k < 64:
                            sym = _jpeg_read_symbol(rd, huff[(1, act_id)])
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            run, size = sym >> 4, sym & 0x0F
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            coeffs[k] = _jpeg_extend(rd.receive(size), size)
                            k += 1
                        block = np.zeros(64, np.float64)
                        block[_JPEG_ZIGZAG] = coeffs * qt[tq][_JPEG_ZIGZAG]
                        sp = basis.T @ block.reshape(8, 8) @ basis + 128.0
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = sp
    out = []
    for ci, (_cid, hi, vi, _tq) in enumerate(comps):
        ch = -(-h * vi // vmax)
        cw = -(-w * hi // hmax)
        p = planes[ci][:ch, :cw]
        if hi != hmax or vi != vmax:
            p = np.repeat(np.repeat(p, vmax // vi, 0), hmax // hi, 1)
        out.append(p[:h, :w])
    if len(out) == 1:
        g = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(
        np.uint8
    )


def encode_jpeg(
    pixels: np.ndarray, quant: int = 4, subsample: str = "444",
    restart_interval: int = 0, gray: bool = False,
) -> bytes:
    """Baseline JPEG encoder (fixture/test source): flat quantization at
    ``quant`` (bounded, predictable loss), 4:4:4 or 4:2:0 chroma,
    optional DRI/RSTn emission, and simple fixed-length canonical
    Huffman tables written into DHT — spec-valid by construction (see
    module comment), so :func:`decode_jpeg` and any baseline decoder
    read them from the stream."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected HxWx3 uint8, got shape {arr.shape}")
    if subsample not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsample!r}")
    if not 1 <= quant <= 255:
        raise ValueError("quant must be in [1, 255]")
    h, w = arr.shape[:2]
    rgb = arr.astype(np.float64)
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128
    cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128

    if gray:
        sampling = [(1, 1)]
        pad_y = (-h) % 8
        pad_x = (-w) % 8
        planes = [np.pad(y, ((0, pad_y), (0, pad_x)), mode="edge")]
    elif subsample == "420":
        sampling = [(2, 2), (1, 1), (1, 1)]
        pad_y = (-h) % 16
        pad_x = (-w) % 16
        y_p = np.pad(y, ((0, pad_y), (0, pad_x)), mode="edge")
        cb_p = np.pad(cb, ((0, pad_y), (0, pad_x)), mode="edge")
        cr_p = np.pad(cr, ((0, pad_y), (0, pad_x)), mode="edge")
        cb_s = cb_p.reshape(cb_p.shape[0] // 2, 2, cb_p.shape[1] // 2, 2).mean((1, 3))
        cr_s = cr_p.reshape(cr_p.shape[0] // 2, 2, cr_p.shape[1] // 2, 2).mean((1, 3))
        planes = [y_p, cb_s, cr_s]
    else:
        sampling = [(1, 1), (1, 1), (1, 1)]
        pad_y = (-h) % 8
        pad_x = (-w) % 8
        planes = [
            np.pad(p, ((0, pad_y), (0, pad_x)), mode="edge") for p in (y, cb, cr)
        ]

    basis = _jpeg_dct_basis()
    qtab = np.full(64, float(quant))
    dc_codes = _jpeg_canonical_codes(*_JPEG_DC_SPEC)
    ac_codes = _jpeg_canonical_codes(*_JPEG_AC_SPEC)

    bitbuf = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, ln: int) -> None:
        nonlocal acc, nbits
        acc = (acc << ln) | code
        nbits += ln
        while nbits >= 8:
            b = (acc >> (nbits - 8)) & 0xFF
            bitbuf.append(b)
            if b == 0xFF:
                bitbuf.append(0x00)
            nbits -= 8
        acc &= (1 << nbits) - 1

    def flush(pad: bool = True) -> None:
        nonlocal acc, nbits
        if nbits and pad:
            emit((1 << (8 - nbits)) - 1, 8 - nbits)

    def category(v: int) -> int:
        return int(v).bit_length() if v >= 0 else int(-v).bit_length()

    def encode_block(block: np.ndarray, pred: int) -> int:
        co = basis @ (block - 128.0) @ basis.T
        q = np.round(co / qtab.reshape(8, 8)).astype(np.int64)
        zz = q.reshape(-1)[_JPEG_ZIGZAG]
        diff = int(zz[0]) - pred
        t = category(diff)
        c, ln = dc_codes[t]
        emit(c, ln)
        if t:
            emit(diff if diff >= 0 else diff + (1 << t) - 1, t)
        run = 0
        last_nz = max(np.nonzero(zz[1:])[0], default=-1)
        for k in range(1, 2 + last_nz if last_nz >= 0 else 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run >= 16:
                c, ln = ac_codes[0xF0]
                emit(c, ln)
                run -= 16
            s = category(v)
            c, ln = ac_codes[(run << 4) | s]
            emit(c, ln)
            emit(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < 62:
            c, ln = ac_codes[0x00]
            emit(c, ln)
        return int(zz[0])

    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = planes[0].shape[1] // (8 * hmax)
    mcuy = planes[0].shape[0] // (8 * vmax)
    pred = [0] * len(sampling)
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                flush()
                bitbuf.extend(bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) % 8
                pred = [0] * len(sampling)
            mcu_count += 1
            for ci, (p, (hi, vi)) in enumerate(zip(planes, sampling)):
                for by in range(vi):
                    for bx in range(hi):
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        pred[ci] = encode_block(
                            p[y0 : y0 + 8, x0 : x0 + 8], pred[ci]
                        )
    flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    dqt = seg(0xDB, bytes([0x00]) + bytes(int(qtab[z]) for z in _JPEG_ZIGZAG))
    sof_comps = b"".join(
        bytes([cid + 1, (hi << 4) | vi, 0])
        for cid, (hi, vi) in enumerate(sampling)
    )
    sof = seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
              + bytes([len(sampling)]) + sof_comps)

    def dht(tc: int, th: int, spec) -> bytes:
        bits, vals = spec
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    dri = seg(0xDD, restart_interval.to_bytes(2, "big")) if restart_interval else b""
    sos = seg(0xDA, bytes([len(sampling)]) + b"".join(
        bytes([cid + 1, 0x00]) for cid in range(len(sampling))
    ) + bytes([0, 63, 0]))
    return (
        b"\xff\xd8" + dqt + sof
        + dht(0, 0, _JPEG_DC_SPEC) + dht(1, 0, _JPEG_AC_SPEC)
        + dri + sos + bytes(bitbuf) + b"\xff\xd9"
    )


def decode_image(content: bytes) -> np.ndarray:
    """``kind=image`` decode dispatch by magic bytes: PNG (compressed,
    stdlib zlib), GIF87a/89a (compressed, pure-Python LZW), baseline
    JPEG (SOF0, pure numpy), QOI (byte-oriented diff/run/index coding),
    BMP (BI_RGB, padded BGR rows) or binary Netpbm P5/P6 (uncompressed)
    → HxWx3 uint8. Raises ValueError for anything else."""
    if content.startswith(_PNG_SIG):
        return decode_png(content)
    if content[:6] in _GIF_SIGS:
        return decode_gif(content)
    if content[:2] == b"\xff\xd8":
        return decode_jpeg(content)
    if content[:4] == _QOI_SIG:
        return decode_qoi(content)
    if content[:2] == b"BM":
        return decode_bmp(content)
    return decode_ppm(content)


def image_features(content: bytes, dim: int = 8) -> list[float]:
    """Real image features from PNG or Netpbm bytes: normalized
    width/height, aspect ratio, mean luminance, luminance contrast (std),
    per-channel means — the cheap descriptors a curation pass filters on
    (blank / low-contrast / color-cast frames). Mirrors
    :func:`wav_features`."""
    px = decode_image(content).astype(np.float64) / 255.0
    h, w = px.shape[:2]
    lum = 0.2126 * px[:, :, 0] + 0.7152 * px[:, :, 1] + 0.0722 * px[:, :, 2]
    feats = [
        w / 4096.0,
        h / 4096.0,
        w / h,
        float(lum.mean()),
        float(lum.std()),
        float(px[:, :, 0].mean()),
        float(px[:, :, 1].mean()),
        float(px[:, :, 2].mean()),
    ]
    return feats[:dim] + [0.0] * max(0, dim - len(feats))


_Y4M_PLANE_DIV = {
    # colorspace tag -> (chroma_w_divisor, chroma_h_divisor); None = no chroma
    "C420": (2, 2), "C420jpeg": (2, 2), "C420mpeg2": (2, 2),
    "C420paldv": (2, 2), "C422": (2, 1), "C444": (1, 1), "Cmono": None,
}


def decode_y4m(content: bytes) -> tuple[np.ndarray, float]:
    """Pure-Python YUV4MPEG2 (.y4m) decode → (frames as TxHxWx3 RGB uint8,
    fps). Y4M is the uncompressed video interchange format: a plain-text
    stream header (``YUV4MPEG2 W.. H.. F<num>:<den> .. C<colorspace>``),
    then per-frame ``FRAME`` marker lines each followed by raw planar YUV
    — the same role PPM plays for images, parseable with no codec stack.
    Supports C420 (all variants; chroma nearest-upsampled), C422, C444
    and Cmono (broadcast), 8-bit only. YUV→RGB is BT.601 full-range.
    Raises ValueError on malformed input — undecodable media must fail
    loudly, not yield garbage features."""
    if not content.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = content.find(b"\n")
    if nl < 0:
        raise ValueError("truncated Y4M stream header")
    width = height = 0
    fps_num, fps_den = 25, 1
    cs = "C420"
    for tok in content[9:nl].split():
        t = tok.decode("ascii", "replace")
        if t[0] == "W":
            width = int(t[1:])
        elif t[0] == "H":
            height = int(t[1:])
        elif t[0] == "F":
            num, _, den = t[1:].partition(":")
            fps_num, fps_den = int(num), int(den or 1)
        elif t[0] == "C":
            cs = t
        # I (interlace), A (aspect), X (extensions) don't affect the raster
    if width <= 0 or height <= 0:
        raise ValueError(f"bad dimensions {width}x{height}")
    if fps_num <= 0 or fps_den <= 0:
        raise ValueError(f"bad frame rate {fps_num}:{fps_den}")
    if cs not in _Y4M_PLANE_DIV:
        raise ValueError(f"unsupported Y4M colorspace {cs} (8-bit planar only)")
    div = _Y4M_PLANE_DIV[cs]
    if div is not None and (width % div[0] or height % div[1]):
        raise ValueError(f"{cs} needs dimensions divisible by {div}")
    y_size = width * height
    c_size = 0 if div is None else (width // div[0]) * (height // div[1])

    frames: list[np.ndarray] = []
    pos = nl + 1
    while pos < len(content):
        if content[pos : pos + 5] != b"FRAME":
            raise ValueError("missing FRAME marker")
        fnl = content.find(b"\n", pos)
        if fnl < 0:
            raise ValueError("truncated FRAME header")
        pos = fnl + 1
        need = y_size + 2 * c_size
        raw = content[pos : pos + need]
        if len(raw) < need:
            raise ValueError("truncated Y4M frame raster")
        pos += need
        y = np.frombuffer(raw, dtype=np.uint8, count=y_size).reshape(
            height, width
        ).astype(np.float64)
        if div is None:
            rgb = np.repeat(y[:, :, None], 3, axis=2)
        else:
            ch, cw = height // div[1], width // div[0]
            u = np.frombuffer(raw, np.uint8, c_size, y_size).reshape(ch, cw)
            v = np.frombuffer(raw, np.uint8, c_size, y_size + c_size).reshape(
                ch, cw
            )
            # nearest-neighbor chroma upsample back to full resolution
            u = np.repeat(np.repeat(u, div[1], 0), div[0], 1).astype(np.float64)
            v = np.repeat(np.repeat(v, div[1], 0), div[0], 1).astype(np.float64)
            r = y + 1.402 * (v - 128.0)
            g = y - 0.344136 * (u - 128.0) - 0.714136 * (v - 128.0)
            b = y + 1.772 * (u - 128.0)
            rgb = np.stack([r, g, b], axis=2)
        frames.append(np.clip(np.rint(rgb), 0, 255).astype(np.uint8))
    if not frames:
        raise ValueError("Y4M stream has no frames")
    return np.stack(frames), fps_num / fps_den


def encode_y4m(
    frames: np.ndarray, fps_num: int = 25, fps_den: int = 1, mono: bool = False
) -> bytes:
    """Inverse of :func:`decode_y4m` (C444, or Cmono with ``mono=True``) —
    lets tests and fixtures synthesize real video bytes without codec
    libraries. RGB→YUV is BT.601 full-range; grayscale content survives
    a C444 round-trip byte-exactly (U=V=128 ⇒ the transform is identity
    on Y)."""
    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim == 3:  # T x H x W grayscale
        arr = np.repeat(arr[:, :, :, None], 3, axis=3)
    if arr.ndim != 4 or arr.shape[3] != 3:
        raise ValueError(f"expected TxHxWx3 uint8, got shape {arr.shape}")
    t, h, w = arr.shape[:3]
    cs = b"Cmono" if mono else b"C444"
    out = [b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 %s\n" % (w, h, fps_num, fps_den, cs)]
    f = arr.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = np.clip(np.rint(0.299 * r + 0.587 * g + 0.114 * b), 0, 255).astype(np.uint8)
    if not mono:
        u = np.clip(
            np.rint(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b), 0, 255
        ).astype(np.uint8)
        v = np.clip(
            np.rint(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b), 0, 255
        ).astype(np.uint8)
    for i in range(t):
        out.append(b"FRAME\n")
        out.append(y[i].tobytes())
        if not mono:
            out.append(u[i].tobytes())
            out.append(v[i].tobytes())
    return b"".join(out)


def video_features(content: bytes, dim: int = 8) -> list[float]:
    """Real video features from Y4M bytes: frame count, duration,
    normalized fps and dimensions, mean/std luminance across all frames,
    and mean absolute inter-frame luminance delta (the cheap motion proxy
    a curation pass filters static or strobing clips on). Accepts Y4M or
    animated-GIF bytes (magic dispatch). Mirrors :func:`wav_features` /
    :func:`image_features`."""
    frames, fps = decode_video(content)
    t, h, w = frames.shape[:3]
    px = frames.astype(np.float64) / 255.0
    lum = 0.2126 * px[..., 0] + 0.7152 * px[..., 1] + 0.0722 * px[..., 2]
    motion = float(np.mean(np.abs(np.diff(lum, axis=0)))) if t > 1 else 0.0
    feats = [
        float(t),
        t / fps,
        fps / 60.0,
        w / 4096.0,
        h / 4096.0,
        float(lum.mean()),
        float(lum.std()),
        motion,
    ]
    return feats[:dim] + [0.0] * max(0, dim - len(feats))


def default_decoder(content: bytes, kind: str) -> list[float]:
    """Decode/feature-extract dispatch — every declared media kind now has
    a real pure-Python codec: ``audio`` RIFF/WAVE PCM or FLAC, ``image``
    PNG/GIF/JPEG or Netpbm P5/P6, ``video`` YUV4MPEG2 (:func:`wav_features`
    / :func:`image_features` / :func:`video_features`). Other compressed
    containers (mp4/mkv/jpeg/mp3…) need a codec stack (ffmpeg etc.) injected
    via ``decoder=`` in deployments that have one — the parsers here
    raise ValueError on bytes they don't own, so misrouted blobs fail
    loudly instead of yielding garbage features."""
    if kind == "audio":
        return wav_features(content)
    if kind == "image":
        return image_features(content)
    if kind == "video":
        return video_features(content)
    raise ValueError(
        f"unknown media kind {kind!r} (expected audio/image/video); "
        "inject decoder= for custom kinds"
    )


def deterministic_fake_decoder(dim: int = 8) -> Callable[[bytes, str], list[float]]:
    """Test decoder: a stable pseudo-feature from content bytes — lets the
    full pipeline (schema, batching, joins) run without codec libraries."""

    def _decode(content: bytes, kind: str) -> list[float]:
        h = 1469598103934665603  # FNV-1a over the blob, then expand
        for b in content[:4096]:
            h = ((h ^ b) * 1099511628211) & (2**64 - 1)
        return [((h >> (8 * (i % 8))) & 0xFF) / 255.0 for i in range(dim)]

    return _decode


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], list[float]] = default_decoder,
) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow batches).

    mapInPandas (not a scalar UDF) so one Python worker invocation handles a
    whole record batch, and so rows can be dropped (undecodable media) or
    expanded without a join.
    """

    def _proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for content, kind in zip(pdf["content"], pdf["kind"]):
                feats.append(decoder(bytes(content), kind))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(c)) for c in pdf["content"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(_proc, schema=FEATURE_SCHEMA)


def plan_frame_samples(
    media: DataFrame, every_s: float = 1.0, max_frames: int = 64
) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_idx, t_s).

    Pure JVM fan-out from the metadata (no decode): the decode of each
    planned frame is a second `extract_features`-style pass. Keeping the
    plan relational means frame-level work distributes/bounds like any
    other table.
    """
    n_frames = F.least(
        F.greatest((F.col("meta.duration_s") / every_s).cast("int"), F.lit(1)),
        F.lit(max_frames),
    )
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "_i"),
        )
        .select(
            "media_id",
            "frame_idx",
            (F.col("frame_idx") * F.lit(float(every_s))).alias("t_s"),
        )
    )


SAMPLED_FRAME_SCHEMA = (
    "media_id bigint, frame_idx int, t_s double, width int, height int, "
    "content binary"
)


def sample_video_frames(
    media: DataFrame, every_s: float = 1.0, max_frames: int = 64
) -> DataFrame:
    """REAL frame sampling: decode Y4M video blobs, take one frame every
    ``every_s`` seconds (capped at ``max_frames``), re-encode each sampled
    frame as a P6 image row — the video→image handoff that lets sampled
    frames flow through the image pipeline (:func:`resize_images`,
    :func:`extract_features`) unchanged.

    Complements :func:`plan_frame_samples` (the metadata-only JVM plan):
    this is the decode pass the plan schedules. mapInPandas so each Arrow
    batch decodes in one Python invocation, non-video rows and
    undecodable blobs are DROPPED, and a row can expand to many frame
    rows without a join. At scale, bound blob batches via
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` and partition by
    media_id so one hot video cannot skew a task beyond its own frames.
    """

    def _proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                k: []
                for k in (
                    "media_id", "frame_idx", "t_s", "width", "height", "content"
                )
            }
            for _, row in pdf.iterrows():
                if row["kind"] != "video":
                    continue
                try:
                    frames, fps = decode_y4m(bytes(row["content"]))
                except ValueError:
                    continue
                step = max(int(round(every_s * fps)), 1)
                for n, idx in enumerate(range(0, len(frames), step)):
                    if n >= max_frames:
                        break
                    frame = frames[idx]
                    out["media_id"].append(row["media_id"])
                    out["frame_idx"].append(idx)
                    out["t_s"].append(idx / fps)
                    out["height"].append(frame.shape[0])
                    out["width"].append(frame.shape[1])
                    out["content"].append(encode_ppm(frame))
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "content").mapInPandas(
        _proc, schema=SAMPLED_FRAME_SCHEMA
    )


def resize_nearest(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of an HxWx3 uint8 array — pure numpy index
    mapping (pixel-center sampling: source index = floor((i+0.5)·in/out)),
    byte-deterministic everywhere, no interpolation kernels to disagree
    about across library versions."""
    if out_h <= 0 or out_w <= 0:
        raise ValueError(f"bad target size {out_h}x{out_w}")
    arr = np.asarray(pixels)
    in_h, in_w = arr.shape[:2]
    rows = np.minimum(
        ((np.arange(out_h) + 0.5) * in_h / out_h).astype(np.int64), in_h - 1
    )
    cols = np.minimum(
        ((np.arange(out_w) + 0.5) * in_w / out_w).astype(np.int64), in_w - 1
    )
    return arr[rows[:, None], cols[None, :]]


RESIZED_SCHEMA = (
    "media_id bigint, kind string, width int, height int, content binary"
)


def resize_images(
    media: DataFrame, out_h: int, out_w: int
) -> DataFrame:
    """Batch image normalization: decode Netpbm bytes, nearest-neighbor
    resize to a fixed (out_h, out_w), re-encode P6 — the shape-
    standardization pass before any fixed-input model or embedding step.
    mapInPandas over (media_id, kind, content); non-image rows and
    undecodable blobs are DROPPED (row-dropping is why this is a grouped
    Arrow map, not a scalar UDF); output carries the new dimensions and
    the re-encoded bytes so downstream stages never re-parse headers."""

    def _proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "kind", "width", "height", "content")}
            for _, row in pdf.iterrows():
                if row["kind"] != "image":
                    continue
                blob = bytes(row["content"])
                try:
                    px = decode_image(blob)
                except ValueError:
                    continue
                rs = resize_nearest(px, out_h, out_w)
                out["media_id"].append(row["media_id"])
                out["kind"].append(row["kind"])
                out["width"].append(out_w)
                out["height"].append(out_h)
                # re-encode in the source container so a PNG corpus stays
                # PNG through the normalization pass
                out["content"].append(
                    encode_png(rs) if blob.startswith(_PNG_SIG) else encode_ppm(rs)
                )
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "content").mapInPandas(
        _proc, schema=RESIZED_SCHEMA
    )
