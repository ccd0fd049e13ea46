"""Multimodal (image/audio/video) column conventions + processing plumbing.

Extension surface (BASELINE.json north star): at 100 TB training-data
scale, media travels as opaque ``binary`` columns with typed metadata
structs; all Spark-side mechanics — schemas, partition-friendly batch
processing via ``mapInPandas`` (Arrow record batches), frame fan-out — are
real and tested here. The codec step is isolated behind ``decoder``
callables: ``audio`` (RIFF/WAVE PCM) and ``image`` (Netpbm P5/P6) decode
for real with pure-Python parsers — no codec libraries needed — while
``video`` and other container formats need an injected decoder (ffmpeg
etc. are not in this container); the default raises
``NotImplementedError`` for those, and tests can inject a fake.

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


def wav_features(content: bytes, dim: int = 8) -> list[float]:
    """Real audio features from WAV bytes: duration, normalized rate, RMS,
    peak, zero-crossing rate, plus low/mid/high spectral band energy —
    the standard cheap descriptors a curation pass filters on (silence,
    clipping, tone-vs-noise)."""
    samples, rate = decode_wav(content)
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


def image_features(content: bytes, dim: int = 8) -> list[float]:
    """Real image features from Netpbm bytes: normalized width/height,
    aspect ratio, mean luminance, luminance contrast (std), per-channel
    means — the cheap descriptors a curation pass filters on (blank /
    low-contrast / color-cast frames). Mirrors :func:`wav_features`."""
    px = decode_ppm(content).astype(np.float64) / 255.0
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


def default_decoder(content: bytes, kind: str) -> list[float]:
    """Decode/feature-extract dispatch. ``audio`` WAV bytes and ``image``
    Netpbm bytes decode for real (pure-Python RIFF/PCM and P5/P6 parses,
    :func:`wav_features` / :func:`image_features`); other kinds need a
    codec stack (ffmpeg etc.) injected via ``decoder=`` in deployments
    that have one."""
    if kind == "audio":
        return wav_features(content)
    if kind == "image":
        return image_features(content)
    raise NotImplementedError(
        f"no media codec for kind={kind!r} in this environment; inject decoder="
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
                try:
                    px = decode_ppm(bytes(row["content"]))
                except ValueError:
                    continue
                rs = resize_nearest(px, out_h, out_w)
                out["media_id"].append(row["media_id"])
                out["kind"].append(row["kind"])
                out["width"].append(out_w)
                out["height"].append(out_h)
                out["content"].append(encode_ppm(rs))
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "content").mapInPandas(
        _proc, schema=RESIZED_SCHEMA
    )
