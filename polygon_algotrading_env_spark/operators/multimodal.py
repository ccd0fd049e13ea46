"""Multimodal (image/audio/video) column conventions + processing plumbing.

Extension surface (BASELINE.json north star): at 100 TB training-data
scale, media travels as opaque ``binary`` columns with typed metadata
structs; all Spark-side mechanics — schemas, partition-friendly batch
processing via ``mapInPandas`` (Arrow record batches), frame fan-out — are
real and tested here. The actual codec step is environment-dependent
(image/audio libraries are not in this container) and is isolated behind
``decoder`` callables: pass a real decoder in production; the default
raises ``NotImplementedError``; tests inject a deterministic fake.

Layout guidance at scale: media tables should be written with
``write_partitioned(..., ["kind"])`` and a bucket on ``media_id``; Arrow
batch sizes are bounded via ``spark.sql.execution.arrow.maxRecordsPerBatch``
so a batch of large blobs fits executor memory.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

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


def default_decoder(content: bytes, kind: str) -> list[float]:
    """Placeholder decode/feature-extract. Replace with a real codec stack
    (PIL/torchvision/ffmpeg) in deployments that have one."""
    raise NotImplementedError(
        "no media codec available in this environment; inject decoder="
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
