from __future__ import annotations

import pytest

from polygon_algotrading_env_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    attach_content_stats,
    default_decoder,
    deterministic_fake_decoder,
    extract_features,
    plan_frame_samples,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNG-fake-bytes-1", ("image/png", 64, 64, None, None)),
        (2, "image", b"\x89PNG-fake-bytes-2", ("image/png", 32, 32, None, None)),
        (3, "video", b"RIFF-fake-av", ("video/mp4", 640, 480, 3.5, 30.0)),
        (4, "audio", b"fake-wav-bytes", ("audio/wav", None, None, 2.0, None)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_content_stats(spark, media):
    out = {r["media_id"]: r for r in attach_content_stats(media).collect()}
    assert out[1]["n_bytes"] == len(b"\x89PNG-fake-bytes-1")
    assert out[1]["content_fp"] != out[2]["content_fp"]


def test_extract_features_via_mapinpandas(spark, media):
    feats = extract_features(media, decoder=deterministic_fake_decoder(dim=8))
    rows = {r["media_id"]: r for r in feats.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert len(rows[1]["feature"]) == 8
    assert all(0.0 <= v <= 1.0 for v in rows[1]["feature"])
    # Deterministic: same content → same feature; different → different.
    again = {
        r["media_id"]: r["feature"]
        for r in extract_features(media, deterministic_fake_decoder(8)).collect()
    }
    assert again[1] == list(rows[1]["feature"])
    assert again[1] != again[2]


def test_default_decoder_is_explicit_stub(spark, media):
    with pytest.raises(Exception) as ei:
        extract_features(media, decoder=default_decoder).collect()
    assert "NotImplementedError" in str(ei.value) or "codec" in str(ei.value)


def test_frame_sampling_plan(spark, media):
    plan = plan_frame_samples(media, every_s=1.0, max_frames=64)
    rows = plan.collect()
    assert {r["media_id"] for r in rows} == {3}
    assert [r["frame_idx"] for r in sorted(rows, key=lambda r: r["frame_idx"])] == [0, 1, 2]
    assert rows[0]["t_s"] == 0.0
