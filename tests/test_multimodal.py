from __future__ import annotations

import numpy as np
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


def test_default_decoder_rejects_malformed_video_and_unknown_kind(spark, media):
    # fixture video bytes are not YUV4MPEG2: must fail loudly
    vids = media.filter("kind = 'video'")
    with pytest.raises(Exception) as ei:
        extract_features(vids, decoder=default_decoder).collect()
    assert "YUV4MPEG2" in str(ei.value) or "ValueError" in str(ei.value)
    # an undeclared kind is invalid input, not a missing codec
    with pytest.raises(ValueError, match="unknown media kind"):
        default_decoder(b"anything", "hologram")


def test_default_decoder_rejects_malformed_image(spark, media):
    bad = media.filter("kind = 'image'")  # fake-PNG bytes: not Netpbm
    with pytest.raises(Exception) as ei:
        extract_features(bad, decoder=default_decoder).collect()
    assert "Netpbm" in str(ei.value) or "ValueError" in str(ei.value)


def test_default_decoder_rejects_malformed_audio(spark, media):
    bad = media.filter("kind = 'audio'")  # b"fake-wav-bytes": not RIFF
    with pytest.raises(Exception) as ei:
        extract_features(bad, decoder=default_decoder).collect()
    assert "RIFF" in str(ei.value) or "ValueError" in str(ei.value)


def test_wav_roundtrip_and_features():
    import numpy as np

    from polygon_algotrading_env_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
        wav_features,
    )

    rate = 8000
    t = np.arange(rate) / rate  # 1 s
    sig = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    blob = encode_wav(sig, rate)
    back, r = decode_wav(blob)
    assert r == rate and len(back) == rate
    assert float(np.max(np.abs(back - sig))) < 1e-3  # s16 quantization

    dur, nrate, rms, peak, zcr, b_lo, b_mid, b_hi = wav_features(blob, dim=8)
    assert abs(dur - 1.0) < 1e-9
    assert abs(nrate - rate / 48000.0) < 1e-12
    assert abs(rms - 0.5 / 2**0.5) < 1e-3  # sine RMS = A/sqrt(2)
    assert abs(peak - 0.5) < 1e-3
    # 440 Hz crosses zero 880 times/s → zcr ≈ 880/8000.
    assert abs(zcr - 880.0 / rate) < 0.01
    # A 440 Hz tone at 8 kHz lands in the lowest spectral third.
    assert b_lo > 0.9 and b_lo + b_mid + b_hi <= 1.0 + 1e-9


def test_wav_stereo_and_chunk_walk():
    import struct

    import numpy as np

    from polygon_algotrading_env_spark.operators.multimodal import decode_wav

    # Hand-build a stereo s16 WAV with an extra chunk before data.
    rate, frames = 4000, 100
    left = (np.ones(frames) * 16384).astype("<i2")
    right = (np.zeros(frames)).astype("<i2")
    inter = np.empty(2 * frames, dtype="<i2")
    inter[0::2], inter[1::2] = left, right
    body = inter.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, rate, rate * 4, 4, 16)
    junk = b"JUNK" + struct.pack("<I", 4) + b"zzzz"
    data = b"data" + struct.pack("<I", len(body)) + body
    riff_body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + junk + data
    blob = b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
    samples, r = decode_wav(blob)
    assert r == rate and len(samples) == frames
    # Stereo averaged to mono: (0.5 + 0.0) / 2.
    assert abs(samples[0] - 0.25) < 1e-3


def test_extract_features_real_wav_end_to_end(spark):
    import numpy as np

    from polygon_algotrading_env_spark.operators.multimodal import encode_wav

    rate = 8000
    rows = []
    for i, freq in enumerate([220.0, 880.0]):
        t = np.arange(rate // 2) / rate
        blob = encode_wav(0.4 * np.sin(2 * np.pi * freq * t), rate)
        rows.append((i, "audio", blob, ("audio/wav", None, None, 0.5, None)))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {
        r["media_id"]: list(r["feature"])
        for r in extract_features(media).collect()  # default (real) decoder
    }
    for i in (0, 1):
        assert abs(feats[i][0] - 0.5) < 1e-9  # duration
        assert abs(feats[i][2] - 0.4 / 2**0.5) < 1e-3  # rms
    # Higher frequency → higher zero-crossing rate.
    assert feats[1][4] > feats[0][4] * 2


def test_ppm_roundtrip_and_features():
    import numpy as np

    from polygon_algotrading_env_spark.operators.multimodal import (
        decode_ppm,
        encode_ppm,
        image_features,
    )

    h, w = 12, 20
    yy, xx = np.mgrid[0:h, 0:w]
    px = np.stack(
        [xx * 255 // (w - 1), yy * 255 // (h - 1), np.full((h, w), 7)], axis=2
    ).astype(np.uint8)
    blob = encode_ppm(px)
    back = decode_ppm(blob)
    assert back.shape == (h, w, 3)
    assert (back == px).all()

    nw, nh, aspect, lum_mean, lum_std, r_mean, g_mean, b_mean = image_features(
        blob, dim=8
    )
    assert abs(nw - w / 4096.0) < 1e-12 and abs(nh - h / 4096.0) < 1e-12
    assert abs(aspect - w / h) < 1e-12
    assert abs(r_mean - float(px[:, :, 0].mean()) / 255.0) < 1e-12
    assert abs(b_mean - 7.0 / 255.0) < 1e-12
    assert 0.0 < lum_mean < 1.0 and lum_std > 0.0


def test_ppm_header_variants_and_grayscale():
    import numpy as np

    from polygon_algotrading_env_spark.operators.multimodal import decode_ppm

    # comments in the header, multi-whitespace separators, P5 grayscale
    raster = bytes(range(6))
    blob = b"P5 # gray\n# another comment\n 3\n2 # dims\n255\n" + raster
    arr = decode_ppm(blob)
    assert arr.shape == (2, 3, 3)
    assert (arr[:, :, 0] == arr[:, :, 1]).all()  # gray broadcast to RGB
    assert arr[0, 1, 0] == 1
    # maxval rescale to 8-bit
    scaled = decode_ppm(b"P5 1 1 15\n" + bytes([15]))
    assert scaled[0, 0, 0] == 255
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(b"P6 2 2 255\n\x00\x00\x00")
    with pytest.raises(ValueError, match="Netpbm"):
        decode_ppm(b"P3 1 1 255\n0 0 0")  # ascii form unsupported


def test_extract_features_real_image_end_to_end(spark):
    import numpy as np

    from polygon_algotrading_env_spark.operators.multimodal import encode_ppm

    rows = []
    for i, level in enumerate([0, 255]):
        px = np.full((4, 6, 3), level, dtype=np.uint8)
        rows.append(
            (i, "image", encode_ppm(px), ("image/x-portable-pixmap", 6, 4, None, None))
        )
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {
        r["media_id"]: list(r["feature"])
        for r in extract_features(media).collect()  # default (real) decoder
    }
    assert abs(feats[0][3] - 0.0) < 1e-12  # black frame: zero luminance
    assert abs(feats[1][3] - 1.0) < 1e-9  # white frame: full luminance
    assert feats[0][4] == 0.0  # flat frame: zero contrast
    assert abs(feats[0][2] - 1.5) < 1e-12  # aspect 6/4


def test_frame_sampling_plan(spark, media):
    plan = plan_frame_samples(media, every_s=1.0, max_frames=64)
    rows = plan.collect()
    assert {r["media_id"] for r in rows} == {3}
    assert [r["frame_idx"] for r in sorted(rows, key=lambda r: r["frame_idx"])] == [0, 1, 2]
    assert rows[0]["t_s"] == 0.0


# --- resize ---------------------------------------------------------------

def test_resize_nearest_exact_mapping():
    import numpy as np

    from polygon_algotrading_env_spark.operators.multimodal import (
        resize_nearest,
    )

    # 2x2 checkerboard upsampled 2x: each source pixel becomes a 2x2 block
    src = np.zeros((2, 2, 3), dtype=np.uint8)
    src[0, 1] = src[1, 0] = 255
    up = resize_nearest(src, 4, 4)
    assert up.shape == (4, 4, 3)
    assert (up[0:2, 0:2] == 0).all() and (up[0:2, 2:4] == 255).all()
    assert (up[2:4, 0:2] == 255).all() and (up[2:4, 2:4] == 0).all()
    # downsample back recovers the checkerboard
    down = resize_nearest(up, 2, 2)
    assert (down == src).all()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        resize_nearest(src, 0, 4)


def test_resize_images_end_to_end(spark):
    import numpy as np

    from polygon_algotrading_env_spark.operators.multimodal import (
        decode_ppm,
        encode_ppm,
        resize_images,
    )

    grad = np.tile(
        np.linspace(0, 255, 16, dtype=np.uint8)[None, :, None], (8, 1, 3)
    )
    rows = [
        (1, "image", bytearray(encode_ppm(grad))),
        (2, "image", bytearray(b"not an image")),   # dropped, loudly optional
        (3, "audio", bytearray(b"RIFF....WAVE")),    # non-image: dropped
    ]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, content binary"
    )
    out = resize_images(df, 4, 4).collect()
    assert [r["media_id"] for r in out] == [1]
    r = out[0]
    assert (r["width"], r["height"]) == (4, 4)
    px = decode_ppm(bytes(r["content"]))
    assert px.shape == (4, 4, 3)
    # row-constant gradient stays row-constant after resize
    assert (px == px[0:1, :, :]).all()


def test_y4m_roundtrip_mono_and_c444_gray():
    """Grayscale content survives encode→decode byte-exactly in BOTH Cmono
    and C444 (U=V=128 makes BT.601 identity on Y); header fields parse."""
    import numpy as np

    from polygon_algotrading_env_spark.operators.multimodal import (
        decode_y4m,
        encode_y4m,
    )

    t, h, w = 4, 6, 8
    gray = (np.arange(t * h * w, dtype=np.uint8).reshape(t, h, w) * 7) % 256
    for mono in (True, False):
        blob = encode_y4m(gray, fps_num=30, fps_den=1, mono=mono)
        frames, fps = decode_y4m(blob)
        assert fps == 30.0
        assert frames.shape == (t, h, w, 3)
        for c in range(3):
            assert (frames[..., c] == gray).all(), ("mono" if mono else "c444", c)


def test_y4m_c420_chroma_upsample_and_fps():
    """Hand-built C420 stream: chroma planes at quarter resolution, nearest
    upsample, fractional frame rate (30000:1001 NTSC)."""
    import numpy as np

    from polygon_algotrading_env_spark.operators.multimodal import decode_y4m

    w, h = 4, 2
    y = np.full((h, w), 128, np.uint8)
    u = np.array([[90, 90]], np.uint8)    # 2x1 chroma for 4x2 luma
    v = np.array([[240, 110]], np.uint8)
    hdr = b"YUV4MPEG2 W4 H2 F30000:1001 Ip A1:1 C420jpeg\n"
    blob = hdr + b"FRAME\n" + y.tobytes() + u.tobytes() + v.tobytes()
    frames, fps = decode_y4m(blob)
    assert abs(fps - 30000 / 1001) < 1e-9
    assert frames.shape == (1, 2, 4, 3)
    # left 2x2 block shares (u=90, v=240): r = 128 + 1.402*112 ≈ 285 → 255
    assert (frames[0, :, :2, 0] == 255).all()
    # right block (v=110): r = 128 + 1.402*(-18) ≈ 102.8 → 103
    assert (frames[0, :, 2:, 0] == 103).all()


def test_y4m_malformed_inputs_fail_loudly():
    import numpy as np
    import pytest as _pytest

    from polygon_algotrading_env_spark.operators.multimodal import (
        decode_y4m,
        encode_y4m,
    )

    with _pytest.raises(ValueError, match="YUV4MPEG2"):
        decode_y4m(b"RIFF-not-video")
    with _pytest.raises(ValueError, match="colorspace"):
        decode_y4m(b"YUV4MPEG2 W2 H2 F25:1 C420p10\nFRAME\n" + b"\x00" * 6)
    with _pytest.raises(ValueError, match="truncated"):
        gray = np.zeros((1, 2, 2), np.uint8)
        decode_y4m(encode_y4m(gray)[:-2])
    with _pytest.raises(ValueError, match="no frames"):
        decode_y4m(b"YUV4MPEG2 W2 H2 F25:1 C444\n")
    with _pytest.raises(ValueError, match="divisible"):
        decode_y4m(b"YUV4MPEG2 W3 H2 F25:1 C420\nFRAME\n" + b"\x00" * 9)


def test_video_features_and_default_decoder_end_to_end(spark):
    """Third real modality e2e: synthesize a moving-gradient Y4M executor-
    side, decode through the DEFAULT decoder, check the motion proxy and
    duration land where the synthesis puts them."""
    import numpy as np

    from polygon_algotrading_env_spark.operators.multimodal import (
        encode_y4m,
        extract_features,
        video_features,
    )

    t, h, w = 10, 16, 16
    frames = np.zeros((t, h, w), np.uint8)
    for i in range(t):
        frames[i, :, (i * 3) % w] = 255  # a bright column marching right
    blob = encode_y4m(frames, fps_num=5, fps_den=1)
    feats = video_features(blob)
    assert feats[0] == 10.0            # frame count
    assert abs(feats[1] - 2.0) < 1e-9  # duration at 5 fps
    assert feats[7] > 0.0              # motion proxy nonzero

    media = spark.createDataFrame(
        [(1, "video", bytearray(blob))],
        "media_id bigint, kind string, content binary",
    )
    row = extract_features(media).collect()[0]
    assert row["kind"] == "video"
    assert list(row["feature"])[:2] == [10.0, 2.0]


def test_sample_video_frames_to_image_pipeline(spark):
    """Video→image handoff: sampled Y4M frames re-encode as P6 and flow
    through resize_images unchanged; cadence and cap honored; non-video
    and undecodable rows dropped."""
    import numpy as np

    from polygon_algotrading_env_spark.operators.multimodal import (
        decode_ppm,
        encode_y4m,
        resize_images,
        sample_video_frames,
    )

    t = 12
    frames = np.zeros((t, 8, 8), np.uint8)
    for i in range(t):
        frames[i, :, :] = i * 20  # distinguishable per-frame brightness
    blob = encode_y4m(frames, fps_num=4, fps_den=1)
    media = spark.createDataFrame(
        [
            (1, "video", bytearray(blob)),
            (2, "video", bytearray(b"not-a-video")),
            (3, "image", bytearray(b"P6\n1 1\n255\n\x00\x00\x00")),
        ],
        "media_id bigint, kind string, content binary",
    )
    out = sample_video_frames(media, every_s=1.0, max_frames=2).collect()
    assert [(r["media_id"], r["frame_idx"], r["t_s"]) for r in out] == [
        (1, 0, 0.0),
        (1, 4, 1.0),
    ]
    px = decode_ppm(bytes(out[1]["content"]))
    assert (px == 4 * 20).all()
    # frames are valid image rows for the downstream image pass
    resized = resize_images(
        spark.createDataFrame(
            [(r["media_id"], "image", r["content"]) for r in out],
            "media_id bigint, kind string, content binary",
        ),
        out_h=4,
        out_w=4,
    ).collect()
    assert len(resized) == 2 and all(r["width"] == 4 for r in resized)


# --- PNG: the first compressed container (stdlib zlib) ---------------------


def _png_forward_filter(arr, ftypes):
    """Reference forward-filterer (RFC 2083) so the decoder's unfiltering
    is tested against independently-constructed streams for ALL five
    filter types, not just the filter-0 rows encode_png emits."""
    import struct
    import zlib

    h, w, ch = arr.shape
    stride = w * ch
    flat = arr.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    for r in range(h):
        ft = ftypes[r % len(ftypes)]
        raw.append(ft)
        prev = flat[r - 1] if r else np.zeros(stride, np.int32)
        line = flat[r]
        for i in range(stride):
            a = int(line[i - ch]) if i >= ch else 0
            b = int(prev[i])
            c = int(prev[i - ch]) if (i >= ch and r) else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            raw.append((int(line[i]) - pred) & 0xFF)

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_roundtrip_and_features():
    from polygon_algotrading_env_spark.operators.multimodal import (
        decode_png,
        encode_png,
        image_features,
    )

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, (13, 9, 3), dtype=np.uint8)
    blob = encode_png(px)
    assert blob.startswith(b"\x89PNG\r\n\x1a\n")
    assert np.array_equal(decode_png(blob), px)
    feats = image_features(blob)
    assert feats[0] == 9 / 4096.0 and feats[1] == 13 / 4096.0
    assert abs(feats[5] - px[:, :, 0].mean() / 255.0) < 1e-12


def test_png_all_five_filters_unfilter_correctly():
    from polygon_algotrading_env_spark.operators.multimodal import decode_png

    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, (10, 7, 3), dtype=np.uint8)
    # one stream cycling every filter type, and one stream per type
    for ftypes in ([0, 1, 2, 3, 4], [1], [2], [3], [4]):
        blob = _png_forward_filter(px, ftypes)
        assert np.array_equal(decode_png(blob), px), f"filters {ftypes}"


def test_png_color_types_normalize_to_rgb():
    from polygon_algotrading_env_spark.operators.multimodal import decode_png

    rng = np.random.RandomState(3)
    gray = rng.randint(0, 256, (6, 5, 1), dtype=np.uint8)
    out = decode_png(_png_forward_filter(gray, [0, 2]))
    assert out.shape == (6, 5, 3) and np.array_equal(out[:, :, 0], gray[:, :, 0])
    assert np.array_equal(out[:, :, 1], out[:, :, 2])
    ga = rng.randint(0, 256, (6, 5, 2), dtype=np.uint8)
    out = decode_png(_png_forward_filter(ga, [1, 4]))
    assert out.shape == (6, 5, 3) and np.array_equal(out[:, :, 0], ga[:, :, 0])
    rgba = rng.randint(0, 256, (4, 4, 4), dtype=np.uint8)
    out = decode_png(_png_forward_filter(rgba, [3]))
    assert out.shape == (4, 4, 3) and np.array_equal(out, rgba[:, :, :3])


def test_png_malformed_inputs_fail_loudly():
    import pytest

    from polygon_algotrading_env_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    px = np.full((4, 4, 3), 9, np.uint8)
    blob = bytearray(encode_png(px))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"NOPE" + bytes(blob))
    corrupt = bytearray(blob)
    corrupt[40] ^= 0xFF  # flip an IDAT byte -> CRC mismatch
    with pytest.raises(ValueError, match="CRC|truncated"):
        decode_png(bytes(corrupt))
    with pytest.raises(ValueError, match="truncated|missing"):
        decode_png(bytes(blob[:30]))


def test_png_through_extract_features_and_resize(spark):
    from polygon_algotrading_env_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_image,
        decode_png,
        encode_png,
        extract_features,
        resize_images,
    )

    yy, xx = np.mgrid[0:12, 0:8]
    px = np.stack(
        [(xx * 31) % 256, (yy * 17) % 256, np.full((12, 8), 77)], axis=2
    ).astype(np.uint8)
    rows = [
        (1, "image", bytearray(encode_png(px)), ("image/png", 8, 12, None, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = extract_features(media).collect()
    assert len(feats) == 1 and feats[0]["feature"][0] == 8 / 4096.0
    resized = resize_images(media, 6, 6).collect()
    assert len(resized) == 1
    out = bytes(resized[0]["content"])
    assert out.startswith(b"\x89PNG")  # container preserved
    assert decode_png(out).shape == (6, 6, 3)
    assert decode_image(out).shape == (6, 6, 3)


# --- GIF87a/LZW: the second compressed image container --------------------

def test_gif_roundtrip_including_interlace_and_width_growth():
    from polygon_algotrading_env_spark.operators.multimodal import (
        decode_gif,
        decode_image,
        encode_gif,
    )

    rng = np.random.default_rng(3)
    for h, w, nc in [(16, 16, 4), (40, 60, 200), (23, 23, 256), (1, 1, 1)]:
        palette = rng.integers(0, 256, (nc, 3), dtype=np.uint8)
        img = palette[rng.integers(0, nc, (h, w))]
        for interlace in (False, True):
            blob = encode_gif(img, interlace=interlace)
            assert np.array_equal(decode_gif(blob), img)
        assert np.array_equal(decode_image(encode_gif(img)), img)
    # noise at 300x300 with a full 256-color table forces code-width
    # growth to 12 bits AND multiple 4096-entry clear/reset cycles
    palette = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    img = palette[rng.integers(0, 256, (300, 300))]
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_gif_decoder_reads_spec_valid_uncompressed_variant():
    """Decoder validity independent of our OWN encoder: hand-build the
    classic 'uncompressed GIF' — every pixel a literal code, a clear
    code re-emitted before the table can ever grow past the initial
    width — which a spec decoder must accept without exercising any of
    the encoder's width-bump timing."""
    from polygon_algotrading_env_spark.operators.multimodal import decode_gif

    w = h = 6
    idx = np.arange(w * h, dtype=np.uint8) % 4
    palette = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8
    )
    min_code, cs = 2, 3
    clear, end = 4, 5
    acc = nbits = 0
    out = bytearray()

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += cs
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for i, px in enumerate(idx):
        if i and i % 2 == 0:  # clear long before the table could grow
            emit(clear)
        emit(int(px))
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    blob = (
        b"GIF87a"
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + bytes([0x81, 0, 0])
        + palette.tobytes()
        + b"\x2c" + b"\x00" * 4
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + b"\x00" + bytes([min_code])
        + bytes([len(out)]) + bytes(out) + b"\x00\x3b"
    )
    assert np.array_equal(decode_gif(blob), palette[idx.reshape(h, w)])


def test_gif89a_extensions_skipped_and_local_table_wins():
    from polygon_algotrading_env_spark.operators.multimodal import (
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(5)
    palette = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    img = palette[rng.integers(0, 8, (10, 10))]
    blob = encode_gif(img)
    # split at end of header+GCT: 13 + 3 * 2^ct_bits, ct_bits = 3 -> 8 entries
    head = 13 + 3 * 8
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control extension
    g89 = b"GIF89a" + blob[6:head] + ext + blob[head:]
    assert np.array_equal(decode_gif(g89), img)


def test_gif_malformed_inputs_fail_loudly():
    import pytest

    from polygon_algotrading_env_spark.operators.multimodal import (
        decode_gif,
        encode_gif,
    )

    img = np.zeros((4, 4, 3), np.uint8)
    blob = encode_gif(img)
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOTGIF" + blob[6:])
    with pytest.raises(ValueError, match="truncated GIF header"):
        decode_gif(b"GIF87a")
    with pytest.raises(ValueError, match="truncated|unterminated|ended early"):
        decode_gif(blob[:20])
    with pytest.raises(ValueError, match="256"):
        rng = np.random.default_rng(1)
        encode_gif(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8))


def test_gif_through_extract_features_and_resize(spark):
    from polygon_algotrading_env_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_image,
        encode_gif,
        extract_features,
        resize_images,
    )

    yy, xx = np.mgrid[0:12, 0:8]
    px = np.stack(
        [(xx * 31) % 256, (yy * 17) % 32, np.full((12, 8), 77)], axis=2
    ).astype(np.uint8)
    rows = [
        (1, "image", bytearray(encode_gif(px)), ("image/gif", 8, 12, None, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = extract_features(media).collect()
    assert len(feats) == 1 and feats[0]["feature"][0] == 8 / 4096.0
    resized = resize_images(media, 6, 6).collect()
    assert len(resized) == 1
    assert decode_image(bytes(resized[0]["content"])).shape == (6, 6, 3)


# --- baseline JPEG: the third compressed image container -------------------

def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_jpeg_roundtrip_444_and_420():
    from polygon_algotrading_env_spark.operators.multimodal import (
        decode_image,
        decode_jpeg,
        encode_jpeg,
    )

    yy, xx = np.mgrid[0:64, 0:64]
    smooth = np.clip(
        np.stack(
            [
                128 + 100 * np.sin(xx / 10),
                128 + 100 * np.cos(yy / 9),
                128 + 80 * np.sin((xx + yy) / 14),
            ],
            axis=2,
        ),
        0,
        255,
    ).astype(np.uint8)
    d444 = decode_jpeg(encode_jpeg(smooth, quant=2, subsample="444"))
    assert d444.shape == smooth.shape and _psnr(smooth, d444) > 45
    d420 = decode_jpeg(encode_jpeg(smooth, quant=2, subsample="420"))
    assert d420.shape == smooth.shape and _psnr(smooth, d420) > 30
    # constant image survives EXACTLY (DC-only blocks, flat quant)
    const = np.full((13, 17, 3), 120, np.uint8)  # odd dims: edge padding
    for sub in ("444", "420"):
        d = decode_jpeg(encode_jpeg(const, quant=4, subsample=sub))
        assert np.array_equal(d, const), sub
    assert decode_image(encode_jpeg(const)).shape == (13, 17, 3)


def test_jpeg_grayscale_single_component():
    from polygon_algotrading_env_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    g = (np.mgrid[0:20, 0:30][1] * 8 % 256).astype(np.uint8)
    img = np.repeat(g[:, :, None], 3, axis=2)
    d = decode_jpeg(encode_jpeg(img, quant=2, gray=True))
    assert d.shape == (20, 30, 3)
    # pure-gray input -> luma == input; flat quant 2 keeps the ramp exact
    assert np.array_equal(d, img)


def test_jpeg_restart_markers_reset_predictors():
    from polygon_algotrading_env_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    yy, xx = np.mgrid[0:40, 0:56]
    img = np.stack(
        [(xx * 4) % 256, (yy * 5) % 256, ((xx + yy) * 3) % 256], axis=2
    ).astype(np.uint8)
    plain = decode_jpeg(encode_jpeg(img, quant=2, subsample="444"))
    with_dri = decode_jpeg(
        encode_jpeg(img, quant=2, subsample="444", restart_interval=3)
    )
    # restart segmentation is lossless relative to the same-quant stream
    assert np.array_equal(plain, with_dri)


def test_jpeg_rejects_non_baseline_and_malformed():
    import pytest

    from polygon_algotrading_env_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    img = np.full((8, 8, 3), 99, np.uint8)
    blob = bytearray(encode_jpeg(img))
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"XX" + bytes(blob[2:]))
    with pytest.raises(ValueError, match="truncated|ended early|marker"):
        decode_jpeg(bytes(blob[:40]))
    # flip SOF0 -> SOF2 (progressive): must refuse, not mis-decode
    sof = bytes(blob).find(b"\xff\xc0")
    blob[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(blob))


def test_jpeg_through_extract_features_and_resize(spark):
    from polygon_algotrading_env_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_image,
        encode_jpeg,
        extract_features,
        resize_images,
    )

    yy, xx = np.mgrid[0:12, 0:8]
    px = np.stack(
        [(xx * 20) % 256, (yy * 15) % 256, np.full((12, 8), 77)], axis=2
    ).astype(np.uint8)
    rows = [
        (1, "image", bytearray(encode_jpeg(px, quant=2)),
         ("image/jpeg", 8, 12, None, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = extract_features(media).collect()
    assert len(feats) == 1 and feats[0]["feature"][0] == 8 / 4096.0
    resized = resize_images(media, 6, 6).collect()
    assert len(resized) == 1
    assert decode_image(bytes(resized[0]["content"])).shape == (6, 6, 3)


# --- animated GIF: the compressed video container --------------------------

def test_gif_anim_roundtrip_and_video_features():
    from polygon_algotrading_env_spark.operators.multimodal import (
        decode_gif_anim,
        decode_video,
        encode_gif_anim,
        video_features,
    )

    rng = np.random.default_rng(4)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    frames = pal[rng.integers(0, 16, (5, 12, 10))]
    blob = encode_gif_anim(frames, fps=4.0)
    back, fps = decode_gif_anim(blob)
    assert np.array_equal(back, frames)
    assert abs(fps - 4.0) < 0.2
    f = video_features(blob)
    assert f[0] == 5.0 and abs(f[1] - 5 / fps) < 1e-9
    # grayscale TxHxW broadcast; dispatch routes by magic bytes
    g = (rng.integers(0, 4, (3, 6, 6)) * 80).astype(np.uint8)
    assert decode_video(encode_gif_anim(g, fps=10))[0].shape == (3, 6, 6, 3)


def test_gif_anim_rejects_partial_frames_and_bad_input():
    import pytest

    from polygon_algotrading_env_spark.operators.multimodal import (
        decode_gif_anim,
        encode_gif_anim,
    )

    frames = np.zeros((2, 4, 4, 3), np.uint8)
    blob = bytearray(encode_gif_anim(frames))
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif_anim(b"NOPE!!" + bytes(blob[6:]))
    # forge a non-full-screen frame: shrink the image descriptor width
    im = bytes(blob).find(b"\x2c")
    blob[im + 5 : im + 7] = (3).to_bytes(2, "little")
    with pytest.raises(ValueError, match="full-screen"):
        decode_gif_anim(bytes(blob))
    with pytest.raises(ValueError, match="256"):
        rng = np.random.default_rng(1)
        encode_gif_anim(rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8))


def test_gif_anim_through_extract_features(spark):
    from polygon_algotrading_env_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_gif_anim,
        extract_features,
    )

    frames = np.zeros((4, 8, 8, 3), np.uint8)
    frames[:, :, ::2] = 200
    rows = [
        (1, "video", bytearray(encode_gif_anim(frames, fps=2.0)),
         ("image/gif", 8, 8, 2.0, 2.0)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = extract_features(media).collect()
    assert len(feats) == 1 and feats[0]["feature"][0] == 4.0


# --- QOI codec -------------------------------------------------------------
def test_qoi_roundtrip_random_and_features():
    from polygon_algotrading_env_spark.operators.multimodal import (
        decode_image,
        decode_qoi,
        encode_qoi,
        image_features,
    )

    rng = np.random.RandomState(23)
    px = rng.randint(0, 256, (11, 7, 3), dtype=np.uint8)
    blob = encode_qoi(px)
    assert blob.startswith(b"qoif") and blob.endswith(b"\x00" * 7 + b"\x01")
    assert np.array_equal(decode_qoi(blob), px)
    # magic-byte dispatch routes QOI through the shared image path
    assert np.array_equal(decode_image(blob), px)
    feats = image_features(blob)
    assert feats[0] == 7 / 4096.0 and feats[1] == 11 / 4096.0


def test_qoi_compresses_structured_images_via_all_ops():
    from polygon_algotrading_env_spark.operators.multimodal import (
        decode_qoi,
        encode_qoi,
    )

    # constant image: pure RUN coding, incl. the 62-run chunk cap
    flat = np.full((16, 16, 3), 99, np.uint8)
    blob = encode_qoi(flat)
    assert np.array_equal(decode_qoi(blob), flat)
    assert len(blob) < 14 + 8 + 16  # header + end marker + a few run bytes

    # two-color checkerboard: INDEX hits after the first two pixels
    cb = np.zeros((8, 8, 3), np.uint8)
    cb[(np.arange(8)[:, None] + np.arange(8)) % 2 == 1] = (1, 2, 3)
    blob = encode_qoi(cb)
    assert np.array_equal(decode_qoi(blob), cb)
    assert len(blob) < 14 + 8 + 2 * 8 * 8  # far under 1 op-byte/pixel avg

    # smooth gradient: DIFF/LUMA coding beats raw bytes
    yy, xx = np.mgrid[0:16, 0:16]
    grad = np.stack([xx * 2, yy * 2, xx + yy], axis=2).astype(np.uint8)
    blob = encode_qoi(grad)
    assert np.array_equal(decode_qoi(blob), grad)
    assert len(blob) < 16 * 16 * 3


def test_qoi_decodes_handcrafted_rgba_ops_and_wrapping():
    import struct as _struct

    from polygon_algotrading_env_spark.operators.multimodal import decode_qoi

    # 4x1 RGBA stream: RGBA op, DIFF with mod-256 wrap (255+1 -> 0),
    # INDEX recall of the first pixel (hash(255,0,0,128) = 61), RUN 1.
    blob = (
        b"qoif"
        + _struct.pack(">IIBB", 4, 1, 4, 0)
        + bytes([0xFF, 255, 0, 0, 128, 0x7A, 61, 0xC0])
        + b"\x00" * 7
        + b"\x01"
    )
    out = decode_qoi(blob)
    assert out.shape == (1, 4, 3)  # alpha dropped on return
    assert [tuple(p) for p in out[0]] == [
        (255, 0, 0), (0, 0, 0), (255, 0, 0), (255, 0, 0)
    ]

    # 1x1 LUMA op from the spec-defined (0,0,0,255) start pixel:
    # dg=+10, dr=+12, db=+5
    blob = (
        b"qoif"
        + _struct.pack(">IIBB", 1, 1, 3, 0)
        + bytes([0xAA, 0xA3])
        + b"\x00" * 7
        + b"\x01"
    )
    assert [tuple(p) for p in decode_qoi(blob)[0]] == [(12, 10, 5)]


def test_qoi_malformed_inputs_fail_loudly():
    import struct as _struct

    from polygon_algotrading_env_spark.operators.multimodal import (
        decode_qoi,
        encode_qoi,
    )

    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    blob = encode_qoi(px)
    with pytest.raises(ValueError, match="not a QOI"):
        decode_qoi(b"qoix" + blob[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_qoi(blob[: len(blob) // 2])
    with pytest.raises(ValueError, match="channel count"):
        decode_qoi(blob[:12] + b"\x02" + blob[13:])
    # a run chunk that overshoots width*height
    over = (
        b"qoif"
        + _struct.pack(">IIBB", 2, 1, 3, 0)
        + bytes([0xFE, 9, 9, 9, 0xC0 | 61])
        + b"\x00" * 7
        + b"\x01"
    )
    with pytest.raises(ValueError, match="run past end"):
        decode_qoi(over)
    with pytest.raises(ValueError, match="expected HxWx3"):
        encode_qoi(np.zeros((2, 2, 4), np.uint8))


def test_qoi_through_extract_features_and_resize(spark):
    from polygon_algotrading_env_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_qoi,
        extract_features,
    )

    rng = np.random.RandomState(31)
    px = rng.randint(0, 256, (12, 9, 3), dtype=np.uint8)
    rows = [(1, "image", bytearray(encode_qoi(px)), ("image/qoi", 9, 12, None, None))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = extract_features(media).collect()
    assert len(feats) == 1
    assert feats[0]["feature"][0] == 9 / 4096.0
    assert feats[0]["feature"][1] == 12 / 4096.0


# --- BMP codec -------------------------------------------------------------
def test_bmp_roundtrip_padding_and_dispatch():
    from polygon_algotrading_env_spark.operators.multimodal import (
        decode_bmp,
        decode_image,
        encode_bmp,
        image_features,
    )

    rng = np.random.RandomState(41)
    # widths 5 and 13 exercise nonzero 4-byte row padding; 4 exercises none
    for h, w in [(7, 5), (4, 4), (1, 1), (9, 13)]:
        px = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        blob = encode_bmp(px)
        assert blob[:2] == b"BM"
        assert np.array_equal(decode_bmp(blob), px)
        assert np.array_equal(decode_image(blob), px)
    feats = image_features(encode_bmp(px))
    assert feats[0] == 13 / 4096.0 and feats[1] == 9 / 4096.0


def test_bmp_topdown_and_32bit_variants():
    import struct as _struct

    from polygon_algotrading_env_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    rng = np.random.RandomState(43)
    px = rng.randint(0, 256, (6, 5, 3), dtype=np.uint8)
    blob = bytearray(encode_bmp(px))
    # forge top-down: negative height + un-flipped raster
    blob[22:26] = _struct.pack("<i", -6)
    stride = (5 * 3 + 3) & ~3
    raster = (
        np.frombuffer(bytes(blob[54:]), dtype=np.uint8)
        .reshape(6, stride)[::-1]
        .tobytes()
    )
    blob[54:] = raster
    assert np.array_equal(decode_bmp(bytes(blob)), px)

    # hand-built 32-bit BGRA single pixel (255,0,0) red with alpha junk
    raster32 = bytes([0, 0, 255, 99])
    hdr = (
        b"BM"
        + _struct.pack("<IHHI", 54 + 4, 0, 0, 54)
        + _struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 32, 0, 4, 0, 0, 0, 0)
    )
    out = decode_bmp(hdr + raster32)
    assert out.shape == (1, 1, 3) and tuple(out[0, 0]) == (255, 0, 0)


def test_bmp_malformed_inputs_fail_loudly():
    import struct as _struct

    from polygon_algotrading_env_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    px = np.zeros((3, 3, 3), np.uint8)
    blob = bytearray(encode_bmp(px))
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"XX" + bytes(blob[2:]))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(bytes(blob[:-4]))
    comp = bytearray(blob)
    comp[30:34] = _struct.pack("<I", 1)  # BI_RLE8
    with pytest.raises(ValueError, match="compression"):
        decode_bmp(bytes(comp))
    pal = bytearray(blob)
    pal[28:30] = _struct.pack("<H", 8)
    with pytest.raises(ValueError, match="bit depth"):
        decode_bmp(bytes(pal))
