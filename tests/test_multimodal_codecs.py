"""Real (codec-free) multimodal decoders: WAV/PCM via stdlib wave +
numpy, uncompressed BMP via a numpy header parse, uncompressed AVI
via a RIFF chunk walk over the same DIB frame layout. The payloads are
synthesized bit-exactly in the test, so the decoded features have
closed-form expected values — no media library on either side.

Reference parity note: the reference repo has no media path at all;
this is the beyond-parity multimodal leg with the decode boundary
narrowed to genuinely-unavailable codecs (JPEG/PNG/MP3 still raise).
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest
from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
    multimodal as MM,
)


def make_wav(samples: np.ndarray, rate: int = 8000, n_ch: int = 1) -> bytes:
    """16-bit PCM WAV from float samples in [-1, 1]."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((samples * 32767).astype(np.int16).tobytes())
    return buf.getvalue()


def make_bmp(pixels_rgb: np.ndarray) -> bytes:
    """Uncompressed 24-bit bottom-up BMP from an H×W×3 uint8 array."""
    h, w, _ = pixels_rgb.shape
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for row in pixels_rgb[::-1]:  # bottom-up
        line = row[:, ::-1].tobytes()  # RGB -> BGR
        body += line + b"\x00" * (stride - len(line))
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(body), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return bytes(header + body)


# ---------------------------------------------------------------- WAV


def test_decode_wav_roundtrip_mono():
    rate = 8000
    t = np.arange(rate // 2) / rate  # 0.5 s
    sine = 0.5 * np.sin(2 * np.pi * 440 * t)
    x, r = MM._decode_wav(make_wav(sine, rate))
    assert r == rate and len(x) == len(sine)
    assert np.abs(x - sine).max() < 1e-3  # 16-bit quantization


def test_decode_wav_downmixes_stereo():
    rate = 8000
    left = np.full(100, 0.5)
    right = np.full(100, -0.5)
    inter = np.empty(200)
    inter[0::2], inter[1::2] = left, right
    x, r = MM._decode_wav(make_wav(inter, rate, n_ch=2))
    assert len(x) == 100
    assert np.abs(x).max() < 1e-3  # L/R cancel after downmix


def test_extract_audio_features_real_wav_rms(spark):
    """Per-frame RMS of a known constant-amplitude clip: RMS of a
    full-scale-0.5 sine is 0.5/√2 ≈ 0.3536 in every complete frame."""
    rate, secs = 8000, 3
    t = np.arange(rate * secs) / rate
    payload = make_wav(0.5 * np.sin(2 * np.pi * 440 * t), rate)
    df = spark.createDataFrame(
        [(1, bytearray(payload), int(secs * 1000), rate)],
        "media_id long, payload binary, duration_ms long, sample_rate int",
    ).select(
        "media_id",
        MM.pack_media(
            F.col("payload"), F.lit("audio/wav"),
            duration_ms=F.col("duration_ms"), sample_rate=F.col("sample_rate"),
        ).alias("media"),
    )
    out = MM.extract_audio_features(df, fake=False, frame_ms=1000).collect()
    assert len(out) == secs  # frame count from the ACTUAL samples
    assert sorted(r["frame_idx"] for r in out) == list(range(secs))
    for r in out:
        assert r["rms"] == pytest.approx(0.5 / np.sqrt(2), abs=1e-3)


def test_extract_audio_features_non_wav_raises(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"ID3\x03fake-mp3"), 1000, 44100)],
        "media_id long, payload binary, duration_ms long, sample_rate int",
    ).select(
        "media_id",
        MM.pack_media(
            F.col("payload"), F.lit("audio/mpeg"),
            duration_ms=F.col("duration_ms"), sample_rate=F.col("sample_rate"),
        ).alias("media"),
    )
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as ei:
        MM.extract_audio_features(df, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


# ---------------------------------------------------------------- BMP


def test_decode_bmp_known_pixels():
    px = np.zeros((2, 3, 3), np.uint8)
    px[0, 0] = (255, 0, 0)   # red, top-left
    px[1, 2] = (0, 0, 255)   # blue, bottom-right
    img, w, h = MM._decode_bmp(make_bmp(px))
    assert (w, h) == (3, 2)
    assert img.shape == (2, 3, 3)
    assert tuple(img[0, 0]) == (255, 0, 0)
    assert tuple(img[1, 2]) == (0, 0, 255)
    assert img.sum() == 510  # nothing else lit


def test_extract_image_features_real_bmp(spark):
    """Feature contract on a solid gray 4×2 BMP: channel means are
    100/255, std 0, luma mean = 100/255, aspect = 2.0."""
    px = np.full((2, 4, 3), 100, np.uint8)
    payload = make_bmp(px)
    df = spark.createDataFrame(
        [(7, bytearray(payload), 4, 2)],
        "media_id long, payload binary, width int, height int",
    ).select(
        "media_id",
        MM.pack_media(
            F.col("payload"), F.lit("image/bmp"),
            width=F.col("width"), height=F.col("height"),
        ).alias("media"),
    )
    row = MM.extract_image_features(df, fake=False).collect()[0]
    f = row["features"]
    for ch in range(3):
        assert f[ch] == pytest.approx(100 / 255, abs=1e-6)
    assert f[3] == pytest.approx(0.0, abs=1e-6)   # std of a solid fill
    assert f[4] == pytest.approx(100 / 255, abs=1e-6)
    assert f[6] == pytest.approx(2.0)


def test_decode_bmp_rejects_compressed_and_truncated():
    px = np.zeros((2, 2, 3), np.uint8)
    good = bytearray(make_bmp(px))
    with pytest.raises(ValueError, match="truncated"):
        MM._decode_bmp(bytes(good[:-4]))
    bad = bytearray(good)
    struct.pack_into("<I", bad, 30, 1)  # compression = RLE8
    with pytest.raises(ValueError, match="unsupported"):
        MM._decode_bmp(bytes(bad))
    with pytest.raises(ValueError, match="not a BMP"):
        MM._decode_bmp(b"\x89PNG\r\n\x1a\n")


def test_image_features_non_bmp_still_raises():
    with pytest.raises(NotImplementedError, match="PIL"):
        MM._decode_image_bytes(b"\xff\xd8\xff\xe0fakejpeg", fake=False)


# ------------------------------------------------------- properties

from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=400),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_roundtrip_property(n, rate, seed):
    """encode→decode is lossless up to 16-bit quantization for any
    sample vector: encode truncates at scale 32767, decode divides
    by 32768, so |error| ≤ 1/32768 (truncation) + |s|/32768 (scale
    ratio) < 2/32768."""
    rng = np.random.default_rng(seed)
    samples = rng.uniform(-0.999, 0.999, n)
    x, r = MM._decode_wav(make_wav(samples, rate))
    assert r == rate and len(x) == n
    assert np.abs(x - samples).max() <= 2.0 / 32768 + 1e-9


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=17),
    h=st.integers(min_value=1, max_value=9),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_bmp_roundtrip_property(w, h, seed):
    """encode→decode returns the exact pixel array for any size,
    including widths whose rows need 4-byte padding."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    img, ww, hh = MM._decode_bmp(make_bmp(px))
    assert (ww, hh) == (w, h)
    assert np.array_equal(img, px)


# ---------------------------------------------------------------- AVI


def make_avi(frames_rgb: list[np.ndarray], fps: int = 10) -> bytes:
    """Minimal uncompressed AVI: RIFF('AVI ') { LIST(hdrl){avih},
    LIST(movi){00db...} } with bottom-up padded BGR frames — the
    same DIB layout as BMP bodies."""
    h, w, _ = frames_rgb[0].shape

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    def dib(frame: np.ndarray) -> bytes:
        stride = (w * 3 + 3) & ~3
        body = bytearray()
        for row in frame[::-1]:
            line = row[:, ::-1].tobytes()
            body += line + b"\x00" * (stride - len(line))
        return bytes(body)

    avih = struct.pack(
        "<14I", 1_000_000 // fps, 0, 0, 0, len(frames_rgb), 0, 1, 0, w, h, 0, 0, 0, 0
    )
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
    movi = chunk(b"LIST", b"movi" + b"".join(chunk(b"00db", dib(f)) for f in frames_rgb))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def test_parse_avi_geometry_and_frames():
    f0 = np.full((2, 3, 3), 10, np.uint8)
    f1 = np.full((2, 3, 3), 200, np.uint8)
    frames, w, h, fps = MM._parse_avi(make_avi([f0, f1], fps=20))
    assert (w, h) == (3, 2) and fps == pytest.approx(20.0)
    assert len(frames) == 2
    assert np.array_equal(MM._dib_to_rgb(frames[0], w, h, 24), f0)
    assert np.array_equal(MM._dib_to_rgb(frames[1], w, h, 24), f1)


def test_parse_avi_rejects_non_avi_and_compressed_only():
    with pytest.raises(ValueError, match="not an AVI"):
        MM._parse_avi(b"RIFF\x04\x00\x00\x00WAVE")
    # container with one compressed frame only
    comp = make_avi([np.zeros((1, 1, 3), np.uint8)])
    comp = comp.replace(b"00db", b"00dc")
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        MM._parse_avi(comp)


def test_extract_video_frames_real_avi(spark):
    """Mean-RGB per sampled frame of a 4-frame gradient clip at
    10 fps: frame i is a solid fill of 50·i, so mean channels are
    50·i/255, frame_ms = 100·i."""
    frames = [np.full((2, 2, 3), 50 * i, np.uint8) for i in range(4)]
    payload = make_avi(frames, fps=10)
    df = spark.createDataFrame(
        [(3, bytearray(payload))], "media_id long, payload binary"
    ).select(
        "media_id",
        MM.pack_media(F.col("payload"), F.lit("video/x-msvideo")).alias("media"),
    )
    out = {r["frame_idx"]: r for r in MM.extract_video_frames(df).collect()}
    assert sorted(out) == [0, 1, 2, 3]
    for i, r in out.items():
        for ch in ("mean_r", "mean_g", "mean_b", "luma"):
            assert r[ch] == pytest.approx(50 * i / 255, abs=1e-6)
        assert r["frame_ms"] == 100 * i
    # every_n sampling
    sampled = MM.extract_video_frames(df, every_n=2).collect()
    assert sorted(r["frame_idx"] for r in sampled) == [0, 2]
