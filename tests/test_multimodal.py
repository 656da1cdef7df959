"""Multimodal plumbing: Arrow-batched mapInPandas over binary columns.

Image (BMP/PPM) and audio (PCM WAV) decode kernels are REAL — verified here
against hand-constructed assets with known pixel/signal content. Video and
unparseable bytes take the deterministic content-hash fallback."""

import io
import math
import struct
import wave

import pytest

from etl_api_bigquery_spark.functions.multimodal import (
    _decode_audio, _decode_image, _decode_stub, decode_feature,
    extract_features, synthetic_media)


def _bmp(w, h, rgb):
    """Minimal 24-bit uncompressed BMP of a solid color."""
    stride = (w * 3 + 3) & ~3
    size = 54 + stride * h
    head = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h,
                      2835, 2835, 0, 0)
    row = bytes(rgb[::-1]) * w           # BMP stores BGR
    row += b"\0" * (stride - w * 3)
    return head + dib + row * h


def _ppm(w, h, rgb):
    return (f"P6\n# comment\n{w} {h}\n255\n".encode()
            + bytes(rgb) * (w * h))


def _wav(freq=1000.0, rate=8000, sec=0.5, amp=0.5):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        n = int(rate * sec)
        frames = b"".join(
            struct.pack("<h", int(amp * 32767 *
                                  math.sin(2 * math.pi * freq * i / rate)))
            for i in range(n))
        wf.writeframes(frames)
    return buf.getvalue()


def test_extract_features_schema_and_determinism(spark):
    media = synthetic_media(spark, n=30)
    out = extract_features(media)
    rows = {r.asset_id: r for r in out.collect()}
    assert len(rows) == 30
    assert all(len(r.feature) == 8 for r in rows.values())
    assert all(r.n_bytes == 64 for r in rows.values())  # sha512 hex -> 64 bytes
    # deterministic across runs
    again = {r.asset_id: r for r in extract_features(media).collect()}
    assert all(rows[i].sha256 == again[i].sha256 for i in rows)


def test_decode_stub_unknown_kind_raises():
    with pytest.raises(NotImplementedError):
        _decode_stub(b"x", "hologram")


def test_image_kernel_bmp_known_pixels():
    # solid orange 6x4 -> channel means are the exact pixel values
    f = _decode_image(_bmp(6, 4, (255, 128, 0)))
    assert f is not None
    assert f[2] == pytest.approx(1.0)           # mean R
    assert f[3] == pytest.approx(128 / 255)     # mean G
    assert f[4] == pytest.approx(0.0)           # mean B
    assert f[5] == pytest.approx(0.0)           # solid color: zero contrast
    assert f[6] == pytest.approx(6 / 10)        # aspect w/(w+h)


def test_image_kernel_ppm_and_comment_header():
    f = _decode_image(_ppm(3, 5, (0, 0, 255)))
    assert f is not None
    assert f[2:5] == pytest.approx([0.0, 0.0, 1.0])


def test_audio_kernel_wav_sine_rms():
    # 0.5-amplitude sine: RMS = amp/sqrt(2), peak ~= amp, ZCR = 2f/rate
    f = _decode_audio(_wav(freq=1000, rate=8000, sec=0.5, amp=0.5))
    assert f is not None
    assert f[0] == pytest.approx(0.5 / 60, rel=1e-3)       # duration
    assert f[1] == pytest.approx(8000 / 48000)             # rate
    assert f[3] == pytest.approx(0.5 / math.sqrt(2), rel=1e-2)  # RMS
    assert f[4] == pytest.approx(2 * 1000 / 8000, rel=5e-2)     # ZCR
    assert f[5] == pytest.approx(0.5, rel=1e-2)            # peak


def test_pillow_branch_decodes_png_when_installed():
    # exercises the soft-import Pillow path (multimodal._image_pixels) the
    # day the dependency exists in the environment; skipped, not silently
    # green, while it doesn't
    PIL_Image = pytest.importorskip("PIL.Image")
    import numpy as np

    from etl_api_bigquery_spark.functions.multimodal import _image_pixels
    px = np.zeros((4, 6, 3), dtype=np.uint8)
    px[:, :] = (255, 128, 0)
    buf = io.BytesIO()
    PIL_Image.fromarray(px).save(buf, format="PNG")
    decoded = _image_pixels(buf.getvalue())
    assert decoded is not None
    w, h, out = decoded
    assert (w, h) == (6, 4)
    assert (out == px).all()
    f = _decode_image(buf.getvalue())
    assert f[2] == pytest.approx(1.0) and f[4] == pytest.approx(0.0)


def test_corrupt_assets_fall_back_to_hash_fingerprint():
    junk = b"\x00\x01definitely-not-an-image"
    assert decode_feature(junk, "image") == _decode_stub(junk, "image")
    assert decode_feature(junk, "audio") == _decode_stub(junk, "audio")
    assert decode_feature(junk, "video") == _decode_stub(junk, "video")
    # truncated BMP header must not crash the kernel
    assert _decode_image(b"BM" + b"\0" * 60) is None


def test_real_kernels_through_spark_pipeline(spark):
    """End-to-end: real assets flow through mapInPandas and land decoded
    features, mixed in the same batch with fallback-path assets."""
    rows = [(0, "image", _bmp(8, 8, (10, 20, 30))),
            (1, "audio", _wav()),
            (2, "video", b"fake-container-bytes"),
            (3, "image", b"corrupt")]
    import pyspark.sql.types as T
    df = spark.createDataFrame(rows, T.StructType([
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("media", T.BinaryType())]))
    got = {r.asset_id: r for r in extract_features(df).collect()}
    assert got[0].feature[2] == pytest.approx(10 / 255)    # decoded mean R
    assert got[1].feature[3] == pytest.approx(0.5 / math.sqrt(2), rel=1e-2)
    # float32 schema roundtrip -> approx against the float64 stub values
    assert got[2].feature == pytest.approx(
        _decode_stub(b"fake-container-bytes", "video"), rel=1e-6)
    assert got[3].feature == pytest.approx(
        _decode_stub(b"corrupt", "image"), rel=1e-6)
