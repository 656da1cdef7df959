"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

Decode kernels, in order of preference per asset:

* **image** — REAL decoders for the formats parseable without native codec
  libraries: uncompressed BMP (24/32-bit) and binary PPM (P6), read straight
  off the byte buffer with numpy; any other format goes through Pillow when
  it is installed (soft import — absent in this container).
* **audio** — REAL decoder for PCM WAV via the stdlib ``wave`` module
  (present everywhere); features are duration/rate/channels/RMS/ZCR/peak.
* **video** — no pure-python container parser exists; stays a deterministic
  content-hash feature (honest stub, clearly marked below).

An asset its kind's decoders cannot parse (corrupt or unsupported bytes)
falls back to the deterministic content-hash feature rather than failing the
batch — at 100 TB a corrupt asset must yield a fingerprintable row, not a
dead task. All feature vectors are 8-dim so the output schema is identical
across kinds and fallback paths.

Design: media rows are ``(asset_id, kind, media binary, meta struct)``;
kernels run as ``mapInPandas`` (Arrow-batched, whole-partition iterator —
the right shape for expensive per-asset work because batch size amortizes
Python/JVM crossings and large binaries never become JVM row objects twice).
"""

from __future__ import annotations

import hashlib
import io
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:                                     # soft optional dependency
    from PIL import Image as _PILImage  # pragma: no cover
except ImportError:
    _PILImage = None

MEDIA_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType()),
    T.StructField("kind", T.StringType()),          # image | audio | video
    T.StructField("media", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("codec", T.StringType()),
    ])),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("sha256", T.StringType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def _decode_stub(payload: bytes, kind: str) -> list[float]:
    """Fallback feature for assets no available decoder can parse (and the
    only path for video — no pure-python container parser exists; a real
    deployment plugs ffmpeg in here). Deterministic 8-dim feature from the
    sha256 digest so corrupt assets still fingerprint stably. Raises
    NotImplementedError for unknown kinds (the honest boundary)."""
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for kind={kind!r}")
    dig = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in dig[:8]]


def _image_pixels(payload: bytes) -> tuple[int, int, "np.ndarray"] | None:
    """Parse (width, height, HxWx3 uint8 RGB) from uncompressed BMP or
    binary PPM (P6) straight off the buffer; Pillow for other formats when
    installed. None if nothing can decode the bytes."""
    if payload[:2] == b"BM" and len(payload) > 54:
        off, = struct.unpack_from("<I", payload, 10)
        w, h = struct.unpack_from("<ii", payload, 18)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        comp, = struct.unpack_from("<I", payload, 30)
        if comp != 0 or bpp not in (24, 32) or w <= 0 or h == 0:
            return None
        top_down, h = h < 0, abs(h)
        nb = bpp // 8
        stride = (w * nb + 3) & ~3              # rows pad to 4 bytes
        if off + stride * h > len(payload):
            return None
        rows = np.frombuffer(payload, np.uint8, stride * h, off)
        px = rows.reshape(h, stride)[:, : w * nb].reshape(h, w, nb)
        if not top_down:
            px = px[::-1]                        # BMP stores bottom-up
        return w, h, px[:, :, 2::-1]             # BGR(A) -> RGB
    if payload[:2] == b"P6":
        # header: "P6" <ws> width <ws> height <ws> maxval <single ws> raw
        parts, i, tok = [], 2, b""
        while len(parts) < 3 and i < len(payload):
            c = payload[i:i + 1]
            if c == b"#":                        # comment to end of line
                i = payload.find(b"\n", i)
                i = len(payload) if i < 0 else i
            elif c.isspace():
                if tok:
                    parts.append(tok)
                    tok = b""
            else:
                tok += c
            i += 1
        try:
            w, h, maxval = (int(p) for p in parts)
        except ValueError:
            return None
        if w <= 0 or h <= 0 or maxval != 255 or i + w * h * 3 > len(payload):
            return None
        px = np.frombuffer(payload, np.uint8, w * h * 3, i).reshape(h, w, 3)
        return w, h, px
    if _PILImage is not None:
        try:  # pragma: no cover - Pillow absent in this container
            img = _PILImage.open(io.BytesIO(payload)).convert("RGB")
            return img.width, img.height, np.asarray(img)
        except Exception:
            return None
    return None


def _decode_image(payload: bytes) -> list[float] | None:
    """REAL image feature: dimensions + channel means + luma contrast from
    the decoded pixel grid. 8-dim to match the fallback's shape."""
    dec = _image_pixels(payload)
    if dec is None:
        return None
    w, h, px = dec
    rgb = px.astype(np.float64) / 255.0
    mr, mg, mb = (float(rgb[:, :, c].mean()) for c in range(3))
    luma = 0.2126 * rgb[:, :, 0] + 0.7152 * rgb[:, :, 1] + 0.0722 * rgb[:, :, 2]
    return [np.log1p(w) / 10.0, np.log1p(h) / 10.0, mr, mg, mb,
            float(luma.std()), w / (w + h), 1.0]


def _decode_audio(payload: bytes) -> list[float] | None:
    """REAL audio feature via the stdlib ``wave`` decoder (PCM WAV):
    duration / rate / channels plus RMS energy, zero-crossing rate and
    peak amplitude of the normalized signal. None if not parseable WAV."""
    try:
        with wave_module().open(io.BytesIO(payload)) as wf:
            rate, nch = wf.getframerate(), wf.getnchannels()
            width, nframes = wf.getsampwidth(), wf.getnframes()
            raw = wf.readframes(nframes)
    except Exception:
        return None
    if rate <= 0 or nch <= 0 or not raw:
        return None
    if width == 2:
        sig = np.frombuffer(raw, np.int16).astype(np.float64) / 32768.0
    elif width == 1:                             # 8-bit WAV is unsigned
        sig = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        return None
    if nch > 1:                                  # downmix to mono
        sig = sig[: len(sig) - len(sig) % nch].reshape(-1, nch).mean(axis=1)
    if sig.size == 0:
        return None
    dur = sig.size / rate
    rms = float(np.sqrt(np.mean(sig * sig)))
    zcr = float(np.mean(np.signbit(sig[1:]) != np.signbit(sig[:-1])))
    return [min(dur / 60.0, 1.0), min(rate / 48000.0, 1.0),
            min(nch / 2.0, 1.0), rms, zcr, float(np.abs(sig).max()),
            float(np.abs(sig).mean()), 1.0]


def wave_module():
    """Indirection for the stdlib wave import (kept lazy so executors only
    pay it on audio batches)."""
    import wave
    return wave


def decode_feature(payload: bytes, kind: str) -> list[float]:
    """Kind-dispatched decode: real kernel first, content-hash fallback for
    bytes the decoders cannot parse (and for video)."""
    if kind == "image":
        feat = _decode_image(payload)
        if feat is not None:
            return feat
    elif kind == "audio":
        feat = _decode_audio(payload)
        if feat is not None:
            return feat
    return _decode_stub(payload, kind)


def extract_features(df: DataFrame, batch_hint: int = 64) -> DataFrame:
    """mapInPandas feature extraction over media binaries. The Arrow batch
    iterator keeps memory bounded even with multi-MB assets per row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["media"].map(lambda b: len(b) if b is not None else 0),
                "sha256": pdf["media"].map(
                    lambda b: hashlib.sha256(b).hexdigest() if b is not None else None),
                "feature": [
                    decode_feature(m, k) if m is not None else None
                    for m, k in zip(pdf["media"], pdf["kind"])
                ],
            })
            yield out

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def stage_media_fixture(path: str = "/tmp/spark_graft_media_v1.parquet",
                        n: int = 60, seed: int = 42) -> str:
    """Write the deterministic synthetic-media table to a parquet FILE (via
    pyarrow, no Spark needed) so an external oracle engine can read the same
    bytes. Columns: asset_id, kind, media (binary) plus stager-computed
    ``expected_n_bytes`` / ``expected_sha256`` — DuckDB has no sha256(BLOB),
    so the oracle checks the engine's mapInPandas-recomputed hash against the
    stager's independent computation. Write-once, atomic rename (safe under
    concurrent runs); bytes depend only on (n, seed)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(path):
        return path
    kinds = ["image", "audio", "video"]
    media = [hashlib.sha512(f"{i}{seed}".encode()).digest() for i in range(n)]
    tbl = pa.table({
        "asset_id": pa.array(range(n), pa.int64()),
        "kind": pa.array([kinds[i % 3] for i in range(n)]),
        "media": pa.array(media, pa.binary()),
        "expected_n_bytes": pa.array([len(m) for m in media], pa.int64()),
        "expected_sha256": pa.array(
            [hashlib.sha256(m).hexdigest() for m in media]),
    })
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)
    return path


def synthetic_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payloads derived from sha2)."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    return spark.range(n).select(
        F.col("id").alias("asset_id"),
        F.element_at(kinds, (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int")).alias("kind"),
        F.to_binary(F.sha2(F.concat(F.col("id").cast("string"),
                                    F.lit(str(seed))), 512), F.lit("hex")).alias("media"),
        F.struct(
            (F.pmod(F.xxhash64("id"), F.lit(1920)) + 1).cast("int").alias("width"),
            (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1080)) + 1).cast("int").alias("height"),
            (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(60000))).cast("int").alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )
