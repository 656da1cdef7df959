"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The container has no image/audio codecs, so the decode kernels are STUBBED
(deterministic fakes clearly marked below); everything Spark-side — schema,
Arrow batch shape, ``mapInPandas`` partition flow, metadata extraction — is
real and tested. Swapping the stub for Pillow/ffmpeg is a one-function change.

Design: media rows are ``(asset_id, kind, media binary, meta struct)``;
kernels run as ``mapInPandas`` (Arrow-batched, whole-partition iterator —
the right shape for expensive per-asset work because batch size amortizes
Python/JVM crossings and large binaries never become JVM row objects twice).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
    """STUB decode/feature-extract. A real deployment decodes the asset
    (Pillow / torchaudio / ffmpeg) and runs a feature net. Here: a
    deterministic 8-dim feature from the sha256 digest so tests are stable.
    Raises NotImplementedError for unknown kinds (the honest boundary)."""
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for kind={kind!r}")
    dig = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in dig[:8]]


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
                    _decode_stub(m, k) if m is not None else None
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
