"""Source/sink connectors mirroring the reference's bronze I/O surface.

The reference lands raw batches as NDJSON(.gz) and parquet on GCS with
idempotent skip-if-exists and one-live-file-per-partition semantics
(src/shared/gcs/loader.py:96-171 json, :173-224 overwrite, :244-391 parquet).
Here those become thin, distributed wrappers over Spark writers — the
idempotence that matters (exactly-once apply) lives in the LakeTable fence,
not in blob-existence checks, but the archive-sink shapes are kept for
parity and for the bronze "raw event backup" role (P10).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def write_ndjson(df: DataFrame, path: str, compress: bool = True,
                 skip_if_exists: bool = True) -> bool:
    """NDJSON(+gzip) archive sink (reference S6: upload_json with
    skip-if-blob-exists idempotence, gcs/loader.py:131-138). Returns False if
    skipped. Rows are serialized with to_json(struct(*)) — columnar, no
    driver collect."""
    if skip_if_exists and os.path.exists(os.path.join(path, "_SUCCESS")):
        return False
    w = df.select(F.to_json(F.struct(*df.columns)).alias("value")).write
    if compress:
        w = w.option("compression", "gzip")
    w.mode("overwrite" if not skip_if_exists else "error").text(path)
    return True


def read_ndjson(spark: SparkSession, path: str,
                schema: T.StructType | None = None) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def write_partitioned_parquet(df: DataFrame, path: str,
                              partition_cols: list[str],
                              overwrite_partitions: bool = True) -> None:
    """Hive-style partitioned parquet sink with partition-overwrite semantics
    (reference S4+S5: delete partition files then upload exactly one —
    gcs/loader.py:173-224). Spark's dynamic partitionOverwriteMode replaces
    only the partitions present in df, atomically per partition."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (df.write.mode("overwrite" if overwrite_partitions else "append")
           .partitionBy(*partition_cols).parquet(path))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def discover_partitions(spark: SparkSession, path: str,
                        partition_col: str) -> DataFrame:
    """Partition-discovery scan (reference S9: list GCS files, parse partition
    date from path — sync_gcs_to_bigquery.py:20-74). Spark's partition
    discovery does the parse; we return the distinct partition values plus
    file provenance via input_file_name()."""
    df = spark.read.parquet(path)
    return (df.select(F.col(partition_col),
                      F.input_file_name().alias("file"))
            .groupBy(partition_col)
            .agg(F.count("*").alias("rows"),
                 F.max("file").alias("latest_file")))


def missing_partitions(source_parts: DataFrame, target_parts: DataFrame,
                       on: str) -> DataFrame:
    """Reconciliation set-difference (reference T6/J5:
    sync_gcs_to_bigquery.py:232 — partitions in bronze missing from silver)."""
    return source_parts.join(target_parts, on=on, how="left_anti")
