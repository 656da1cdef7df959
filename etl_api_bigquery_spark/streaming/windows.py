"""Event-time windowed aggregation with watermark-based late-data handling.

The reference handles late/out-of-order data by re-extracting and
overwrite-replacing whole day partitions (T4: pipeline.py:57-100,
loader.py:941-982). The streaming-native form: ``withWatermark`` bounds state,
tumbling ``window()`` buckets event time, and events later than the watermark
are dropped deterministically. Used for per-window ingest metrics alongside
the MERGE sink (the MERGE itself is order-free by LWW, so late events need no
special path there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "event_ts",
    window_duration: str = "1 hour",
    watermark_delay: str = "10 minutes",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window counts over event time with late-data eviction."""
    g = [F.window(F.col(ts_col), window_duration).alias("win")]
    g += [F.col(c) for c in (group_cols or [])]
    return (stream.withWatermark(ts_col, watermark_delay)
            .groupBy(*g)
            .agg(F.count("*").alias("n_events"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"),
                    *(group_cols or []), "n_events"))
