"""Streaming windowed aggregations with watermarked late-data
handling — the monitoring layer over the change stream (events/sec
per op per time window, the streaming analogue of the reference's
hourly/weekday analysis queries, testing/test_queries.sql:15-27).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "event_ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    keys: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window counts + LSN ranges; the watermark bounds state
    so the operator runs forever at stream scale. Works on batch
    DataFrames too (same plan minus the state store)."""
    keys = keys if keys is not None else ["op"]
    src = stream.withWatermark(ts_col, watermark) if stream.isStreaming else stream
    return (
        src.groupBy(F.window(ts_col, window).alias("win"), *keys)
        .agg(
            F.count("*").alias("n_events"),
            F.min("lsn").alias("min_lsn"),
            F.max("lsn").alias("max_lsn"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            "n_events",
            "min_lsn",
            "max_lsn",
        )
    )
