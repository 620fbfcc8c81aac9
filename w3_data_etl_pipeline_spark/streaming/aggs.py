"""Streaming windowed aggregations with watermarked late-data
handling — the monitoring layer over the change stream (events/sec
per op per time window, the streaming analogue of the reference's
hourly/weekday analysis queries, testing/test_queries.sql:15-27).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionized_event_counts(
    stream: DataFrame,
    ts_col: str = "event_ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    keys: list[str] | None = None,
) -> DataFrame:
    """SESSION windows (``F.session_window`` — gap-based, data-driven
    extents) beside the tumbling family: per key, consecutive events
    closer than ``gap`` merge into one session row with its true
    start/end, event count, and LSN range. On a stream the watermark
    both bounds the session state store AND finalizes a session once
    no in-gap event can still arrive — the standard sessionization
    shape (user activity, repo burst detection) that a fixed window
    cannot express. Works identically on batch DataFrames (same plan
    minus the state store), which is what the parity test and the
    DuckDB oracle twin (queries_scale.py session_windows_repo) pin."""
    keys = keys if keys is not None else ["repo"]
    src = stream.withWatermark(ts_col, watermark) if stream.isStreaming else stream
    return (
        src.groupBy(F.session_window(ts_col, gap).alias("win"), *keys)
        .agg(
            F.count("*").alias("n_events"),
            F.min("lsn").alias("min_lsn"),
            F.max("lsn").alias("max_lsn"),
        )
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            *keys,
            "n_events",
            "min_lsn",
            "max_lsn",
        )
    )


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
