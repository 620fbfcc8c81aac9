"""Watermarked streaming windowed aggregation == its batch twin."""

from __future__ import annotations

import glob
import os
import shutil

from w3_data_etl_pipeline_spark import datagen
from w3_data_etl_pipeline_spark.schemas import CHANGE_EVENTS
from w3_data_etl_pipeline_spark.streaming.aggs import windowed_event_counts


def test_streaming_windowed_counts_match_batch(spark, tmp_path):
    events = datagen.change_events(spark, 3000, 400)
    wal = tmp_path / "wal"
    os.makedirs(wal)
    staging = str(tmp_path / "stage")
    events.coalesce(2).write.parquet(staging)
    for i, p in enumerate(glob.glob(os.path.join(staging, "part-*.parquet"))):
        shutil.move(p, str(wal / f"seg{i}.parquet"))

    stream = spark.readStream.schema(CHANGE_EVENTS).parquet(str(wal))
    agg = windowed_event_counts(stream, window="10 minutes", watermark="20 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r["window_start"], r["op"]): (r["n_events"], r["min_lsn"], r["max_lsn"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    exp = {
        (r["window_start"], r["op"]): (r["n_events"], r["min_lsn"], r["max_lsn"])
        for r in windowed_event_counts(events, window="10 minutes").collect()
    }
    assert got == exp and len(got) > 0


def test_streaming_session_windows_match_batch(spark, tmp_path):
    from w3_data_etl_pipeline_spark.streaming.aggs import sessionized_event_counts

    events = datagen.change_events(spark, 3000, 60)
    wal = tmp_path / "swal"
    os.makedirs(wal)
    staging = str(tmp_path / "sstage")
    events.coalesce(2).write.parquet(staging)
    for i, p in enumerate(glob.glob(os.path.join(staging, "part-*.parquet"))):
        shutil.move(p, str(wal / f"seg{i}.parquet"))

    stream = spark.readStream.schema(CHANGE_EVENTS).parquet(str(wal))
    agg = sessionized_event_counts(stream, gap="5 minutes", watermark="20 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    def key(r):
        return (r["repo"], r["session_start"])

    got = {
        key(r): (r["session_end"], r["n_events"], r["min_lsn"], r["max_lsn"])
        for r in spark.sql("SELECT * FROM sess_counts").collect()
    }
    exp = {
        key(r): (r["session_end"], r["n_events"], r["min_lsn"], r["max_lsn"])
        for r in sessionized_event_counts(events, gap="5 minutes").collect()
    }
    assert got == exp and len(got) > 1
    # sessions are data-driven: at least one session spans > 1 event
    assert any(v[1] > 1 for v in exp.values())
