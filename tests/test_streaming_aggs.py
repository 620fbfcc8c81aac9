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
