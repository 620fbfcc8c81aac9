"""applyInPandasWithState running-key-state operator: multi-batch
streaming run vs the batch aggregation twin, plus replay detection."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from w3_data_etl_pipeline_spark import datagen
from w3_data_etl_pipeline_spark.schemas import CHANGE_EVENTS
from w3_data_etl_pipeline_spark.streaming.stateful import (
    running_key_state,
    running_key_state_batch,
)


def _write_segments(spark, tmp_path, n_events=3000, n_keys=400, n_segments=3):
    events = datagen.change_events(spark, n_events, n_keys, dup_every=0)
    seg_dir = os.path.join(str(tmp_path), "wal")
    per = n_events // n_segments
    for i in range(n_segments):
        lo, hi = i * per + 1, (i + 1) * per if i < n_segments - 1 else n_events
        (
            events.filter((F.col("lsn") >= lo) & (F.col("lsn") <= hi))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(seg_dir, f"seg={i}"))
        )
    return events, seg_dir


def test_stream_state_matches_batch_aggregation(spark, tmp_path):
    events, seg_dir = _write_segments(spark, tmp_path)

    src = (
        spark.readStream.schema(CHANGE_EVENTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(seg_dir + "/*")
    )
    q = (
        running_key_state(src)
        .writeStream.format("memory")
        .queryName("keystate")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # last emitted update per key == the final running state
    emitted = spark.sql(
        """
        SELECT repo, path, last_lsn, last_op, n_events FROM (
          SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY n_events DESC,
                                       last_lsn DESC) AS rn
          FROM keystate) WHERE rn = 1
        """
    )
    expected = running_key_state_batch(events).select(
        "repo", "path", "last_lsn", "last_op", "n_events"
    )
    diff = emitted.exceptAll(expected).count() + expected.exceptAll(emitted).count()
    assert diff == 0
    assert emitted.count() == expected.count()


def test_replay_flags_regression(spark, tmp_path):
    events, seg_dir = _write_segments(spark, tmp_path, n_events=600, n_keys=40, n_segments=2)

    src = (
        spark.readStream.schema(CHANGE_EVENTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(seg_dir + "/*")
    )

    batches = []

    def sink(df, bid):
        batches.append(df.collect())

    # feed segment 0 then (simulated replay) segment 0 again via a
    # second identical directory entry
    import shutil

    shutil.copytree(os.path.join(seg_dir, "seg=0"), os.path.join(seg_dir, "seg=9"))
    q = (
        running_key_state(src)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = [r for b in batches for r in b]
    assert any(r["regressed"] for r in rows), "replayed segment must trip the monitor"
