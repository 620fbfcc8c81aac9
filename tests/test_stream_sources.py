"""Source-agnostic streaming: the SAME foreachBatch body that tails
the file WAL also drains Spark's built-in `rate` source — proving the
engine's apply path has no file-source dependency (the Kafka shape on
a real cluster is just another `source` DataFrame)."""

from __future__ import annotations

import time

from w3_data_etl_pipeline_spark import datagen, oracle
from w3_data_etl_pipeline_spark.plans.laketable import LakeTable
from w3_data_etl_pipeline_spark.schemas import SOURCE_FILES
from w3_data_etl_pipeline_spark.streaming.cdc import rate_source_events, run_stream_from

N_KEYS = 200


def test_rate_source_drives_engine(spark, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "t"), SOURCE_FILES, ["repo", "path"], n_buckets=8
    )
    table.overwrite(datagen.source_snapshot(spark, N_KEYS), lsn=datagen.GENESIS_LSN)

    src = rate_source_events(spark, rows_per_second=2000, n_keys=N_KEYS)
    run = run_stream_from(
        src,
        table,
        str(tmp_path / "ckpt"),
        enrich=True,
        mode="cow",
        available_now=False,
    )
    deadline = time.time() + 60
    while time.time() < deadline and sum(1 for s in run.stats if s.applied) < 2:
        time.sleep(0.5)
    run.query.stop()
    run.query.awaitTermination()
    applied = [s for s in run.stats if s.applied]
    assert len(applied) >= 2, "rate source never delivered two microbatches"

    # the applied lsn range is known exactly from the table's own
    # lineage metrics (filtered to COMMITTED snapshot versions — a
    # stop() can interrupt between lineage write and snapshot commit);
    # regenerate the identical events in batch and compare final state
    # to the single-threaded oracle
    from pyspark.sql import functions as F

    max_lsn = (
        table.lineage()
        .filter(F.col("snapshot_version") <= table.current_version())
        .agg(F.max("max_lsn"))
        .first()[0]
    )
    events = datagen.change_events(spark, int(max_lsn), N_KEYS, dup_every=0)
    snap_rows = [r.asDict() for r in datagen.source_snapshot(spark, N_KEYS).collect()]
    event_rows = [r.asDict() for r in events.collect()]
    expected = oracle.expected_fingerprint(oracle.reduce_events(snap_rows, event_rows))
    got = {
        (r["repo"], r["path"]): r["content_sha"]
        for r in table.state_fingerprint().collect()
    }
    assert got == expected
