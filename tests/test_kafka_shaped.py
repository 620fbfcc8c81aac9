"""Kafka-shaped broker double: the env-blocked Kafka integration as a
config swap. Verifies the source honours Kafka's contract — schema,
startingOffsets, maxOffsetsPerTrigger backpressure, checkpointed
resume — and that the engine converges to the oracle through it."""

from __future__ import annotations

import json
import time

import pytest
from pyspark.sql import functions as F

from w3_data_etl_pipeline_spark import datagen, oracle
from w3_data_etl_pipeline_spark.plans.laketable import LakeTable
from w3_data_etl_pipeline_spark.schemas import SOURCE_FILES
from w3_data_etl_pipeline_spark.streaming import broker as B
from w3_data_etl_pipeline_spark.streaming.cdc import run_stream_from

N_KEYS = 120
N_EVENTS = 400


def _event_rows(spark, n, first_lsn=1):
    return [
        r.asDict()
        for r in datagen.change_events(
            spark, n, N_KEYS, first_lsn=first_lsn, dup_every=0
        ).collect()
    ]


def _drain(run, want_rows, timeout=90):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if sum(s.deduped_rows for s in run.stats) >= want_rows:
            break
        time.sleep(0.4)
    run.query.stop()
    run.query.awaitTermination()


def _shas(table):
    return {
        (r["repo"], r["path"]): r["content_sha"]
        for r in table.state_fingerprint().collect()
    }


def test_schema_matches_kafka(spark, tmp_path):
    B.BrokerProducer(str(tmp_path / "b"), n_partitions=2)
    df = B.read_broker(spark, str(tmp_path / "b"))
    assert df.schema.simpleString() == (
        "struct<key:binary,value:binary,topic:string,partition:int,"
        "offset:bigint,timestamp:timestamp,timestampType:int>"
    )


def test_keyed_partitioning_preserves_per_key_order(spark, tmp_path):
    prod = B.BrokerProducer(str(tmp_path / "b"), n_partitions=4)
    rows = _event_rows(spark, N_EVENTS)
    prod.send_change_events(rows)
    # all events of one key in exactly one partition (Kafka keyed topic)
    run_dir = str(tmp_path / "probe")
    raw = B.read_broker(spark, str(tmp_path / "b"))
    got = []
    qq = (
        raw.writeStream.foreachBatch(lambda b, i: got.extend(b.collect()))
        .option("checkpointLocation", run_dir)
        .start()
    )
    deadline = time.time() + 60
    while time.time() < deadline and len(got) < N_EVENTS:
        time.sleep(0.4)
    qq.stop()
    qq.awaitTermination()
    by_key = {}
    for r in got:
        by_key.setdefault(bytes(r["key"]), set()).add(r["partition"])
    assert by_key and all(len(ps) == 1 for ps in by_key.values())
    # offsets are dense per partition
    by_part = {}
    for r in got:
        by_part.setdefault(r["partition"], []).append(r["offset"])
    for offs in by_part.values():
        assert sorted(offs) == list(range(len(offs)))


def test_backpressure_and_engine_convergence(spark, tmp_path):
    """maxOffsetsPerTrigger bounds every microbatch; the engine still
    converges to the single-threaded oracle through the capped feed."""
    prod = B.BrokerProducer(str(tmp_path / "b"), n_partitions=4)
    snap_rows = [r.asDict() for r in datagen.source_snapshot(spark, N_KEYS).collect()]
    rows = _event_rows(spark, N_EVENTS)
    prod.send_change_events(rows)

    table = LakeTable.create(
        spark, str(tmp_path / "t"), SOURCE_FILES, ["repo", "path"], n_buckets=8
    )
    table.overwrite(datagen.source_snapshot(spark, N_KEYS), lsn=datagen.GENESIS_LSN)

    cap = 90
    src = B.parse_change_events(
        B.read_broker(spark, str(tmp_path / "b"), max_offsets_per_trigger=cap)
    )
    run = run_stream_from(
        src, table, str(tmp_path / "ckpt"), enrich=False, available_now=False
    )
    _drain(run, N_EVENTS)
    batches = [s for s in run.stats if s.deduped_rows > 0]
    assert sum(s.deduped_rows for s in batches) == N_EVENTS
    assert max(s.deduped_rows for s in batches) <= cap  # backpressure held
    assert len(batches) >= N_EVENTS // cap  # actually split into batches
    assert _shas(table) == oracle.expected_fingerprint(
        oracle.reduce_events(snap_rows, rows)
    )


def test_resume_from_checkpoint(spark, tmp_path):
    """Kill/resume: a second query on the SAME checkpoint consumes only
    what the first never committed, and the final state matches the
    oracle over the full stream."""
    prod = B.BrokerProducer(str(tmp_path / "b"), n_partitions=4)
    snap_rows = [r.asDict() for r in datagen.source_snapshot(spark, N_KEYS).collect()]
    first = _event_rows(spark, 200)
    second = _event_rows(spark, 200, first_lsn=201)
    prod.send_change_events(first)

    table = LakeTable.create(
        spark, str(tmp_path / "t"), SOURCE_FILES, ["repo", "path"], n_buckets=8
    )
    table.overwrite(datagen.source_snapshot(spark, N_KEYS), lsn=datagen.GENESIS_LSN)
    ckpt = str(tmp_path / "ckpt")

    run1 = run_stream_from(
        B.parse_change_events(B.read_broker(spark, str(tmp_path / "b"))),
        table, ckpt, enrich=False, available_now=False,
    )
    _drain(run1, 200)
    assert sum(s.deduped_rows for s in run1.stats) == 200

    prod.send_change_events(second)  # lands while no query is running
    run2 = run_stream_from(
        B.parse_change_events(B.read_broker(spark, str(tmp_path / "b"))),
        table, ckpt, enrich=False, available_now=False,
    )
    _drain(run2, 200)
    # only the NEW offsets were consumed (plus at most one replayed
    # batch, which the ledger no-ops)
    applied2 = [s for s in run2.stats if s.applied]
    assert sum(s.deduped_rows for s in applied2) == 200
    assert _shas(table) == oracle.expected_fingerprint(
        oracle.reduce_events(snap_rows, first + second)
    )


def test_starting_offsets_latest_and_json(spark, tmp_path):
    prod = B.BrokerProducer(str(tmp_path / "b"), n_partitions=2)
    for i in range(50):
        prod.send(json.dumps({"i": i}).encode(), key=f"k{i}".encode())
    ends = prod.end_offsets()

    # latest: pre-existing records are invisible; new ones arrive
    got = []
    q = (
        B.read_broker(spark, str(tmp_path / "b"), starting_offsets="latest")
        .writeStream.foreachBatch(lambda b, i: got.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "ck_latest"))
        .start()
    )
    time.sleep(2)
    for i in range(50, 60):
        prod.send(json.dumps({"i": i}).encode(), key=f"k{i}".encode())
    deadline = time.time() + 60
    while time.time() < deadline and len(got) < 10:
        time.sleep(0.4)
    q.stop()
    q.awaitTermination()
    assert len(got) == 10

    # per-partition JSON: resume exactly from the recorded ends
    got2 = []
    q2 = (
        B.read_broker(
            spark, str(tmp_path / "b"), starting_offsets=json.dumps(ends)
        )
        .writeStream.foreachBatch(lambda b, i: got2.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "ck_json"))
        .start()
    )
    deadline = time.time() + 60
    while time.time() < deadline and len(got2) < 10:
        time.sleep(0.4)
    q2.stop()
    q2.awaitTermination()
    assert {json.loads(bytes(r["value"]))["i"] for r in got2} == set(range(50, 60))
