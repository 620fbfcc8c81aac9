"""Audit-gated streaming ingest (write-audit-publish in the
foreachBatch body): with ``audit=...`` every microbatch is staged,
validated against the batch-scope audit view, and only then published
— a suspect batch never becomes readable, its raw events are
dead-lettered, the exactly-once ledger stays unburned so a corrected
replay under the same batch_id applies, and a crash between stage and
publish restages cleanly. SURVEY.md §10.9."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from w3_data_etl_pipeline_spark import datagen, oracle
from w3_data_etl_pipeline_spark.plans.laketable import LakeTable
from w3_data_etl_pipeline_spark.schemas import CHANGE_EVENTS, SOURCE_FILES
from w3_data_etl_pipeline_spark.streaming.cdc import apply_batch, run_stream

N_KEYS = 150
N_EVENTS = 900
MARK = "CORRUPTED::"


def _clean_audit(df):
    return df.filter(F.col("content").startswith(MARK)).isEmpty()


def _corrupt(events):
    return events.withColumn("content", F.concat(F.lit(MARK), F.col("content")))


def _fingerprint(table):
    return {
        (r["repo"], r["path"]): r["content_sha"]
        for r in table.state_fingerprint().collect()
    }


def _setup(spark, tmp_path, name):
    snap = datagen.source_snapshot(spark, N_KEYS, content_max=128)
    events = datagen.change_events(spark, N_EVENTS, N_KEYS, content_max=128)
    t = LakeTable.create(
        spark, str(tmp_path / name), SOURCE_FILES, ["repo", "path"], n_buckets=8
    )
    t.overwrite(snap, lsn=datagen.GENESIS_LSN)
    snap_rows = [r.asDict() for r in snap.collect()]
    return t, snap_rows, events


def test_reject_keeps_suspect_invisible_and_ledger_unburned(spark, tmp_path):
    t, snap_rows, events = _setup(spark, tmp_path, "t_rej")
    half1 = events.filter(events.lsn <= N_EVENTS // 2)
    half2 = events.filter(events.lsn > N_EVENTS // 2)
    qdir = str(tmp_path / "q")

    st0 = apply_batch(t, half1, 0, enrich=False, mode="mor", audit=_clean_audit)
    assert st0.applied and not st0.rejected
    v_after_0 = t.current_version()

    # batch 1 arrives corrupted: audit must reject, main must not move
    st1 = apply_batch(
        t,
        _corrupt(half2),
        1,
        enrich=False,
        mode="mor",
        audit=_clean_audit,
        quarantine_dir=qdir,
    )
    assert st1.rejected and not st1.applied
    assert t.current_version() == v_after_0
    assert t.staged_ids() == []
    assert t.read().filter(F.col("content").startswith(MARK)).isEmpty()
    # the rejected batch is dead-lettered for offline inspection
    rej = spark.read.parquet(os.path.join(qdir, "rejected", "batch_id=1"))
    assert rej.count() == half2.count()

    # corrected replay under the SAME batch_id applies — rejection
    # did not burn the ledger
    st1b = apply_batch(t, half2, 1, enrich=False, mode="mor", audit=_clean_audit)
    assert st1b.applied and not st1b.rejected

    event_rows = [r.asDict() for r in events.collect()]
    assert _fingerprint(t) == oracle.expected_fingerprint(
        oracle.reduce_events(snap_rows, event_rows)
    )


def test_crash_leftover_stage_is_restaged(spark, tmp_path):
    t, snap_rows, events = _setup(spark, tmp_path, "t_crash")
    # simulate a kill between stage and audit: the stage ref exists,
    # nothing published
    t.merge(_corrupt(events), 0, mode="mor", stage_id="batch-0")
    assert t.staged_ids() == ["batch-0"]
    # the retried attempt arrives with the CORRECT batch — the
    # leftover must be dropped and the good rows staged+published
    st = apply_batch(t, events, 0, enrich=False, mode="mor", audit=_clean_audit)
    assert st.applied and not st.rejected
    assert t.staged_ids() == []
    assert t.read().filter(F.col("content").startswith(MARK)).isEmpty()
    event_rows = [r.asDict() for r in events.collect()]
    assert _fingerprint(t) == oracle.expected_fingerprint(
        oracle.reduce_events(snap_rows, event_rows)
    )


def test_replay_after_publish_is_ledger_noop(spark, tmp_path):
    t, _, events = _setup(spark, tmp_path, "t_replay")
    st = apply_batch(t, events, 0, enrich=False, mode="cow", audit=_clean_audit)
    assert st.applied
    v = t.current_version()
    st2 = apply_batch(t, events, 0, enrich=False, mode="cow", audit=_clean_audit)
    assert not st2.applied and not st2.rejected
    assert t.current_version() == v and t.staged_ids() == []


def test_stream_with_poisoned_segment(spark, tmp_path):
    """Full checkpointed stream over WAL segments where one segment is
    poisoned: the audit drops exactly that segment and the final state
    equals the oracle over the clean events only."""
    import glob
    import shutil

    t, snap_rows, events = _setup(spark, tmp_path, "t_stream")
    events = events.cache()
    wal = tmp_path / "wal"
    wal.mkdir()
    per = N_EVENTS // 3
    for i in range(3):
        lo, hi = i * per + 1, (i + 1) * per if i < 2 else N_EVENTS
        seg = events.filter((events.lsn >= lo) & (events.lsn <= hi))
        if i == 1:
            seg = _corrupt(seg)
        staging = str(tmp_path / f"stage{i}")
        seg.coalesce(1).write.parquet(staging)
        part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        shutil.move(part, str(wal / f"seg{i}.parquet"))

    run = run_stream(
        spark,
        t,
        str(wal),
        str(tmp_path / "ckpt"),
        CHANGE_EVENTS,
        max_files_per_trigger=1,
        enrich=False,
        mode="mor",
        audit=_clean_audit,
        quarantine_dir=str(tmp_path / "q"),
    )
    assert sum(1 for s in run.stats if s.applied) == 2
    assert sum(1 for s in run.stats if s.rejected) == 1
    assert t.read().filter(F.col("content").startswith(MARK)).isEmpty()

    clean = events.filter((events.lsn <= per) | (events.lsn > 2 * per))
    event_rows = [r.asDict() for r in clean.collect()]
    assert _fingerprint(t) == oracle.expected_fingerprint(
        oracle.reduce_events(snap_rows, event_rows)
    )


def test_broker_audit_gated_ingest(spark, tmp_path):
    """The Kafka-shaped broker feeding audit-gated ingest: poisoned
    records scattered through the offset stream cause exactly their
    microbatches to be rejected (batch granularity, dead-lettered
    with the raw events), clean batches publish, and the final state
    equals last-writer-wins over precisely the events NOT in the
    dead-letter store — the rejection bookkeeping is the oracle's
    input, so a leak on either side flips the fingerprint."""
    import glob
    import time

    from w3_data_etl_pipeline_spark.streaming import broker as B
    from w3_data_etl_pipeline_spark.streaming.cdc import run_stream_from

    rows = [
        r.asDict()
        for r in datagen.change_events(spark, 600, N_KEYS, dup_every=0).collect()
    ]
    poison_lsns = {97, 211, 384, 548}
    sent = [
        dict(r, content=MARK + (r["content"] or ""))
        if r["lsn"] in poison_lsns and r["op"] != "D"
        else r
        for r in rows
    ]
    prod = B.BrokerProducer(str(tmp_path / "b"), n_partitions=4)
    prod.send_change_events(sent)

    t = LakeTable.create(
        spark, str(tmp_path / "t_bk"), SOURCE_FILES, ["repo", "path"], n_buckets=8
    )
    snap = datagen.source_snapshot(spark, N_KEYS)
    t.overwrite(snap, lsn=datagen.GENESIS_LSN)
    snap_rows = [r.asDict() for r in snap.collect()]
    qdir = str(tmp_path / "q")

    src = B.parse_change_events(
        B.read_broker(spark, str(tmp_path / "b"), max_offsets_per_trigger=40)
    )
    run = run_stream_from(
        src,
        t,
        str(tmp_path / "ckpt"),
        enrich=False,
        mode="mor",
        audit=_clean_audit,
        quarantine_dir=qdir,
        available_now=False,
    )
    deadline = time.time() + 120
    while time.time() < deadline and sum(s.deduped_rows for s in run.stats) < 600:
        time.sleep(0.4)
    run.query.stop()
    run.query.awaitTermination()

    rejected = [s for s in run.stats if s.rejected]
    applied = [s for s in run.stats if s.applied]
    assert rejected and applied, (len(rejected), len(applied))
    assert t.read().filter(F.col("content").startswith(MARK)).isEmpty()

    # the dead-letter store defines exactly what was dropped
    rej_files = glob.glob(os.path.join(qdir, "rejected", "batch_id=*"))
    assert len(rej_files) == len(rejected)
    rej_lsns = {
        r["lsn"] for r in spark.read.parquet(os.path.join(qdir, "rejected")).collect()
    }
    # a marked event is either dead-lettered with its batch, or was
    # shadowed by a newer same-key event inside its own microbatch —
    # the audit sees the post-dedup batch view (the rows about to
    # become visible), so a shadowed poisoned row never surfaces
    # anywhere and needs no rejection. The visibility invariant is the
    # isEmpty() check above; here we pin that each marked event has
    # one of the two fates.
    marked = {r["lsn"] for r in sent if (r["content"] or "").startswith(MARK)}
    assert marked & rej_lsns, "no poisoned batch was rejected"
    for lsn in marked - rej_lsns:
        ev = next(r for r in sent if r["lsn"] == lsn)
        shadowers = [
            r
            for r in sent
            if (r["repo"], r["path"]) == (ev["repo"], ev["path"]) and r["lsn"] > lsn
        ]
        assert shadowers, f"marked lsn {lsn} neither rejected nor shadowed"
    clean = [r for r in sent if r["lsn"] not in rej_lsns]
    assert _fingerprint(t) == oracle.expected_fingerprint(
        oracle.reduce_events(snap_rows, clean)
    )
