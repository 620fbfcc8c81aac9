"""Steady-state soak: 30 MOR microbatches through the foreachBatch
body with the full maintenance policy stack (row-mass auto-compact +
snapshot expiry). Asserts the invariants a long-running deployment
depends on — bounded delta mass, bounded snapshot count, bounded
on-disk state, a correct exactly-once ledger high-watermark — and
byte-identical final state vs the single-threaded oracle."""

from __future__ import annotations

import os

from w3_data_etl_pipeline_spark import datagen, oracle
from w3_data_etl_pipeline_spark.plans.laketable import LakeTable
from w3_data_etl_pipeline_spark.schemas import SOURCE_FILES
from w3_data_etl_pipeline_spark.streaming.cdc import apply_batch

N_KEYS = 400
N_EVENTS = 3000
N_BATCHES = 30


def test_thirty_batch_mor_stream_steady_state(spark, tmp_path):
    snap = datagen.source_snapshot(spark, N_KEYS, content_max=256).cache()
    events = datagen.change_events(spark, N_EVENTS, N_KEYS, content_max=256).cache()
    snap_rows = [r.asDict() for r in snap.collect()]
    event_rows = [r.asDict() for r in events.collect()]

    t = LakeTable.create(
        spark, str(tmp_path / "t_soak"), SOURCE_FILES, ["repo", "path"], n_buckets=16
    )
    t.overwrite(snap, lsn=datagen.GENESIS_LSN)

    per = N_EVENTS // N_BATCHES
    for i in range(N_BATCHES):
        lo, hi = i * per + 1, (i + 1) * per if i < N_BATCHES - 1 else N_EVENTS
        st = apply_batch(
            t,
            events.filter((events.lsn >= lo) & (events.lsn <= hi)),
            i,
            enrich=False,
            mode="mor",
            auto_compact_delta_rows=120,
            expire_keep=3,
            lineage_compact_every=8,
        )
        assert st.applied
        s = t.stats()
        # the row-mass policy keeps pending delta mass bounded at all times
        assert s["delta_rows"] <= 120 * s["n_buckets"]

    # exactly-once ledger is a contiguous prefix: hwm == last batch id
    assert t.stats()["ledger_hwm"] == N_BATCHES - 1

    # lineage stayed consolidated (policy ran every 8 batches) but no
    # audit row was lost: one row per (applied batch, touched bucket)
    lin_files = [
        n for dp, _, ns in os.walk(t.lineage_dir) for n in ns if n.endswith(".parquet")
    ]
    assert len(lin_files) < N_BATCHES  # 30 batches would leave >= 30 files unbounded
    assert t.lineage().select("batch_id").distinct().count() == N_BATCHES


    # snapshot count bounded by the expiry window (merge + compact
    # commits between expiries add bounded slack)
    retained = [
        n for n in os.listdir(t._meta) if n.startswith("v") and n.endswith(".json")
    ]
    assert len(retained) <= 6

    # disk holds only files some retained snapshot references, plus
    # (possibly) grace-protected young orphans from folded deltas —
    # after an aged-out full scan, exactly the referenced set
    t.expire_snapshots(keep_last=3, orphan_grace_sec=0)
    on_disk = {
        os.path.relpath(os.path.join(dp, n), t.root)
        for dp, _, ns in os.walk(t._data)
        for n in ns
        if n.endswith(".parquet")
    }
    referenced = set()
    for n in os.listdir(t._meta):
        if n.startswith("v") and n.endswith(".json"):
            referenced.update(
                f["path"] for f in t.snapshot(int(n[1:-5]))["files"]
            )
    assert on_disk == referenced

    # replaying the last batch is a ledger no-op
    lo = (N_BATCHES - 1) * per + 1
    st = apply_batch(
        t,
        events.filter(events.lsn >= lo),
        N_BATCHES - 1,
        enrich=False,
        mode="mor",
    )
    assert not st.applied

    # final state == single-threaded oracle, byte for byte
    exp = oracle.expected_fingerprint(oracle.reduce_events(snap_rows, event_rows))
    got = {
        (r["repo"], r["path"]): r["content_sha"]
        for r in t.state_fingerprint().collect()
    }
    assert got == exp
