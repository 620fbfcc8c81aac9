"""Named writable refs (Iceberg `branch` + fastForwardBranch
analogue): create_branch forks main into an independently writable
snapshot line that never moves main, fast_forward publishes the
branch head onto main as one metadata-only commit with the branch's
per-batch lineage re-stamped, and expire_snapshots on main pins every
file a live branch references until drop_branch. SURVEY.md §10.14."""

from __future__ import annotations

import os

import pytest

from w3_data_etl_pipeline_spark import datagen, oracle
from w3_data_etl_pipeline_spark.plans.laketable import (
    CommitConflictError,
    LakeTable,
)
from w3_data_etl_pipeline_spark.schemas import SOURCE_FILES

N_KEYS = 120
N_EVENTS = 600
N_BATCHES = 4
PER = N_EVENTS // N_BATCHES


@pytest.fixture(scope="module")
def corpus(spark):
    snap = datagen.source_snapshot(spark, N_KEYS, content_max=128).cache()
    events = datagen.change_events(spark, N_EVENTS, N_KEYS, content_max=128).cache()
    snap_rows = [r.asDict() for r in snap.collect()]
    event_rows = [r.asDict() for r in events.collect()]
    return snap, events, snap_rows, event_rows


def _table(spark, tmp_path, snap, name, mode_events=None):
    t = LakeTable.create(
        spark, str(tmp_path / name), SOURCE_FILES, ["repo", "path"], n_buckets=8
    )
    t.overwrite(snap, lsn=datagen.GENESIS_LSN)
    return t


def _batch(events, i):
    lo = i * PER + 1
    hi = (i + 1) * PER if i < N_BATCHES - 1 else N_EVENTS
    return events.filter((events.lsn >= lo) & (events.lsn <= hi))


def _shas(df):
    return {
        (r["repo"], r["path"]): r["content"]
        for r in df.select("repo", "path", "content").collect()
    }


def _expected(snap_rows, event_rows, lsn_hi):
    return {
        k: v.get("content")
        for k, v in oracle.reduce_events(
            snap_rows, [e for e in event_rows if e["lsn"] <= lsn_hi]
        ).items()
    }


def test_branch_write_isolation_and_ff(spark, tmp_path, corpus):
    snap, events, snap_rows, event_rows = corpus
    t = _table(spark, tmp_path, snap, "t_br")
    t.merge(_batch(events, 0), 0, mode="cow")
    v_fork = t.create_branch("repair")
    assert t.branches() == {"repair": {"head": v_fork, "forked_from": v_fork}}

    b = t.branch("repair")
    for i in range(1, N_BATCHES):
        st = b.merge(_batch(events, i), i, mode="cow")
        assert st.applied
    # replaying a branch batch is a no-op (ledger lives per-line)
    assert not b.merge(_batch(events, 2), 2, mode="cow").applied

    # main never moved; branch carries the full state
    assert t.current_version() == v_fork
    assert _shas(t.read()) == _expected(snap_rows, event_rows, PER)
    assert _shas(b.read()) == _expected(snap_rows, event_rows, N_EVENTS)
    assert t.branches()["repair"]["head"] > v_fork

    ff = t.fast_forward("repair")
    assert ff.applied and ff.version == v_fork + 1
    assert _shas(t.read()) == _expected(snap_rows, event_rows, N_EVENTS)
    assert t.snapshot()["operation"] == "fast-forward"

    # the squash re-stamped the branch's per-batch audit rows onto main
    lin = t.lineage().filter(f"snapshot_version = {ff.version}")
    got_batches = {r["batch_id"] for r in lin.select("batch_id").distinct().collect()}
    assert got_batches == {1, 2, 3}

    # exactly-once survives the squash: a branch batch replayed on MAIN
    # after publish is a ledger no-op
    assert not t.merge(_batch(events, 3), 3, mode="cow").applied

    # fast-forward is one-shot per fork: main moved past the fork point
    b.merge(_batch(events, 3), 9, mode="cow")  # further branch work
    with pytest.raises(CommitConflictError):
        t.fast_forward("repair")
    assert t.drop_branch("repair") and t.branches() == {}


def test_ff_conflicts_when_main_advances(spark, tmp_path, corpus):
    snap, events, snap_rows, event_rows = corpus
    t = _table(spark, tmp_path, snap, "t_brconf")
    t.merge(_batch(events, 0), 0, mode="cow")
    t.create_branch("dev")
    b = t.branch("dev")
    b.merge(_batch(events, 1), 1, mode="cow")
    t.merge(_batch(events, 2), 2, mode="cow")  # main advances
    with pytest.raises(CommitConflictError):
        t.fast_forward("dev")
    # empty branch: no-op, not an error
    t.create_branch("idle")
    assert not t.fast_forward("idle").applied


def test_branch_mor_and_compact_publish(spark, tmp_path, corpus):
    snap, events, snap_rows, event_rows = corpus
    t = _table(spark, tmp_path, snap, "t_brmor")
    t.merge(_batch(events, 0), 0, mode="cow")
    v_fork = t.create_branch("mor-line")
    b = t.branch("mor-line")
    for i in range(1, N_BATCHES):
        b.merge(_batch(events, i), i, mode="mor")
    b.compact()  # branch-local maintenance folds the deltas
    assert t.current_version() == v_fork
    ff = t.fast_forward("mor-line")
    assert ff.applied
    assert _shas(t.read()) == _expected(snap_rows, event_rows, N_EVENTS)
    assert t.stats()["delta_files"] == 0  # published the compacted line


def test_expire_pins_live_branch_then_collects_dropped(spark, tmp_path, corpus):
    snap, events, snap_rows, event_rows = corpus
    t = _table(spark, tmp_path, snap, "t_brgc")
    t.merge(_batch(events, 0), 0, mode="cow")
    t.create_branch("pinned")
    b = t.branch("pinned")
    b.merge(_batch(events, 1), 1, mode="cow")
    b.merge(_batch(events, 2), 2, mode="cow")
    # churn main history and expire aggressively: branch files survive
    t.merge(_batch(events, 3), 30, mode="cow")
    t.expire_snapshots(keep_last=1, orphan_grace_sec=0)
    assert _shas(b.read()) == _expected(snap_rows, event_rows, 3 * PER)

    # after drop_branch the branch-only files become orphans
    branch_paths = {
        os.path.join(b.root, f["path"]) for f in b.snapshot()["files"]
    }
    t.drop_branch("pinned")
    res = t.expire_snapshots(keep_last=1, orphan_grace_sec=0)
    assert res["removed_files"] > 0
    assert any(not os.path.exists(p) for p in branch_paths)
    # main is untouched by the collection
    expected_main = _expected(
        snap_rows,
        [e for e in event_rows if e["lsn"] <= PER or e["lsn"] > 3 * PER],
        N_EVENTS,
    )
    assert _shas(t.read()) == expected_main


def test_branch_guards_and_validation(spark, tmp_path, corpus):
    snap, events, _snap_rows, _event_rows = corpus
    t = _table(spark, tmp_path, snap, "t_brguard")
    with pytest.raises(ValueError):
        t.branch("nope")
    with pytest.raises(ValueError):
        t.create_branch("../evil")
    t.create_branch("x")
    with pytest.raises(ValueError):
        t.create_branch("x")  # exclusive-create
    b = t.branch("x")
    with pytest.raises(ValueError):
        b.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError):
        b.create_branch("y")
    with pytest.raises(ValueError):
        b.fast_forward("y")
    with pytest.raises(ValueError):
        b.drop_branch("y")
    with pytest.raises(ValueError):
        b.branches()
    assert not t.drop_branch("never-existed")


def test_stream_into_branch_then_publish(spark, tmp_path, corpus):
    """A branch handle IS a LakeTable, so the checkpointed streaming
    loop ingests into it unchanged — the stream-to-audit-branch
    pattern: tail the WAL into `staging` (main frozen the whole
    drain), validate, then fast_forward main in one metadata commit."""
    import glob
    import shutil

    from w3_data_etl_pipeline_spark.schemas import CHANGE_EVENTS
    from w3_data_etl_pipeline_spark.streaming.cdc import run_stream

    snap, events, snap_rows, event_rows = corpus
    t = _table(spark, tmp_path, snap, "t_brstream")
    v_fork = t.create_branch("staging")
    b = t.branch("staging")

    wal = tmp_path / "wal_br"
    wal.mkdir()
    for i in range(3):
        lo = i * (N_EVENTS // 3) + 1
        hi = (i + 1) * (N_EVENTS // 3) if i < 2 else N_EVENTS
        seg = events.filter((events.lsn >= lo) & (events.lsn <= hi))
        tmp = str(wal / f"_seg{i}")
        seg.coalesce(1).write.parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        shutil.move(part, str(wal / f"seg{i}.parquet"))
        shutil.rmtree(tmp)

    run = run_stream(
        spark,
        b,
        str(wal),
        str(tmp_path / "ckpt_br"),
        CHANGE_EVENTS,
        enrich=False,
        mode="mor",
    )
    assert len([s for s in run.stats if s.applied]) >= 1
    assert t.current_version() == v_fork  # main frozen during the drain
    assert _shas(b.read()) == _expected(snap_rows, event_rows, N_EVENTS)

    ff = t.fast_forward("staging")
    assert ff.applied
    assert _shas(t.read()) == _expected(snap_rows, event_rows, N_EVENTS)
