"""Write-audit-publish (staged commits): merge(stage_id=...) must
leave main untouched until publish(), read_staged() must show exactly
the post-publish table, publish must be exactly-once and
conflict-safe (COW bucket overlap, rename/drop epoch change, ledger
race), abandon must leave no trace, and the orphan walk must never
collect an audit-pending batch. Mirrors Iceberg's wap.id +
fast_forward semantics (SURVEY.md §10)."""

from __future__ import annotations

import os

import pytest

from w3_data_etl_pipeline_spark import datagen, oracle
from w3_data_etl_pipeline_spark.plans.laketable import CommitConflictError, LakeTable
from w3_data_etl_pipeline_spark.schemas import SOURCE_FILES


@pytest.fixture(scope="module")
def fixtures(spark):
    snap = datagen.source_snapshot(spark, 150).cache()
    events = datagen.change_events(spark, 800, 200).cache()
    snap_rows = [r.asDict() for r in snap.collect()]
    event_rows = [r.asDict() for r in events.collect()]
    return snap, events, snap_rows, event_rows


def _table(spark, tmp_path, snap, name, n_buckets=8):
    t = LakeTable.create(
        spark, str(tmp_path / name), SOURCE_FILES, ["repo", "path"], n_buckets=n_buckets
    )
    t.overwrite(snap, lsn=datagen.GENESIS_LSN)
    return t


def _shas(df):
    return {
        (r["repo"], r["path"]): r["content"]
        for r in df.select("repo", "path", "content").collect()
    }


def _expected(snap_rows, event_rows):
    return {
        k: v.get("content")
        for k, v in oracle.reduce_events(snap_rows, event_rows).items()
    }


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_stage_audit_publish(spark, tmp_path, fixtures, mode):
    snap, events, snap_rows, event_rows = fixtures
    t = _table(spark, tmp_path, snap, f"wap_{mode}")
    v0 = t.current_version()
    st = t.merge(events, 0, mode=mode, stage_id="audit1")
    assert st.applied is False and st.stage_id == "audit1"
    # main untouched: version pinned, content is still genesis-only
    assert t.current_version() == v0
    assert _shas(t.read()) == _expected(snap_rows, [])
    assert t.staged_ids() == ["audit1"]
    # the audit view IS the post-publish table
    staged = _shas(t.read_staged("audit1"))
    assert staged == _expected(snap_rows, event_rows)
    pub = t.publish("audit1")
    assert pub.applied is True and pub.version == v0 + 1
    assert _shas(t.read()) == staged
    assert t.staged_ids() == []
    # publish wrote the lineage rows with the FINAL version
    lin = {r["snapshot_version"] for r in t.lineage().collect() if r["batch_id"] == 0}
    assert lin == {v0 + 1}
    # exactly-once: replaying the published batch is a ledger no-op
    assert t.merge(events, 0, mode=mode).applied is False


def test_abandon_leaves_no_trace_and_batch_reapplies(spark, tmp_path, fixtures):
    snap, events, snap_rows, event_rows = fixtures
    t = _table(spark, tmp_path, snap, "wap_abandon")
    t.merge(events, 0, stage_id="bad")
    assert t.abandon("bad") is True
    assert t.abandon("bad") is False
    assert t.staged_ids() == []
    with pytest.raises(ValueError):
        t.read_staged("bad")
    # the batch never reached the ledger: a normal merge applies it
    assert t.merge(events, 0).applied is True
    assert _shas(t.read()) == _expected(snap_rows, event_rows)


def test_duplicate_stage_id_is_an_error(spark, tmp_path, fixtures):
    snap, events, *_ = fixtures
    t = _table(spark, tmp_path, snap, "wap_dup")
    t.merge(events.filter(events.lsn <= 400), 0, stage_id="s1")
    with pytest.raises(FileExistsError):
        t.merge(events.filter(events.lsn > 400), 1, stage_id="s1")


def test_cow_publish_conflicts_on_touched_bucket(spark, tmp_path, fixtures):
    snap, events, *_ = fixtures
    t = _table(spark, tmp_path, snap, "wap_conflict", n_buckets=1)
    t.merge(events.filter(events.lsn <= 400), 0, stage_id="s1")  # cow stage
    # a main commit rewrites the same (only) bucket before publish
    assert t.merge(events.filter(events.lsn > 400), 1).applied is True
    with pytest.raises(CommitConflictError):
        t.publish("s1")
    # the contract: re-run the merge against current — now it lands
    assert t.abandon("s1") is True
    assert t.merge(events.filter(events.lsn <= 400), 0).applied is True


def test_delta_publish_commutes_with_main_advance(spark, tmp_path, fixtures):
    snap, events, snap_rows, event_rows = fixtures
    t = _table(spark, tmp_path, snap, "wap_delta", n_buckets=1)
    t.merge(events.filter(events.lsn <= 400), 0, mode="mor", stage_id="s1")
    assert t.merge(events.filter(events.lsn > 400), 1, mode="mor").applied is True
    pub = t.publish("s1")  # delta appends commute: no conflict
    assert pub.applied is True
    assert _shas(t.read()) == _expected(snap_rows, event_rows)


def test_publish_conflicts_after_rename(spark, tmp_path, fixtures):
    snap, events, *_ = fixtures
    t = _table(spark, tmp_path, snap, "wap_rename")
    t.merge(events, 0, mode="mor", stage_id="s1")
    t.rename_column("lang", "language")
    with pytest.raises(CommitConflictError):
        t.publish("s1")


def test_publish_noop_when_main_already_applied(spark, tmp_path, fixtures):
    snap, events, *_ = fixtures
    t = _table(spark, tmp_path, snap, "wap_ledger")
    t.merge(events, 0, mode="mor", stage_id="s1")
    # a replay races the audit and applies the batch directly to main
    assert t.merge(events, 0, mode="mor").applied is True
    v = t.current_version()
    pub = t.publish("s1")
    assert pub.applied is False and t.current_version() == v
    assert t.staged_ids() == []  # the stale stage was dropped


def test_orphan_walk_spares_staged_files(spark, tmp_path, fixtures):
    snap, events, snap_rows, event_rows = fixtures
    t = _table(spark, tmp_path, snap, "wap_gc")
    t.merge(events.filter(events.lsn <= 400), 0).applied
    t.merge(events.filter(events.lsn > 400), 1, stage_id="s1")
    # aggressive GC with zero grace: staged files must still be pinned
    t.expire_snapshots(keep_last=1, scan_orphans=True, orphan_grace_sec=0)
    for e in t._load_staged("s1")["new_files"]:
        assert os.path.exists(os.path.join(t.root, e["path"])), e["path"]
    assert t.publish("s1").applied is True
    assert _shas(t.read()) == _expected(snap_rows, event_rows)


def test_staged_schema_evolution_publishes(spark, tmp_path):
    snap = datagen.source_snapshot(spark, 100)
    events = datagen.change_events(spark, 400, 120, with_lang_confidence=True)
    snap_rows = [r.asDict() for r in snap.collect()]
    event_rows = [r.asDict() for r in events.collect()]
    t = LakeTable.create(
        spark, str(tmp_path / "wap_evolve"), SOURCE_FILES, ["repo", "path"], n_buckets=8
    )
    t.overwrite(snap, lsn=datagen.GENESIS_LSN)
    st = t.merge(events, 0, stage_id="s1")
    assert st.applied is False
    # the audit view already carries the additively-evolved column
    assert "lang_confidence" in t.read_staged("s1").columns
    assert "lang_confidence" not in t.read().columns  # main not yet
    assert t.publish("s1").applied is True
    assert "lang_confidence" in t.read().columns
    assert _shas_content(t) == {
        k: v.get("content")
        for k, v in oracle.reduce_events(snap_rows, event_rows).items()
    }


def _shas_content(t):
    return {
        (r["repo"], r["path"]): r["content"]
        for r in t.read().select("repo", "path", "content").collect()
    }
