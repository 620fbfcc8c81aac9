"""Named immutable refs (Iceberg `tag` analogue): create_tag pins a
snapshot under a human name, read_tag time-travels by name, and —
the load-bearing part — expire_snapshots retains tagged versions and
every file they reference regardless of keep_last, until drop_tag
unpins them. SURVEY.md §10.10."""

from __future__ import annotations

import pytest

from w3_data_etl_pipeline_spark import datagen, oracle
from w3_data_etl_pipeline_spark.plans.laketable import LakeTable
from w3_data_etl_pipeline_spark.schemas import SOURCE_FILES

N_KEYS = 120
N_EVENTS = 600
N_BATCHES = 4


@pytest.fixture(scope="module")
def corpus(spark):
    snap = datagen.source_snapshot(spark, N_KEYS, content_max=128).cache()
    events = datagen.change_events(spark, N_EVENTS, N_KEYS, content_max=128).cache()
    snap_rows = [r.asDict() for r in snap.collect()]
    event_rows = [r.asDict() for r in events.collect()]
    return snap, events, snap_rows, event_rows


def _table(spark, tmp_path, snap, name):
    t = LakeTable.create(
        spark, str(tmp_path / name), SOURCE_FILES, ["repo", "path"], n_buckets=8
    )
    t.overwrite(snap, lsn=datagen.GENESIS_LSN)
    return t


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


def _apply_batches(t, events, upto):
    per = N_EVENTS // N_BATCHES
    for i in range(upto):
        lo, hi = i * per + 1, (i + 1) * per if i < N_BATCHES - 1 else N_EVENTS
        t.merge(events.filter((events.lsn >= lo) & (events.lsn <= hi)), i, mode="cow")
    return per


def test_tag_read_and_retention_pinning(spark, tmp_path, corpus):
    snap, events, snap_rows, event_rows = corpus
    t = _table(spark, tmp_path, snap, "t_tag")
    per = _apply_batches(t, events, 2)
    tagged_v = t.create_tag("audited-q2")
    assert t.tags() == {"audited-q2": tagged_v}

    # more history lands, aggressive expiry runs every commit
    per = N_EVENTS // N_BATCHES
    for i in range(2, N_BATCHES):
        lo, hi = i * per + 1, (i + 1) * per if i < N_BATCHES - 1 else N_EVENTS
        t.merge(events.filter((events.lsn >= lo) & (events.lsn <= hi)), i, mode="cow")
        t.expire_snapshots(keep_last=1, orphan_grace_sec=0)

    # the tagged snapshot survived keep_last=1: readable by name and
    # byte-identical to the state after batch 1
    assert _shas(t.read_tag("audited-q2")) == _expected(snap_rows, event_rows, 2 * per)
    # an untagged intermediate version did NOT survive
    assert tagged_v + 1 != t.current_version()
    with pytest.raises(FileNotFoundError):
        t.snapshot(tagged_v + 1)
    # head unaffected
    assert _shas(t.read()) == _expected(snap_rows, event_rows, N_EVENTS)

    # unpinning makes it expirable again
    assert t.drop_tag("audited-q2")
    t.expire_snapshots(keep_last=1, orphan_grace_sec=0)
    with pytest.raises(FileNotFoundError):
        t.snapshot(tagged_v)


def test_tag_exclusive_create_and_validation(spark, tmp_path, corpus):
    snap, events, _, _ = corpus
    t = _table(spark, tmp_path, snap, "t_tagx")
    _apply_batches(t, events, 1)
    v = t.create_tag("r1")
    with pytest.raises(FileExistsError):
        t.create_tag("r1")  # a tag must never silently move
    for bad in ("", "a/b", "..", ".hidden"):
        with pytest.raises(ValueError):
            t.create_tag(bad)
    with pytest.raises(ValueError):
        t.tag_version("nope")
    assert t.drop_tag("r1") and not t.drop_tag("r1")
    assert t.create_tag("r1", version=v) == v  # re-create after drop


def test_tag_explicit_version_and_rollback_target(spark, tmp_path, corpus):
    snap, events, snap_rows, event_rows = corpus
    t = _table(spark, tmp_path, snap, "t_tagrb")
    per = _apply_batches(t, events, N_BATCHES)
    # tag the genesis state retroactively, then roll back to the tag
    t.create_tag("genesis", version=1)
    t.rollback(t.tag_version("genesis"))
    assert _shas(t.read()) == _expected(snap_rows, event_rows, 0)
    # the tag still reads the same state after the rollback commit
    assert _shas(t.read_tag("genesis")) == _expected(snap_rows, event_rows, 0)
