"""Split snapshot manifests (Iceberg manifest-file analogue): the
snapshot JSON stores O(n_buckets) content-addressed pointers, commits
write only the touched buckets' manifests, unchanged buckets share
their parent's files structurally, and expire GCs orphaned manifests."""

from __future__ import annotations

import json
import os

import pytest

from w3_data_etl_pipeline_spark import datagen
from w3_data_etl_pipeline_spark.plans.laketable import LakeTable
from w3_data_etl_pipeline_spark.schemas import SOURCE_FILES

N_KEYS = 150
N_EVENTS = 900


@pytest.fixture(scope="module")
def fixtures(spark):
    snap = datagen.source_snapshot(spark, N_KEYS, content_max=256).cache()
    events = datagen.change_events(spark, N_EVENTS, N_KEYS, content_max=256).cache()
    return snap, events


def _new_table(spark, tmp_path, snap, name, n_buckets=8):
    t = LakeTable.create(
        spark, str(tmp_path / name), SOURCE_FILES, ["repo", "path"], n_buckets=n_buckets
    )
    t.overwrite(snap, lsn=datagen.GENESIS_LSN)
    return t


def _raw_snap(t, version):
    with open(t._snap_path(version)) as f:
        return json.load(f)


def test_commit_writes_only_touched_bucket_manifests(spark, tmp_path, fixtures):
    """A microbatch touching k buckets must change exactly k pointers;
    every other bucket's pointer string is shared verbatim with the
    parent — the O(touched) commit-metadata property that keeps
    per-microbatch cost flat at 10^6-file scale."""
    snap, events = fixtures
    t = _new_table(spark, tmp_path, snap, "t_shared")
    v0 = t.current_version()
    # a narrow batch: few keys -> few buckets
    few = events.filter(events.lsn <= 20)
    st = t.merge(few, 0, mode="mor")
    assert st.applied and st.touched_buckets < t.snapshot()["n_buckets"]
    a = _raw_snap(t, v0)["manifests"]
    b = _raw_snap(t, t.current_version())["manifests"]
    assert "files" not in _raw_snap(t, t.current_version())  # never inlined
    changed = {k for k in (set(a) | set(b)) if a.get(k) != b.get(k)}
    assert len(changed) == st.touched_buckets
    unchanged = set(a) - changed
    assert unchanged and all(a[k] == b[k] for k in unchanged)  # shared pointers


def test_snapshot_json_stays_o_buckets_as_files_grow(spark, tmp_path, fixtures):
    """MOR deltas grow the FILE count linearly with batches; the
    snapshot JSON must not (it holds pointers, not entries)."""
    snap, events = fixtures
    t = _new_table(spark, tmp_path, snap, "t_size")
    sizes, n_files = [], []
    for i in range(6):
        lo = i * 150 + 1
        t.merge(events.filter((events.lsn >= lo) & (events.lsn <= lo + 149)), i, mode="mor")
        sizes.append(os.path.getsize(t._snap_path(t.current_version())))
        n_files.append(len(t.snapshot()["files"]))
    assert n_files[-1] > n_files[0] * 2  # files really grew
    assert max(sizes) <= min(sizes) * 1.2  # metadata did not


def test_pre_split_inline_snapshot_reads_and_upgrades(spark, tmp_path, fixtures):
    """A v1 snapshot (inline "files", no manifests) must load
    unchanged, and the next commit on top of it writes the split
    format while preserving the data."""
    snap, events = fixtures
    t = _new_table(spark, tmp_path, snap, "t_v1")
    live0 = t.read().count()
    cur = t.snapshot()
    # rewrite the current snapshot as a v1-format JSON (inline files)
    v1 = {k: v for k, v in cur.items() if k != "manifests"}
    v1["version"] = cur["version"] + 1
    v1["parent"] = cur["version"]
    with open(t._snap_path(v1["version"]), "x") as f:
        json.dump(v1, f)
    with open(os.path.join(t._meta, "current"), "w") as f:
        f.write(str(v1["version"]))
    t2 = LakeTable(spark, t.root)  # fresh instance, empty cache
    assert "manifests" not in _raw_snap(t2, v1["version"])
    assert t2.read().count() == live0
    assert t2.merge(events.filter(events.lsn <= 100), 0, mode="cow").applied
    raw = _raw_snap(t2, t2.current_version())
    assert "files" not in raw and raw["manifests"]  # upgraded on commit
    assert t2.read().count() == t2.stats()["rows"]


def test_expire_collects_orphaned_manifests(spark, tmp_path, fixtures):
    """Expiry must GC manifest files referenced only by expired
    snapshots while every retained version stays readable."""
    snap, events = fixtures
    t = _new_table(spark, tmp_path, snap, "t_gc")
    for i in range(4):
        lo = i * 200 + 1
        t.merge(events.filter((events.lsn >= lo) & (events.lsn <= lo + 199)), i, mode="cow")
    before = len(os.listdir(t._manifest_dir))
    out = t.expire_snapshots(keep_last=2)
    assert out["removed_manifests"] > 0
    after = len(os.listdir(t._manifest_dir))
    assert after < before
    # retained versions read; all their pointers resolve
    retained = sorted(
        int(n[1:-5])
        for n in os.listdir(t._meta)
        if n.startswith("v") and n.endswith(".json")
    )
    for v in retained:
        s = t.snapshot(v)
        assert all(
            os.path.exists(os.path.join(t.root, rel))
            for rel in s["manifests"].values()
        )
    assert t.read().count() == t.stats()["rows"]


def test_changed_buckets_pointer_diff_matches_entry_diff(spark, tmp_path, fixtures):
    """The O(n_buckets) pointer diff must agree with the O(files)
    entry compare it replaced."""
    snap, events = fixtures
    t = _new_table(spark, tmp_path, snap, "t_diff")
    v0 = t.current_version()
    t.merge(events.filter(events.lsn <= 60), 0, mode="mor")
    v1 = t.current_version()
    fast = t.changed_buckets(v0, v1)
    a = t._files_by_bucket(t.snapshot(v0))
    b = t._files_by_bucket(t.snapshot(v1))
    slow = {k for k in (set(a) | set(b)) if a.get(k) != b.get(k)}
    assert fast == slow and fast


def test_history_records_operations(spark, tmp_path, fixtures):
    """history() must show the full lifecycle with each commit's
    operation, from raw snapshot JSONs only (no manifest reads)."""
    snap, events = fixtures
    t = _new_table(spark, tmp_path, snap, "t_hist")
    t.merge(events.filter(events.lsn <= 100), 0, mode="cow")
    t.merge(events.filter((events.lsn > 100) & (events.lsn <= 200)), 1, mode="mor")
    t.compact(min_deltas=1)
    v_pre = t.current_version()
    t.rebucket(16)
    t.rollback(v_pre)
    h = t.history()
    ops = [e["operation"] for e in h]
    assert ops == [
        "create", "overwrite", "merge-cow", "merge-mor",
        "compact", "rebucket", "rollback",
    ]
    assert h[-1]["rollback_of"] == v_pre
    assert all(e["version"] == i for i, e in enumerate(h))
    assert [e["parent"] for e in h[1:]] == list(range(len(h) - 1))
    assert all(e["n_files"] for e in h[1:])  # counted at write time
    # history survives expiry minus the expired versions
    t.expire_snapshots(keep_last=2, orphan_grace_sec=0)
    assert [e["version"] for e in t.history()] == [v["version"] for v in h[-2:]]


def test_production_bucket_count_smoke(spark, tmp_path, fixtures):
    """4096 buckets (the production count the docs assume): commits,
    stats, pointer sharing, and lookups all stay O(touched)/O(n_buckets)
    — guards against an accidental O(n_buckets^2) constant hiding in
    the metadata paths."""
    snap, events = fixtures
    t = _new_table(spark, tmp_path, snap, "t_wide", n_buckets=4096)
    st = t.merge(events.filter(events.lsn <= 120), 0, mode="mor")
    assert st.applied
    raw = _raw_snap(t, t.current_version())
    parent = _raw_snap(t, raw["parent"])
    assert len(raw["manifests"]) <= 4096
    changed = {
        k
        for k in (set(raw["manifests"]) | set(parent["manifests"]))
        if raw["manifests"].get(k) != parent["manifests"].get(k)
    }
    assert len(changed) == st.touched_buckets  # O(touched) commit
    assert os.path.getsize(t._snap_path(raw["version"])) < 1 << 19  # <512 KB
    s = t.stats()
    assert s["delta_files"] > 0 and s["rows"] >= N_KEYS
    keys = [(r["repo"], r["path"]) for r in t.read().limit(2).collect()]
    assert t.read_keys(keys).count() == 2


def test_timestamp_time_travel(spark, tmp_path, fixtures):
    """version_at/read_as_of resolve wall-clock timestamps to the
    snapshot current at that instant; pre-history timestamps raise."""
    import time as _time

    snap, events = fixtures
    t = _new_table(spark, tmp_path, snap, "t_ts")
    t0 = _raw_snap(t, 0)["committed_at"]
    n_boot = t.read().count()
    marks = []
    for i in range(3):
        lo = i * 100 + 1
        t.merge(
            events.filter((events.lsn >= lo) & (events.lsn <= lo + 99)), i, mode="cow"
        )
        marks.append((_time.time(), t.current_version(), t.read().count()))
        _time.sleep(0.05)  # commit timestamps must be distinguishable
    for ts, v, n in marks:
        assert t.version_at(ts) == v
        assert t.read_as_of(ts).count() == n
    assert t.version_at(_time.time()) == t.current_version()
    # overwrite happened after create: ts between them resolves to boot
    assert t.read_as_of(marks[0][0] - 0.04).count() in (n_boot, marks[0][2])
    with pytest.raises(ValueError):
        t.version_at(t0 - 1000)
