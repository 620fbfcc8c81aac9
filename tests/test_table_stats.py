"""Manifest-stats surface: per-file record/byte/LSN-bound stats
collected at write time (Iceberg manifest-entry analogue), the
O(metadata) ``stats()`` summary, and the row-mass compaction policy
``compact(min_delta_rows=...)`` built on them."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from w3_data_etl_pipeline_spark import datagen
from w3_data_etl_pipeline_spark.plans.laketable import LakeTable
from w3_data_etl_pipeline_spark.schemas import SOURCE_FILES

N_KEYS = 120
N_EVENTS = 600


@pytest.fixture(scope="module")
def fixtures(spark):
    snap = datagen.source_snapshot(spark, N_KEYS).cache()
    events = datagen.change_events(spark, N_EVENTS, N_KEYS).cache()
    return snap, events


def _new_table(spark, tmp_path, snap, name, n_buckets=8):
    t = LakeTable.create(
        spark, str(tmp_path / name), SOURCE_FILES, ["repo", "path"], n_buckets=n_buckets
    )
    t.overwrite(snap, lsn=datagen.GENESIS_LSN)
    return t


def _delta_rows_by_bucket(table):
    rows: Counter = Counter()
    for f in table.snapshot()["files"]:
        if f.get("kind", "base") == "delta":
            rows[f["bucket"]] += f["rows"]
    return rows


def test_stats_exact_on_base_only(spark, tmp_path, fixtures):
    """With no pending deltas the manifest row sum IS the table
    cardinality — count() without opening a single data file."""
    snap, _ = fixtures
    t = _new_table(spark, tmp_path, snap, "t_exact")
    s = t.stats()
    assert s["rows_exact"] is True
    assert s["rows"] == t.read().count() == N_KEYS
    assert s["delta_files"] == 0 and s["delta_rows"] == 0
    assert s["files_without_stats"] == 0
    assert s["bytes"] > 0
    assert s["lsn_max"] == datagen.GENESIS_LSN
    assert s["delta_debt"] == 0.0


def test_stats_upper_bound_with_deltas(spark, tmp_path, fixtures):
    """Pending MOR deltas make the row sum an upper bound (duplicate
    keys / tombstones resolve at read time) and surface as delta
    debt; lsn_max tracks the newest applied event."""
    snap, events = fixtures
    t = _new_table(spark, tmp_path, snap, "t_mor")
    t.merge(events.filter(events.lsn <= 300), 0, mode="mor")
    t.merge(events.filter(events.lsn > 300), 1, mode="mor")
    s = t.stats()
    live = t.read().count()
    assert s["delta_files"] > 0 and s["delta_rows"] > 0
    assert s["rows_exact"] is False
    assert s["rows"] >= live
    assert s["delta_debt"] > 0
    assert 0 < s["buckets_with_deltas"] <= s["n_buckets"]
    assert s["lsn_max"] == N_EVENTS
    # folding everything restores exactness and the true cardinality
    t.compact()
    s2 = t.stats()
    assert s2["rows_exact"] is True and s2["rows"] == live == t.read().count()
    assert s2["lsn_max"] == N_EVENTS  # folded rows keep their max LSN


def test_compact_by_row_mass_folds_hot_bucket_only(spark, tmp_path, fixtures):
    """min_delta_rows folds by pending ROW MASS: a bucket fed many
    rows folds, a bucket with the same FILE count but near-empty
    deltas does not — the policy a count trigger gets wrong."""
    snap, events = fixtures
    t = _new_table(spark, tmp_path, snap, "t_mass")
    # two delta files per bucket, very uneven row mass across buckets
    t.merge(events.filter(events.lsn <= 450), 0, mode="mor")
    t.merge(events.filter(events.lsn > 450), 1, mode="mor")
    mass = _delta_rows_by_bucket(t)
    assert len(mass) >= 2 and max(mass.values()) > min(mass.values())
    thr = max(mass.values())  # only the heaviest bucket(s) cross
    hot = {b for b, r in mass.items() if r >= thr}
    cold = set(mass) - hot
    assert hot and cold
    before = {
        (r["repo"], r["path"]): r["content_sha"]
        for r in t.state_fingerprint().collect()
    }
    v0 = t.current_version()
    assert t.compact(min_delta_rows=thr + 1) == v0  # nothing crosses: no-op
    v1 = t.compact(min_delta_rows=thr)
    assert v1 == v0 + 1
    mass_after = _delta_rows_by_bucket(t)
    assert all(b not in mass_after for b in hot)
    assert all(b in mass_after for b in cold)  # cold deltas untouched
    after = {
        (r["repo"], r["path"]): r["content_sha"]
        for r in t.state_fingerprint().collect()
    }
    assert after == before


def test_pre_stats_manifest_backward_compat(spark, tmp_path, fixtures):
    """A manifest written before the stats upgrade (file entries
    without rows/bytes/lsn keys) must still read, report
    files_without_stats, and compact(min_delta_rows) must fold its
    unknown-mass buckets conservatively."""
    snap, events = fixtures
    t = _new_table(spark, tmp_path, snap, "t_legacy")
    t.merge(events.filter(events.lsn <= 300), 0, mode="mor")
    live = t.read().count()
    # simulate a pre-upgrade manifest: strip the stats keys
    old = t.snapshot()
    stripped = dict(old)
    stripped["files"] = [
        {"path": f["path"], "bucket": f["bucket"], "kind": f.get("kind", "base")}
        for f in old["files"]
    ]
    stripped.update(version=old["version"] + 1, parent=old["version"])
    t._write_snapshot(stripped)
    s = t.stats()
    assert s["files_without_stats"] == len(stripped["files"])
    assert s["rows_exact"] is False and s["rows"] == 0  # totals partial
    assert t.read().count() == live  # read path unaffected
    # unknown delta mass -> conservatively foldable even at a huge bar
    v = t.compact(min_delta_rows=10**12)
    assert v == stripped["version"] + 1
    assert _delta_rows_by_bucket(t) == Counter()
    assert t.read().count() == live
    # the fold rewrote with stats: exact again
    assert t.stats()["rows_exact"] is True


def test_schema_evolution_keeps_stats(spark, tmp_path, fixtures):
    """A widening batch (new column) still lands with per-file stats
    and the summed row counts stay consistent."""
    snap, events = fixtures
    t = _new_table(spark, tmp_path, snap, "t_evo")
    ev2 = events.filter(events.lsn <= 100).withColumn("stars", F.lit(5))
    t.merge(ev2, 0, mode="cow")
    s = t.stats()
    assert s["files_without_stats"] == 0
    assert s["rows_exact"] is True and s["rows"] == t.read().count()


def test_streaming_row_mass_policy(spark, tmp_path, fixtures):
    """auto_compact_delta_rows in the foreachBatch body keeps pending
    delta row mass bounded while preserving exactness of the final
    state (apply_batch == the streaming sink)."""
    from w3_data_etl_pipeline_spark.streaming.cdc import apply_batch

    snap, events = fixtures
    t = _new_table(spark, tmp_path, snap, "t_policy")
    live_expected = None
    for i, (lo, hi) in enumerate([(1, 200), (201, 400), (401, 600)]):
        batch = events.filter((events.lsn >= lo) & (events.lsn <= hi))
        st = apply_batch(
            t, batch, i, enrich=False, mode="mor", auto_compact_delta_rows=150
        )
        assert st.applied
        mass = _delta_rows_by_bucket(t)
        assert all(r < 150 for r in mass.values())  # policy bound held
    live_expected = t.read().count()
    t.compact()
    assert t.read().count() == live_expected
    assert t.stats()["rows_exact"] is True


def test_compact_lineage_preserves_audit_rows(spark, tmp_path, fixtures):
    """Consolidating the lineage dir must keep every audit row (same
    totals), shrink the file count to one, stay idempotent, and keep
    accepting appends from later merges."""
    import os

    snap, events = fixtures
    t = _new_table(spark, tmp_path, snap, "t_lin")
    for i, (lo, hi) in enumerate([(1, 150), (151, 300), (301, 450)]):
        t.merge(events.filter((events.lsn >= lo) & (events.lsn <= hi)), i, mode="mor")

    def lineage_files():
        return [
            os.path.join(dp, n)
            for dp, _, ns in os.walk(t.lineage_dir)
            for n in ns
            if n.endswith(".parquet")
        ]

    before_rows = t.lineage().count()
    before_sum = t.lineage().groupBy().sum("applied_count").collect()[0][0]
    assert len(lineage_files()) >= 3
    out = t.compact_lineage(max_files=1)
    assert out["compacted_files"] >= 3 and out["rows"] == before_rows
    assert len(lineage_files()) == 1
    assert t.lineage().count() == before_rows
    assert t.lineage().groupBy().sum("applied_count").collect()[0][0] == before_sum
    # idempotent (already at 1 file)
    assert t.compact_lineage(max_files=1)["compacted_files"] in (0, 1)
    # later merges append fresh files; totals keep growing
    t.merge(events.filter(events.lsn > 450), 9, mode="mor")
    assert t.lineage().count() > before_rows


def test_compact_lineage_lock_prevents_double_consolidation(spark, tmp_path, fixtures):
    """A held (fresh) lock makes a second compaction a no-op — two
    concurrent consolidations of the same file list would double every
    audit row; a stale lock (crashed holder) is broken through."""
    import os
    import time as _time

    snap, events = fixtures
    t = _new_table(spark, tmp_path, snap, "t_linlock")
    for i in range(3):
        lo = i * 150 + 1
        t.merge(events.filter((events.lsn >= lo) & (events.lsn <= lo + 149)), i, mode="mor")
    rows = t.lineage().count()
    lock = os.path.join(t.lineage_dir, ".compact.lock")
    open(lock, "w").close()
    out = t.compact_lineage(max_files=1)
    assert out == {"compacted_files": 0, "rows": 0, "skipped": "locked"}
    assert t.lineage().count() == rows
    # stale lock: break through and consolidate
    old = _time.time() - 700
    os.utime(lock, (old, old))
    out = t.compact_lineage(max_files=1)
    assert out["compacted_files"] >= 3 and out["rows"] == rows
    assert not os.path.exists(lock)
    assert t.lineage().count() == rows


def test_files_metadata_table(spark, tmp_path, fixtures):
    """files() mirrors the manifest: per-file rows/bytes/lsn bounds
    agree with stats() totals, kinds match, and it never opens data."""
    snap, events = fixtures
    t = _new_table(spark, tmp_path, snap, "t_files")
    t.merge(events.filter(events.lsn <= 200), 0, mode="mor")
    df = t.files()
    s = t.stats()
    agg = df.groupBy().sum("rows", "bytes").collect()[0]
    assert agg[0] == s["rows"] and agg[1] == s["bytes"]
    kinds = {r["kind"] for r in df.select("kind").distinct().collect()}
    assert kinds == {"base", "delta"}
    assert df.count() == s["base_files"] + s["delta_files"]
    assert df.filter(df.lsn_max > 200).count() == 0  # bounds respected


def test_partitions_metadata_table(spark, tmp_path, fixtures):
    """partitions() is the per-bucket rollup of files(): totals match
    stats(), delta debt localizes to the buckets that actually carry
    delta files, and the LSN high-water mark is per-bucket max."""
    snap, events = fixtures
    t = _new_table(spark, tmp_path, snap, "t_parts")
    t.merge(events.filter(events.lsn <= 200), 0, mode="mor")
    p = t.partitions()
    s = t.stats()
    agg = p.groupBy().sum(
        "base_files", "delta_files", "rows", "bytes", "delta_rows"
    ).collect()[0]
    assert agg[0] == s["base_files"] and agg[1] == s["delta_files"]
    assert agg[2] == s["rows"] and agg[3] == s["bytes"]
    assert agg[4] == s["delta_rows"]
    rows = {r["bucket"]: r.asDict() for r in p.collect()}
    by_bucket = _delta_rows_by_bucket(t)
    for b, d in rows.items():
        assert d["delta_rows"] == by_bucket.get(b, 0)
        assert d["lsn_max"] is None or d["lsn_max"] <= 200 or d["delta_files"] == 0
    assert p.count() == len({f["bucket"] for f in t.snapshot()["files"]})
