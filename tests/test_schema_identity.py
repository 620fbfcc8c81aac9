"""Field-id column identity (Iceberg spec-v2 analogue): rename and
drop are metadata-only commits — old files keep their physical column
names and readers alias by field id — so reads, the change feed, time
travel, rollback, and file skipping all stay correct across rename /
drop / re-add boundaries (VERDICT r3 item #3 done-criteria)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from w3_data_etl_pipeline_spark import datagen, oracle
from w3_data_etl_pipeline_spark.plans.laketable import LakeTable
from w3_data_etl_pipeline_spark.schemas import SOURCE_FILES
from w3_data_etl_pipeline_spark.streaming.cdc import apply_batch


@pytest.fixture(scope="module")
def fixtures(spark):
    snap = datagen.source_snapshot(spark, 120).cache()
    events = datagen.change_events(spark, 600, 180).cache()
    return snap, events


def _new_table(spark, tmp_path, snap, name="t", n_buckets=4):
    t = LakeTable.create(
        spark, str(tmp_path / name), SOURCE_FILES, ["repo", "path"], n_buckets=n_buckets
    )
    t.overwrite(snap, lsn=datagen.GENESIS_LSN)
    return t


def _shas(table):
    return {
        (r["repo"], r["path"]): r["content_sha"]
        for r in table.state_fingerprint().collect()
    }


# ---------------------------------------------------------------- rename


def test_rename_reads_one_continuous_column(spark, tmp_path, fixtures):
    """Files written BEFORE the rename surface their values under the
    NEW name: the column is continuous across the boundary, and no row
    forks or goes NULL."""
    snap, events = fixtures
    t = _new_table(spark, tmp_path, snap, "t_ren")
    apply_batch(t, events.filter(events.lsn <= 300), 0, enrich=False)
    before = {
        (r["repo"], r["path"]): r["lang"] for r in t.read().collect()
    }
    t.rename_column("lang", "language")
    df = t.read()
    assert "language" in df.columns and "lang" not in df.columns
    after = {(r["repo"], r["path"]): r["language"] for r in df.collect()}
    assert after == before  # same values, new name, zero rewrites


def test_rename_is_metadata_only_commit(spark, tmp_path, fixtures):
    snap, events = fixtures
    t = _new_table(spark, tmp_path, snap, "t_ren_meta")
    apply_batch(t, events.filter(events.lsn <= 200), 0, enrich=False)
    files_before = sorted(f["path"] for f in t.snapshot()["files"])
    t.rename_column("lang", "language")
    s = t.snapshot()
    assert sorted(f["path"] for f in s["files"]) == files_before
    assert s["operation"] == "rename-column"


def test_merge_after_rename_uses_new_name(spark, tmp_path, fixtures):
    """Post-rename batches arrive with the NEW column name; LWW
    resolution must mix old-epoch and new-epoch files per key and the
    final state must equal the oracle (which never renamed)."""
    snap, events = fixtures
    t = _new_table(spark, tmp_path, snap, "t_ren_merge")
    b0 = events.filter(events.lsn <= 300)
    b1 = events.filter(events.lsn > 300).withColumnRenamed("lang", "language")
    apply_batch(t, b0, 0, enrich=False)
    t.rename_column("lang", "language")
    apply_batch(t, b1, 1, enrich=False)
    snap_rows = [r.asDict() for r in snap.collect()]
    event_rows = [r.asDict() for r in fixtures[1].collect()]
    exp = oracle.expected_fingerprint(oracle.reduce_events(snap_rows, event_rows))
    assert _shas(t) == exp


def test_change_feed_across_rename(spark, tmp_path, fixtures):
    """changes(v_before_rename, current) must emit ONE continuous
    column under the CURRENT name, with pre-rename preimages readable
    through the alias."""
    snap, events = fixtures
    t = _new_table(spark, tmp_path, snap, "t_ren_cdf")
    apply_batch(t, events.filter(events.lsn <= 300), 0, enrich=False)
    v1 = t.current_version()
    t.rename_column("lang", "language")
    b1 = events.filter(events.lsn > 300).withColumnRenamed("lang", "language")
    apply_batch(t, b1, 1, enrich=False)
    feed = t.changes(v1, include_preimage=True)
    assert "language" in feed.columns and "lang" not in feed.columns
    rows = feed.collect()
    assert rows
    # update preimages are served from PRE-RENAME files: the old
    # physical name resolves by field id, so values are non-NULL
    # whenever the old state had a lang
    pre = [r for r in rows if r["_change_type"] == "update_preimage"]
    assert pre and any(r["language"] is not None for r in pre)


def test_time_travel_shows_old_name(spark, tmp_path, fixtures):
    snap, events = fixtures
    t = _new_table(spark, tmp_path, snap, "t_ren_tt")
    apply_batch(t, events.filter(events.lsn <= 200), 0, enrich=False)
    v1 = t.current_version()
    t.rename_column("lang", "language")
    old = t.read(version=v1)
    assert "lang" in old.columns and "language" not in old.columns
    new = t.read()
    assert {(r["repo"], r["path"], r["lang"]) for r in old.collect()} == {
        (r["repo"], r["path"], r["language"]) for r in new.collect()
    }


def test_rename_guards(spark, tmp_path, fixtures):
    snap, _ = fixtures
    t = _new_table(spark, tmp_path, snap, "t_ren_guard")
    with pytest.raises(ValueError):
        t.rename_column("repo", "repository")  # key column
    with pytest.raises(ValueError):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError):
        t.rename_column("lang", "content")  # collision


# ---------------------------------------------------------------- drop


def test_rollback_past_drop_restores_data(spark, tmp_path, fixtures):
    """drop is metadata-only, so rolling back past it restores BOTH
    the column and its historical values — nothing was rewritten."""
    snap, events = fixtures
    t = _new_table(spark, tmp_path, snap, "t_drop_rb")
    apply_batch(t, events.filter(events.lsn <= 300), 0, enrich=False)
    v_with = t.current_version()
    want = {(r["repo"], r["path"]): r["lang"] for r in t.read().collect()}
    t.drop_column("lang")
    assert "lang" not in t.read().columns
    apply_batch(
        t, events.filter(events.lsn > 300).drop("lang"), 1, enrich=False
    )
    t.rollback(v_with)
    df = t.read()
    assert "lang" in df.columns
    got = {(r["repo"], r["path"]): r["lang"] for r in df.collect()}
    assert got == want


def test_readd_after_drop_never_resurrects(spark, tmp_path, fixtures):
    """Re-adding a dropped name allocates a FRESH field id: old files'
    physical 'lang' bytes stay invisible (read as NULL), only rows
    written after the re-add carry values."""
    snap, events = fixtures
    t = _new_table(spark, tmp_path, snap, "t_readd")
    apply_batch(t, events.filter(events.lsn <= 300), 0, enrich=False)
    t.drop_column("lang")
    # re-add via additive evolution: new batch carries 'lang' again
    b1 = events.filter(events.lsn > 300)
    touched = {
        (r["repo"], r["path"]) for r in b1.collect() if r["op"] != "D"
    }
    apply_batch(t, b1, 1, enrich=False)
    df = t.read()
    assert "lang" in df.columns
    for r in df.collect():
        if (r["repo"], r["path"]) not in touched:
            assert r["lang"] is None, "dropped data resurrected"


def test_change_feed_across_drop(spark, tmp_path, fixtures):
    """A feed spanning a drop reads both sides through the NARROW
    current schema — the dropped column simply isn't a diffable value,
    so a key whose only change was in the dropped column is silent."""
    snap, events = fixtures
    t = _new_table(spark, tmp_path, snap, "t_drop_cdf")
    apply_batch(t, events.filter(events.lsn <= 300), 0, enrich=False)
    v1 = t.current_version()
    t.drop_column("lang")
    apply_batch(t, events.filter(events.lsn > 300).drop("lang"), 1, enrich=False)
    feed = t.changes(v1)
    assert "lang" not in feed.columns
    assert feed.count() > 0


# ------------------------------------------------- pruning interaction


def test_prune_bounds_resolve_by_field_id(spark, tmp_path):
    """The adversarial rename chain: rename a->c, then b->a. A
    predicate on current 'a' (field id of the ORIGINAL b) must check
    old files' physical-'b' bounds — a raw name lookup would read
    original a's bounds and wrongly exclude matching files."""
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("a", T.DoubleType()),
            T.StructField("b", T.DoubleType()),
        ]
    )
    t = LakeTable.create(spark, str(tmp_path / "t_swap"), schema, ["k"], n_buckets=2)
    rows = spark.range(0, 64).select(
        F.col("id").alias("k"),
        (F.col("id") % 10).cast("double").alias("a"),  # a in [0, 9]
        (F.col("id") + 100).cast("double").alias("b"),  # b in [100, 163]
        F.col("id").alias("lsn"),
        F.lit("U").alias("op"),
    )
    t.merge(rows, 0)
    t.compact(cluster_by=["b"], max_records_per_file=16)
    t.rename_column("a", "c")
    t.rename_column("b", "a")
    # current 'a' is original b: every file's b-bounds intersect >=150
    got = sorted(r["k"] for r in t.read_where([("a", ">=", 150.0)]).collect())
    exp = sorted(
        r["k"] for r in t.read().filter(F.col("a") >= 150.0).collect()
    )
    assert got == exp and len(exp) == 14  # k in [50, 63]
    # and the stale direction: current 'c' (original a) prunes on the
    # old physical-a bounds — nothing matches >= 50
    assert t.read_where([("c", ">=", 50.0)]).count() == 0


def test_prune_skips_files_predating_column_birth(spark, tmp_path):
    """Base files whose epoch predates a re-added column hold only
    NULLs for it; NULL never satisfies a comparison, so those files
    prune without being opened."""
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    t = LakeTable.create(spark, str(tmp_path / "t_birth"), schema, ["k"], n_buckets=2)
    old = spark.range(0, 32).select(
        F.col("id").alias("k"),
        F.col("id").cast("double").alias("v"),
        F.col("id").alias("lsn"),
        F.lit("U").alias("op"),
    )
    t.merge(old, 0)
    t.drop_column("v")
    # re-add v with a FRESH field id via a COW merge touching ONLY
    # bucket 0 — bucket 1's file keeps its pre-birth epoch
    new = (
        spark.range(100, 140)
        .filter(F.pmod(F.xxhash64(F.col("id").cast("long")), F.lit(2)) == 0)
        .select(
            F.col("id").alias("k"),
            F.col("id").cast("double").alias("v"),
            (F.col("id") + 1000).alias("lsn"),
            F.lit("U").alias("op"),
        )
    )
    new_keys = sorted(r["k"] for r in new.collect())
    assert new_keys
    t.merge(new, 1)
    snap = t.snapshot()
    kept = t.prune_files(snap, [("v", ">=", 0.0)])
    # only the rewritten bucket's files survive the prune
    assert 0 < len(kept) < len(snap["files"])
    assert {f["bucket"] for f in kept} == {0}
    got = sorted(r["k"] for r in t.read_where([("v", ">=", 0.0)]).collect())
    assert got == new_keys
