"""Equality data skipping (Iceberg Puffin bloom-blob analogue):
columns opted in via alter_skip_columns get a per-file exact
distinct set (categorical, ndv<=64) or an ndv-sized bloom (inline up
to 1 KiB, content-addressed sidecar beyond) in the manifest, and ``col = val`` predicates prune files on an
UNCLUSTERED layout where min/max bounds span the domain and prove
nothing. Pinned the same way as the bounds tests: files opened
(DataFrame.inputFiles) == files the index admits, result always
equals full-scan + filter. SURVEY.md §10.11."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from w3_data_etl_pipeline_spark.plans.laketable import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("cat", T.StringType()),
        T.StructField("doc", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)

N = 2400


def _rows(spark, n=N, tag=""):
    return spark.range(1, n + 1).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("c"), (F.col("id") % 6).cast("string")).alias("cat"),
        F.concat(F.lit(f"doc{tag}-"), F.col("id").cast("string")).alias("doc"),
        (F.col("id") / 7.0).alias("score"),
        F.col("id").alias("lsn"),
        F.lit("U").alias("op"),
    )


@pytest.fixture()
def indexed(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["user_id"], n_buckets=8)
    t.alter_skip_columns(["cat", "doc"])
    t.merge(_rows(spark), 0)
    return t


def _norm(paths):
    return {os.path.basename(p) for p in paths}


def _admitted(t, snap, col, val):
    return _norm(
        os.path.join(t.root, f["path"]) for f in t.prune_files(snap, [(col, "=", val)])
    )


def test_manifest_entries_carry_equality_index(indexed):
    snap = indexed.snapshot()
    assert snap["skip_fids"], "alter_skip_columns committed"
    for f in snap["files"]:
        # cat: 6 distinct values per file -> exact set
        assert "cat" in f.get("cset", {}), f
        assert set(f["cset"]["cat"]) <= {f"c{i}" for i in range(6)}
        # doc: one value per row (300/file) -> bloom, not a set
        assert "doc" in f.get("cbloom", {}), f
        assert "doc" not in f.get("cset", {})
        # the unindexed column carries neither
        assert "score" not in f.get("cset", {}) and "score" not in f.get("cbloom", {})


def test_bloom_prunes_unclustered_equality(indexed):
    """The layout is hash-bucketed on user_id — doc min/max bounds span
    the whole domain, so ONLY the bloom can prune here."""
    snap = indexed.snapshot()
    total = len(snap["files"])
    assert total == 8
    df = indexed.read_where([("doc", "=", "doc-57")])
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["user_id"] == 57
    opened = _norm(df.inputFiles())
    admitted = _admitted(indexed, snap, "doc", "doc-57")
    assert opened == admitted, "files opened == files the index admits"
    # the true file plus at most ~fpp stragglers — far below all 8
    assert 1 <= len(admitted) <= 3


def test_absent_values_prune_everything(indexed):
    snap = indexed.snapshot()
    # exact set: provably absent categorical value opens ZERO files
    assert indexed.prune_files(snap, [("cat", "=", "zzz")]) == []
    assert indexed.read_where([("cat", "=", "zzz")]).count() == 0
    # bloom: an absent high-card value opens at most fpp stragglers
    assert len(indexed.prune_files(snap, [("doc", "=", "doc-999999")])) <= 2
    assert indexed.read_where([("doc", "=", "doc-999999")]).count() == 0
    # present categorical value: every file holds all 6 cats -> no
    # pruning, and the result is the full slice
    assert indexed.read_where([("cat", "=", "c3")]).count() == N // 6


def test_index_survives_rename(spark, indexed):
    """Old files store the index under the physical name they were
    written with; a predicate on the renamed column must resolve
    through the field id and still prune them."""
    indexed.rename_column("doc", "document")
    indexed.merge(_rows(spark, n=300, tag="B").withColumnRenamed("doc", "document"), 1)
    snap = indexed.snapshot()
    # new-epoch files index under the new name
    new_epoch = [f for f in snap["files"] if f.get("epoch", 0) > 0]
    assert new_epoch and all("document" in f.get("cbloom", {}) for f in new_epoch)
    # a probe by the CURRENT name prunes across both epochs
    df = indexed.read_where([("document", "=", "docB-123")])
    got = df.collect()
    assert len(got) == 1 and got[0]["user_id"] == 123
    assert len(_admitted(indexed, snap, "document", "docB-123")) <= 3
    # old-epoch value still found (it lives under physical 'doc')
    assert indexed.read_where([("document", "=", "doc-2000")]).count() == 1


def test_mor_delta_buckets_exempt(spark, indexed):
    indexed.merge(_rows(spark, n=100, tag="M"), 2, mode="mor")
    snap = indexed.snapshot()
    delta_buckets = {
        f["bucket"] for f in snap["files"] if f.get("kind", "base") == "delta"
    }
    kept = indexed.prune_files(snap, [("doc", "=", "no-such-doc")])
    # every delta bucket's files survive wholesale; base-only buckets
    # prune to nothing for an absent value (mod bloom fpp)
    assert {f["bucket"] for f in kept} >= delta_buckets
    # outside the exempt buckets, an absent value keeps at most bloom-fpp stragglers
    assert len([f for f in kept if f["bucket"] not in delta_buckets]) <= 2
    assert indexed.read_where([("doc", "=", "no-such-doc")]).count() == 0


def test_alter_validation(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "tv"), SCHEMA, ["user_id"], n_buckets=4)
    with pytest.raises(ValueError):
        t.alter_skip_columns(["score"])  # float: not equality-indexable
    with pytest.raises(ValueError):
        t.alter_skip_columns(["nope"])
    v = t.alter_skip_columns(["cat"])
    assert t.snapshot()["version"] == v and t.snapshot()["skip_fids"]
    # opting out stops indexing new files
    t.alter_skip_columns([])
    t.merge(_rows(spark, n=64), 0)
    assert all("cset" not in f and "cbloom" not in f for f in t.snapshot()["files"])


def test_sidecar_blooms_and_gc(spark, tmp_path):
    """Files with high per-file ndv get NDV-SIZED blooms written as
    content-addressed sidecars under _meta/index/ (the Puffin-file
    analogue) — the fixed-inline design would saturate exactly where
    skipping matters most. Sidecars referenced only by expired
    snapshots are GC'd; retained ones survive and keep pruning."""
    t = LakeTable.create(spark, str(tmp_path / "ts"), SCHEMA, ["user_id"], n_buckets=4)
    t.alter_skip_columns(["doc"])
    t.merge(_rows(spark, n=20_000), 0)  # ~5000 ndv/file >> inline cap
    snap = t.snapshot()
    refs = [f["cbloom"]["doc"] for f in snap["files"]]
    assert refs and all(r.startswith("idx:") for r in refs)
    for r in refs:
        p = os.path.join(t.root, r[4:])
        assert os.path.exists(p) and os.path.getsize(p) >= 4096
    # pruning works through the sidecar: one true file (+fpp)
    admitted = t.prune_files(snap, [("doc", "=", "doc-12345")])
    assert 1 <= len(admitted) <= 2
    assert t.read_where([("doc", "=", "doc-12345")]).count() == 1
    assert len(t.prune_files(snap, [("doc", "=", "doc-999999")])) <= 1

    # rewrite every bucket (all files replaced -> new sidecars), then
    # expire: the old snapshot's sidecars are unreferenced and must go,
    # the live ones must survive
    t.merge(_rows(spark, n=20_000, tag="X"), 1)
    t.expire_snapshots(keep_last=1, orphan_grace_sec=0)
    live_refs = {
        f["cbloom"]["doc"][4:] for f in t.snapshot()["files"]
    }
    on_disk = {
        os.path.join("_meta", "index", n)
        for n in os.listdir(os.path.join(t.root, "_meta", "index"))
    }
    assert on_disk == live_refs, "sidecar GC: exactly the live refs remain"
    # and the live index still prunes after GC
    assert t.read_where([("doc", "=", "docX-777")]).count() == 1
