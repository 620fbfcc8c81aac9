"""Predicate-scoped compaction (``compact(where=...)`` — the Delta
``OPTIMIZE ... WHERE`` / Iceberg filtered rewrite_data_files
analogue): only buckets whose file bounds intersect the predicate are
rewritten, out-of-scope files are carried byte-identically, state is
value-neutral, and the scope composes with the delta-debt thresholds
and cluster_by."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from w3_data_etl_pipeline_spark.plans.laketable import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("grp", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _events(spark, n=1200, keys=300, lsn0=0):
    return spark.range(1, n + 1).select(
        (F.col("id") % keys).alias("user_id"),
        F.when(F.col("id") % keys < keys // 2, F.lit("hot"))
        .otherwise(F.lit("cold"))
        .alias("grp"),
        (F.col("id") * 1.0).alias("value"),
        (F.col("id") + lsn0).alias("lsn"),
        F.lit("U").alias("op"),
    )


def _state(t):
    return sorted(map(tuple, t.read().select("user_id", "grp", "value").collect()))


def _paths_by_bucket(t):
    out: dict[int, set] = {}
    for f in t.snapshot()["files"]:
        out.setdefault(f["bucket"], set()).add(f["path"])
    return out


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["user_id"], n_buckets=8)
    # hash bucketing spreads every key range across every bucket, so a
    # bounds-only scope would admit everything: the realistic OPTIMIZE
    # WHERE driver on this layout is the EQUALITY INDEX (exact per-file
    # key sets here, ndv <= 64), as the compact docstring directs
    t.alter_skip_columns(["user_id"])
    t.merge(_events(spark), 0)
    # MOR deltas in every bucket
    t.merge(_events(spark, n=600, keys=300, lsn0=5000), 1, mode="mor")
    return t


def test_scope_is_value_neutral_and_partial(spark, table):
    before_state = _state(table)
    before = _paths_by_bucket(table)
    table.compact(where=[("user_id", "=", 3)])
    after = _paths_by_bucket(table)
    assert _state(table) == before_state
    rewritten = {b for b in before if after.get(b) != before[b]}
    untouched = {b for b in before if after.get(b) == before[b]}
    assert rewritten and untouched, "scope must rewrite SOME buckets, not all"
    # the rewrite hit exactly key 3's bucket (exact eq sets: no FPs)
    snap = table.snapshot()
    key_bucket = (
        spark.range(3, 4)
        .select(
            F.pmod(F.xxhash64(F.col("id")), F.lit(snap["n_buckets"]))
            .cast("int")
            .alias("b")
        )
        .collect()[0]["b"]
    )
    assert rewritten == {key_bucket}
    # rewritten buckets are delta-free now, untouched ones keep deltas
    kinds = {}
    for f in snap["files"]:
        kinds.setdefault(f["bucket"], set()).add(f.get("kind", "base"))
    for b in rewritten:
        assert kinds[b] == {"base"}
    assert any("delta" in kinds[b] for b in untouched)


def test_scope_composes_with_thresholds(spark, table):
    before = _paths_by_bucket(table)
    # every bucket crosses min_deltas=1, but the scope must restrict
    table.compact(min_deltas=1, where=[("user_id", "=", 5)])
    after = _paths_by_bucket(table)
    rewritten = {b for b in before if after.get(b) != before[b]}
    assert rewritten and len(rewritten) < len(before)


def test_out_of_scope_predicate_is_a_noop(spark, table):
    v0 = table.current_version()
    assert table.compact(where=[("value", ">", 1e12)]) == v0
    assert table.compact(min_deltas=1, where=[("value", ">", 1e12)]) == v0


def test_scope_with_cluster_by_enables_skipping(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "c"), SCHEMA, ["user_id"], n_buckets=4)
    t.merge(_events(spark, n=2000, keys=500), 0)
    before_state = _state(t)
    t.compact(where="value <= 500.0", cluster_by=["value"], max_records_per_file=64)
    assert _state(t) == before_state
    ex = t.explain_skipping([("value", "<=", 100.0)])
    assert ex["files_skipped"] > 0


def test_delta_bucket_outside_scope_stays(spark, tmp_path):
    """Scoping judges delta files by their own bounds (no read-side
    exemption): a MOR delta whose values sit outside the predicate
    must NOT drag its bucket into the rewrite."""
    t = LakeTable.create(spark, str(tmp_path / "d"), SCHEMA, ["user_id"], n_buckets=4)
    t.merge(_events(spark, n=400, keys=100), 0)
    t.merge(
        spark.createDataFrame(
            [(5, "hot", 9000.0, 10000, "U")],
            "user_id long, grp string, value double, lsn long, op string",
        ),
        1,
        mode="mor",
    )
    before = _paths_by_bucket(t)
    t.compact(where=[("value", ">=", 100000.0)])  # nothing intersects
    assert _paths_by_bucket(t) == before


def test_expire_dry_run_previews_without_deleting(spark, tmp_path):
    """expire_snapshots(dry_run=True) — the VACUUM DRY RUN analogue —
    must report exactly what a real run then removes, while touching
    nothing on disk."""
    import os

    t = LakeTable.create(spark, str(tmp_path / "e"), SCHEMA, ["user_id"], n_buckets=4)
    for i in range(4):
        t.merge(_events(spark, n=200, keys=50, lsn0=i * 1000), i)

    def _tree(root):
        return sorted(
            os.path.join(dp, n)
            for dp, _d, ns in os.walk(root)
            for n in ns
        )

    before = _tree(t.root)
    preview = t.expire_snapshots(keep_last=2, orphan_grace_sec=0, dry_run=True)
    assert preview["dry_run"] is True
    assert preview["removed_snapshots"] > 0 and preview["removed_files"] > 0
    assert _tree(t.root) == before, "dry run must not touch disk"
    real = t.expire_snapshots(keep_last=2, orphan_grace_sec=0)
    for k in ("removed_snapshots", "removed_files", "removed_manifests",
              "removed_index_files"):
        assert real[k] == preview[k], f"{k}: preview {preview[k]} != real {real[k]}"
    assert _tree(t.root) != before


def test_expire_older_than_retains_recent_history(spark, tmp_path):
    """older_than_sec (Iceberg expire older_than analogue): snapshots
    committed within the window survive regardless of keep_last."""
    t = LakeTable.create(spark, str(tmp_path / "ot"), SCHEMA, ["user_id"], n_buckets=4)
    for i in range(4):
        t.merge(_events(spark, n=100, keys=30, lsn0=i * 1000), i)
    all_versions = {h["version"] for h in t.history()}
    # everything is seconds old: a 1-hour window retains every snapshot
    out = t.expire_snapshots(keep_last=1, orphan_grace_sec=0, older_than_sec=3600)
    assert out["removed_snapshots"] == 0
    assert {h["version"] for h in t.history()} == all_versions
    # a zero window degrades to pure count-based retention
    out2 = t.expire_snapshots(keep_last=2, orphan_grace_sec=0, older_than_sec=0)
    assert out2["removed_snapshots"] > 0
    assert len(t.history()) == 2
