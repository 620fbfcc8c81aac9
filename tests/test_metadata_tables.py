"""Metadata-table surface completion: ``snapshots()`` /
``manifests()`` / ``refs()`` (the Iceberg ``db.table.snapshots`` /
``.manifests`` / ``.refs`` analogues) alongside the existing
``files()`` / ``partitions()`` / ``history()`` / ``stats()``. All
O(metadata) — no data file opened."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from w3_data_etl_pipeline_spark.plans.laketable import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _batch(spark, lo, hi, lsn0=0):
    return spark.range(lo, hi).select(
        F.col("id").alias("user_id"),
        (F.col("id") * 1.5).alias("value"),
        (F.col("id") + lsn0).alias("lsn"),
        F.lit("U").alias("op"),
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["user_id"], n_buckets=8)
    t.merge(_batch(spark, 0, 400), 0)
    t.merge(_batch(spark, 100, 102, lsn0=1000), 1)  # touches ≤2 buckets
    return t


def test_snapshots_matches_history(table):
    hist = table.history()
    rows = {r["version"]: r for r in table.snapshots().collect()}
    assert set(rows) == {h["version"] for h in hist}
    for h in hist:
        r = rows[h["version"]]
        assert r["operation"] == h["operation"]
        assert r["parent"] == h["parent"]
        assert r["ledger_hwm"] == h["ledger_hwm"]


def test_manifests_sharing_flags_commit_cost(table):
    m = {r["bucket"]: r for r in table.manifests().collect()}
    snap = table.snapshot()
    assert set(m) == {int(b) for b in snap["manifests"]}
    # the second (20-key) merge touched only some buckets: the rest
    # must be pointer-shared with the parent snapshot
    shared = [b for b, r in m.items() if r["shared_with_parent"]]
    touched = [b for b, r in m.items() if not r["shared_with_parent"]]
    assert shared and touched
    # entry/row sums agree with the materialized file list
    per_bucket_rows: dict[int, int] = {}
    per_bucket_entries: dict[int, int] = {}
    for f in snap["files"]:
        per_bucket_rows[f["bucket"]] = per_bucket_rows.get(f["bucket"], 0) + (
            f.get("rows") or 0
        )
        per_bucket_entries[f["bucket"]] = per_bucket_entries.get(f["bucket"], 0) + 1
    for b, r in m.items():
        assert r["entries"] == per_bucket_entries[b]
        assert r["rows"] == per_bucket_rows[b]


def test_manifests_all_shared_on_metadata_only_commit(table):
    table.create_tag("keep")  # tags don't commit; use a rename instead
    table.rename_column("value", "metric")
    m = table.manifests().collect()
    assert all(r["shared_with_parent"] for r in m)


def test_refs_lists_main_branches_tags(table):
    table.create_tag("audit", version=1)
    table.create_branch("dev")
    refs = {(r["name"], r["type"]): r for r in table.refs().collect()}
    assert refs[("main", "branch")]["version"] == table.current_version()
    assert refs[("audit", "tag")]["version"] == 1
    dev = refs[("dev", "branch")]
    assert dev["forked_from"] == table.current_version()
    assert dev["version"] == table.branches()["dev"]["head"]


def test_refs_on_fresh_table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "f"), SCHEMA, ["user_id"])
    refs = t.refs().collect()
    assert [(r["name"], r["type"]) for r in refs] == [("main", "branch")]
