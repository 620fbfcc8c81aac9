"""Merge-on-read row-level DML (delete_where / update_where
mode='mor' — the Iceberg equality-delete / Delta deletion-vector
scale analogue) and the data-sequence tie-break that makes it sound:
a DML image keeps the stored row's _lsn and wins resolution ONLY
because its commit is later (SEQ_COL, derived at scan time from the
data path's commit version). Pins: no pre-existing file is rewritten
(all carried by reference), results identical to COW DML, compaction
folds images away, a strictly-later CDC upsert still wins over a MOR
delete (contract parity with COW), repeated MOR updates stack
deterministically, CDC change feed sees MOR DML commits, and CHECK
constraints veto a violating MOR update but exempt tombstones."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from w3_data_etl_pipeline_spark.plans.laketable import (
    ConstraintViolation,
    LakeTable,
)

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _events(spark, n=1600, keys=200, lsn0=0):
    return spark.range(1, n + 1).select(
        (F.col("id") % keys).alias("user_id"),
        F.concat(F.lit("t"), (F.col("id") % 5).cast("string")).alias("event_type"),
        (F.pmod(F.xxhash64("id"), F.lit(10000)) / F.lit(10.0)).alias("value"),
        (F.col("id") + lsn0).alias("lsn"),
        F.lit("U").alias("op"),
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["user_id"], n_buckets=8)
    t.merge(_events(spark), 0)
    return t


def _paths(snap):
    return {f["path"] for f in snap["files"]}


def test_mor_delete_appends_only_and_matches_cow(spark, tmp_path, table):
    # twin COW table gives the semantic oracle
    cow = LakeTable.create(spark, str(tmp_path / "cow"), SCHEMA, ["user_id"], n_buckets=8)
    cow.merge(_events(spark), 0)
    cow.delete_where("value >= 600.0")

    snap0 = table.snapshot()
    n_true = table.read().filter(F.col("value") >= 600.0).count()
    res = table.delete_where("value >= 600.0", mode="mor")
    assert res["applied"] and res["buckets_rewritten"] == 0
    assert res["delta_files"] >= 1
    assert res["rows_changed"] == n_true
    snap1 = table.snapshot()
    # every pre-existing file carried by reference; only deltas added
    assert _paths(snap0) <= _paths(snap1)
    added = [f for f in snap1["files"] if f["path"] not in _paths(snap0)]
    assert added and all(f["kind"] == "delta" for f in added)
    # identical visible state to the COW twin
    a = sorted(map(tuple, table.read().collect()))
    b = sorted(map(tuple, cow.read().collect()))
    assert a == b
    assert table.read().filter(F.col("value") >= 600.0).count() == 0


def test_mor_update_matches_cow_and_preserves_lsn_contract(spark, tmp_path, table):
    cow = LakeTable.create(spark, str(tmp_path / "cow"), SCHEMA, ["user_id"], n_buckets=8)
    cow.merge(_events(spark), 0)
    cow.update_where("value < 100.0", {"event_type": "'cold'", "value": "value + 1000.0"})

    res = table.update_where(
        "value < 100.0", {"event_type": "'cold'", "value": "value + 1000.0"},
        mode="mor",
    )
    assert res["applied"] and res["buckets_rewritten"] == 0
    a = sorted(map(tuple, table.read().collect()))
    b = sorted(map(tuple, cow.read().collect()))
    assert a == b
    # images keep the stored _lsn: metadata read shows no new LSNs
    max_lsn = table.read(include_meta=True).agg(F.max("_lsn")).first()[0]
    assert max_lsn == 1600


def test_later_upsert_beats_mor_delete_and_stale_loses(spark, table):
    # delete one key via MOR tombstone (stored lsn for user 7 is the
    # max id with id % 200 == 7 -> 1407)
    table.delete_where("user_id = 7", mode="mor")
    assert table.read().filter("user_id = 7").count() == 0
    # stale upsert (lsn below the tombstone's) must NOT resurrect
    stale = spark.createDataFrame(
        [(7, "stale", 1.0, 100, "U")], ["user_id", "event_type", "value", "lsn", "op"]
    )
    table.merge(stale, 1, mode="mor")
    assert table.read().filter("user_id = 7").count() == 0
    # strictly later upsert legally re-inserts (COW-delete contract)
    fresh = spark.createDataFrame(
        [(7, "fresh", 2.0, 99999, "U")], ["user_id", "event_type", "value", "lsn", "op"]
    )
    table.merge(fresh, 2, mode="mor")
    rows = table.read().filter("user_id = 7").collect()
    assert [(r["event_type"], r["value"]) for r in rows] == [("fresh", 2.0)]


def test_repeated_mor_updates_stack_by_sequence(table):
    # same key, same stored _lsn each time: only the data-sequence
    # number orders the three images — later commit must win
    table.update_where("user_id = 11", {"value": "1.0"}, mode="mor")
    table.update_where("user_id = 11", {"value": "value + 1.0"}, mode="mor")
    table.update_where("user_id = 11", {"value": "value * 10.0"}, mode="mor")
    assert table.read().filter("user_id = 11").first()["value"] == 20.0


def test_compact_folds_mor_dml_and_cow_merge_resolves_it(spark, table):
    table.delete_where("value >= 900.0", mode="mor")
    table.update_where("value < 50.0", {"value": "0.0"}, mode="mor")
    want = sorted(map(tuple, table.read().collect()))
    v = table.compact(min_deltas=1, min_delta_rows=1)
    snap = table.snapshot()
    assert v == snap["version"]
    assert all(f.get("kind", "base") == "base" for f in snap["files"])
    assert sorted(map(tuple, table.read().collect())) == want
    # a COW merge folding un-compacted MOR DML images resolves them
    # through the fused window's sequence tie-break too
    table.update_where("user_id = 3", {"value": "123.0"}, mode="mor")
    other = spark.createDataFrame(
        [(4, "x", 9.0, 99998, "U")], ["user_id", "event_type", "value", "lsn", "op"]
    )
    table.merge(other, 7, mode="cow")  # folds bucket holding user 4
    assert table.read().filter("user_id = 3").first()["value"] == 123.0


def test_mor_dml_visible_to_change_feed_and_time_travel(table):
    v0 = table.current_version()
    table.delete_where("user_id = 42", mode="mor")
    v1 = table.current_version()
    feed = table.changes(v0, v1)
    ct = [r["_change_type"] for r in feed.filter("user_id = 42").collect()]
    assert ct == ["delete"]
    # time travel before the DML still sees the row
    assert table.read(version=v0).filter("user_id = 42").count() == 1


def test_constraints_enforce_mor_update_but_exempt_tombstones(table):
    table.add_constraint("nonneg", "value >= 0.0")
    v0 = table.current_version()
    with pytest.raises(ConstraintViolation):
        table.update_where("user_id = 5", {"value": "-1.0"}, mode="mor")
    assert table.current_version() == v0
    # tombstones (all-NULL value columns) pass the exemption
    res = table.delete_where("user_id = 5", mode="mor")
    assert res["applied"]
    assert table.read().filter("user_id = 5").count() == 0


def test_mode_validation_and_noop(table):
    with pytest.raises(ValueError, match="mode"):
        table.delete_where("user_id = 1", mode="xyz")
    v0 = table.current_version()
    res = table.delete_where("value > 99999.0", mode="mor")
    assert not res["applied"] and table.current_version() == v0
