"""Positional deletion vectors (delete_where mode='dv') — the Iceberg
v3 deletion-vector / Delta DV analogue: a delete appends bucket-scoped
(file key, row position) masks instead of rewriting buckets (COW) or
appending per-key tombstones (equality MOR). Pins the three claims the
feature stands on:

1. SEMANTIC EQUALITY — visible state after a dv delete is identical to
   the COW twin's, through every read path (read / read_where /
   read_keys / read_semi / read_in / changes / time travel), under
   pending MOR deltas, and across compaction and rollback.
2. NO RESURRECTION — a dv delete masks EVERY physical version of a
   matched key (base + MOR images); masking only the resolved winner
   would let the previous version win the max-LSN window.
3. SHUFFLE-FREE READS — on a COW table a dv-masked full scan plans a
   broadcast ANTI-join only: no shuffle exchange, unlike equality-MOR
   deletes whose resolution costs a key-hash exchange. This is the
   measured bound that justifies the third mode (see
   BENCH/profile_dv.py).

Reference scope note: the reference pipeline has no row-level DML at
all (its only subtractive path is the weekly drop-and-rebuild,
/root/reference/src/dags/w3c.py:249-396); this is lake-format surface
the Spark-first design adds.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from w3_data_etl_pipeline_spark.plans.laketable import LakeTable

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


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_dv_delete_appends_masks_and_matches_cow(spark, tmp_path, table):
    cow = LakeTable.create(spark, str(tmp_path / "cow"), SCHEMA, ["user_id"], n_buckets=8)
    cow.merge(_events(spark), 0)
    cow.delete_where("value >= 600.0")

    snap0 = table.snapshot()
    n_true = table.read().filter(F.col("value") >= 600.0).count()
    res = table.delete_where("value >= 600.0", mode="dv")
    assert res["applied"] and res["buckets_rewritten"] == 0
    assert res["dv_files"] >= 1
    assert res["rows_changed"] == n_true
    snap1 = table.snapshot()
    # every pre-existing file carried by reference; only dv masks added
    assert _paths(snap0) <= _paths(snap1)
    added = [f for f in snap1["files"] if f["path"] not in _paths(snap0)]
    assert added and all(f["kind"] == "dv" for f in added)
    assert _rows(table.read()) == _rows(cow.read())
    assert table.read().filter(F.col("value") >= 600.0).count() == 0


def test_dv_read_plans_no_shuffle_on_cow_table(table):
    table.delete_where("value >= 600.0", mode="dv")
    plan = table.read()._jdf.queryExecution().executedPlan().toString()
    # the mask is a broadcast anti-join; a shuffle would appear as an
    # Exchange hashpartitioning (BroadcastExchange is not a shuffle)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan


def test_dv_masks_every_physical_version_no_resurrection(spark, table):
    # leave MOR images of keys 0..49 pending (higher LSN, value +10000)
    upd = _events(spark, n=400, keys=50, lsn0=10_000).withColumn(
        "value", F.col("value") + 10000.0
    )
    table.merge(upd, 1, mode="mor")
    before = table.read()
    hit_keys = {
        r["user_id"]
        for r in before.filter(F.col("value") >= 10000.0).select("user_id").collect()
    }
    assert hit_keys  # the predicate matches only resolved (delta) winners
    res = table.delete_where("value >= 10000.0", mode="dv")
    assert res["applied"]
    # neither the delta winner NOR the masked base version may survive
    left = {r["user_id"] for r in table.read().select("user_id").collect()}
    assert not (left & hit_keys)
    # and the fold keeps it gone
    table.compact()
    left2 = {r["user_id"] for r in table.read().select("user_id").collect()}
    assert not (left2 & hit_keys)
    assert table.verify(deep=True)["ok"]


def test_dv_matches_resolved_not_stored_values(spark, table):
    # key 7's stored base row would match, but a pending MOR image
    # changed its value out of range: SQL DELETE judges the RESOLVED
    # row, so key 7 must survive
    upd = spark.createDataFrame(
        [(7, "tX", -1.0, 99_999, "U")],
        "user_id long, event_type string, value double, lsn long, op string",
    )
    table.merge(upd, 1, mode="mor")
    res = table.delete_where("value >= 0.0", mode="dv")
    left = {r["user_id"] for r in table.read().select("user_id").collect()}
    assert left == {7}
    assert res["rows_changed"] == 199


def test_reinsert_after_dv_delete_wins(spark, table):
    table.delete_where("user_id = 13", mode="dv")
    assert table.read_keys([(13,)]).count() == 0
    re = spark.createDataFrame(
        [(13, "tR", 5.0, 1_000_000, "I")],
        "user_id long, event_type string, value double, lsn long, op string",
    )
    table.merge(re, 2, mode="mor")
    got = table.read_keys([(13,)]).collect()
    assert len(got) == 1 and got[0]["event_type"] == "tR"


def test_dv_pruned_readers_agree_with_full_read(spark, table):
    table.delete_where("value >= 600.0", mode="dv")
    full = table.read()
    assert _rows(table.read_where("value < 100.0")) == _rows(
        full.filter(F.col("value") < 100.0)
    )
    keys = spark.createDataFrame([(3,), (13,), (77,)], "user_id long")
    assert _rows(table.read_semi(keys)) == _rows(
        full.join(keys, "user_id", "left_semi")
    )
    vals = spark.createDataFrame([("t1",), ("t4",)], "event_type string")
    cols = ["user_id", "event_type", "value"]
    assert _rows(table.read_in("event_type", vals).select(*cols)) == _rows(
        full.join(vals, "event_type", "left_semi").select(*cols)
    )


def test_dv_change_feed_and_time_travel_and_rollback(spark, table):
    v1 = table.current_version()
    before = _rows(table.read())
    res = table.delete_where("value >= 600.0", mode="dv")
    ch = table.changes(v1, res["version"])
    by_type = {
        r["_change_type"]: r["n"]
        for r in ch.groupBy("_change_type").agg(F.count("*").alias("n")).collect()
    }
    assert by_type == {"delete": res["rows_changed"]}
    # time travel reads THROUGH the dv boundary
    assert _rows(table.read(version=v1)) == before
    # rollback past the dv restores the rows and drops the masks
    table.rollback(v1)
    assert _rows(table.read()) == before
    assert table.stats()["dv_files"] == 0


def test_compact_folds_dv_and_stats_account_for_it(table):
    res = table.delete_where("value >= 600.0", mode="dv")
    st = table.stats()
    assert st["dv_files"] == res["dv_files"]
    assert st["dv_rows"] == res["rows_changed"]
    assert st["rows_exact"] is False  # masked rows aren't subtracted
    before = _rows(table.read())
    table.compact()
    st2 = table.stats()
    assert st2["dv_files"] == 0 and st2["dv_rows"] == 0 and st2["rows_exact"]
    assert st2["rows"] == len(before)
    assert _rows(table.read()) == before


def test_dv_counts_toward_compaction_triggers(table):
    table.delete_where("user_id = 13", mode="dv")
    snap = table.snapshot()
    dv_bucket = next(
        f["bucket"] for f in snap["files"] if f.get("kind") == "dv" and f["rows"]
    )
    v = table.compact(min_deltas=1)
    assert v > snap["version"]
    left = {
        f["bucket"] for f in table.snapshot()["files"] if f.get("kind") == "dv"
    }
    assert dv_bucket not in left


def test_dv_preserves_inherited_row_lineage_ids(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "lin"), SCHEMA, ["user_id"], n_buckets=4,
        row_lineage=True,
    )
    t.merge(_events(spark, n=400, keys=80), 0)
    ids0 = {
        r["user_id"]: r["_row_id"]
        for r in t.read(include_lineage=True).select("user_id", "_row_id").collect()
    }
    v0 = t.current_version()
    res = t.delete_where("value >= 600.0", mode="dv")
    after = t.read(include_lineage=True).select("user_id", "_row_id").collect()
    # survivors keep their permanent ids (masking preserves positions,
    # so first_row_id + position inheritance is undisturbed)
    assert {r["user_id"]: r["_row_id"] for r in after} == {
        k: v for k, v in ids0.items()
        if k in {r["user_id"] for r in after}
    }
    # the change feed carries the retired ids on the deletes
    ch = t.changes(v0, res["version"], include_row_ids=True)
    retired = {r["_row_id"] for r in ch.filter(F.col("_change_type") == "delete").collect()}
    assert retired == {v for k, v in ids0.items() if k not in {r["user_id"] for r in after}}


def test_dv_mode_rejects_update(table):
    with pytest.raises(ValueError, match="delete_where only"):
        table.update_where("value >= 600.0", {"event_type": "'x'"}, mode="dv")


def test_fsck_catches_dangling_dv_refs(spark, table):
    table.delete_where("value >= 600.0", mode="dv")
    assert table.verify(deep=True)["ok"]
    # tamper one dv file: point a mask at a position past its target
    # file's row count, fix the manifest size so shallow still passes
    snap = table.snapshot()
    dv = next(f for f in snap["files"] if f.get("kind") == "dv" and f["rows"])
    import pyarrow.parquet as pq
    import pyarrow as pa

    full = os.path.join(table.root, dv["path"])
    tbl = pq.read_table(full)
    fkeys = tbl.column("_dv_fkey").to_pylist()
    poss = tbl.column("_dv_pos").to_pylist()
    poss[0] = 10_000_000  # out of any file's bounds
    pq.write_table(
        pa.table({"_dv_fkey": fkeys, "_dv_pos": poss}), full, compression="zstd"
    )
    crc = os.path.join(
        os.path.dirname(full), "." + os.path.basename(full) + ".crc"
    )
    if os.path.exists(crc):  # stale hadoop checksum sidecar
        os.remove(crc)
    # patch the manifest's recorded size (fresh handle: manifest cache)
    for rel in snap["manifests"].values():
        mp = os.path.join(table.root, rel)
        with open(mp) as f:
            entries = json.load(f)
        if any(e["path"] == dv["path"] for e in entries):
            for e in entries:
                if e["path"] == dv["path"]:
                    e["bytes"] = os.path.getsize(full)
            with open(mp, "w") as f:
                json.dump(entries, f)
    t2 = LakeTable(spark, table.root)
    rep = t2.verify(deep=True)
    assert not rep["ok"]
    assert rep["deep"]["dv_dangling_refs"]
    assert rep["deep"]["dv_dangling_refs"][0]["count"] == 1


def test_maintain_cli_dv_verb(table):
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [
            sys.executable, "jobs/maintain.py", "--table", table.root,
            "delete", "--predicate", "value >= 600.0", "--dv",
        ],
        capture_output=True, text=True, cwd=root,
        env={**os.environ, "PYTHONPATH": root},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads([ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1])
    assert out["applied"] and out["dv_files"] >= 1
    assert table.read().filter(F.col("value") >= 600.0).count() == 0
