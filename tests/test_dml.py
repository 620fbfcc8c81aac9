"""Row-level predicate DML (delete_where / update_where — the
Iceberg/Delta DELETE FROM / UPDATE analogue): SQL three-valued match
semantics (NULL predicate keeps the row), bucket-granular rewrite
cost (untouched buckets' files carried byte-identical by reference),
MOR resolution before the rewrite, pre-update RHS evaluation, schema
stability through type casts, protected key/LSN columns, no-op early
exit without an empty commit, and the dml audit record scoped to its
own snapshot only."""

from __future__ import annotations

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


def _events(spark, n=2400, keys=320):
    return spark.range(1, n + 1).select(
        (F.col("id") % keys).alias("user_id"),
        F.concat(F.lit("t"), (F.col("id") % 5).cast("string")).alias("event_type"),
        F.when(
            F.col("id") % 7 == 0, F.lit(None).cast("double")
        ).otherwise(F.pmod(F.xxhash64("id"), F.lit(10000)) / F.lit(10.0)).alias("value"),
        F.col("id").alias("lsn"),
        F.lit("U").alias("op"),
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["user_id"], n_buckets=8)
    t.merge(_events(spark), 0)
    t.compact(cluster_by=["value"], max_records_per_file=16)
    return t


def _norm(files):
    return {os.path.basename(f["path"]) for f in files}


def test_delete_matches_filter_semantics(table):
    before = {r["user_id"]: r for r in table.read().collect()}
    n_true = table.read().filter(F.col("value") >= 800.0).count()
    res = table.delete_where("value >= 800.0")
    assert res["applied"] and res["rows_changed"] == n_true
    after = table.read().collect()
    # TRUE rows gone; FALSE and NULL-predicate rows all kept
    assert len(after) == len(before) - n_true
    for r in after:
        assert r["value"] is None or r["value"] < 800.0
        assert before[r["user_id"]] == r  # survivors byte-identical


def test_delete_is_bucket_granular(table):
    snap0 = table.snapshot()
    res = table.delete_where("value BETWEEN 400.0 AND 410.0")
    assert res["applied"] and 0 < res["buckets_rewritten"] <= 8
    snap1 = table.snapshot()
    rewritten = {
        f["bucket"] for f in snap1["files"] if f["path"] not in
        {g["path"] for g in snap0["files"]}
    }
    assert len(rewritten) == res["buckets_rewritten"]
    # every untouched bucket's files carried by reference (same paths)
    untouched0 = _norm(f for f in snap0["files"] if f["bucket"] not in rewritten)
    untouched1 = _norm(f for f in snap1["files"] if f["bucket"] not in rewritten)
    assert untouched0 == untouched1
    assert res["files_skipped"] == len(untouched0)


def test_delete_no_match_commits_nothing(table):
    v0 = table.current_version()
    # file-skip path: bounds exclude every file outright
    res = table.delete_where("value > 99999.0")
    assert not res["applied"] and res["rows_changed"] == 0
    # row path: bounds admit files, but zero rows actually match
    res2 = table.delete_where("value = 123.456")
    assert not res2["applied"] and res2["rows_changed"] == 0
    assert table.current_version() == v0


def test_update_pre_image_rhs_and_types(table):
    before = {r["user_id"]: r for r in table.read().collect()}
    s0 = table.schema()
    res = table.update_where(
        "value >= 500.0",
        {"value": "value / 2", "event_type": "concat(event_type, '-capped')"},
    )
    assert res["applied"]
    assert table.schema() == s0  # casts keep the declared schema
    after = {r["user_id"]: r for r in table.read().collect()}
    assert len(after) == len(before)
    changed = 0
    for uid, r in after.items():
        b = before[uid]
        if b["value"] is not None and b["value"] >= 500.0:
            # RHS saw the PRE-update value: value/2 of the original,
            # and the event_type RHS saw the original event_type
            assert r["value"] == b["value"] / 2
            assert r["event_type"] == b["event_type"] + "-capped"
            changed += 1
        else:
            assert r == b
    assert changed == res["rows_changed"] > 0


def test_update_rejects_key_lsn_and_unknown_columns(table):
    with pytest.raises(ValueError, match="key/system"):
        table.update_where("value > 0", {"user_id": "user_id + 1"})
    with pytest.raises(ValueError, match="key/system"):
        table.update_where("value > 0", {"_lsn": "0"})
    with pytest.raises(ValueError, match="unknown column"):
        table.update_where("value > 0", {"nope": "1"})
    with pytest.raises(ValueError, match="at least one"):
        table.update_where("value > 0", {})


def test_delete_resolves_mor_deltas_first(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "m"), SCHEMA, ["user_id"], n_buckets=4)
    t.merge(_events(spark, n=800, keys=100), 0, mode="mor")
    # a second MOR batch moves some keys OUT of the delete range: the
    # delete must act on the RESOLVED state, not any single file
    fix = spark.range(0, 50).select(
        F.col("id").alias("user_id"),
        F.lit("fixed").alias("event_type"),
        F.lit(10.0).alias("value"),
        (F.col("id") + 100000).alias("lsn"),
        F.lit("U").alias("op"),
    )
    t.merge(fix, 1, mode="mor")
    resolved = t.read().collect()  # LWW state after both batches
    oracle = {
        r["user_id"]
        for r in resolved
        if not (r["value"] is not None and r["value"] >= 100.0)
    }
    n_match = len(resolved) - len(oracle)
    res = t.delete_where("value >= 100.0")
    assert res["rows_changed"] == n_match > 0
    got = {r["user_id"] for r in t.read().collect()}
    assert got == oracle
    # the fixed keys (LSN 100000+, value 10.0) survived: the delete
    # acted on the resolved state, not on any stale base/delta row
    assert set(range(0, 50)) <= got
    # the rewrite folded the touched buckets to base files: a bucket
    # may still hold deltas only if the delete never touched it
    snap = t.snapshot()
    delta_buckets = {
        f["bucket"] for f in snap["files"] if f.get("kind", "base") == "delta"
    }
    assert len(delta_buckets) <= 4 - res["buckets_rewritten"]


def test_dml_audit_record_scoped_to_its_snapshot(table):
    res = table.update_where("value < 10.0", {"value": "0.0"})
    snap = table.snapshot(res["version"])
    assert snap["operation"] == "update"
    assert snap["dml"]["rows_changed"] == res["rows_changed"]
    assert snap["dml"]["set"] == {"value": "0.0"}
    # the next non-DML commit must NOT inherit the audit record
    table.compact()
    nxt = table.snapshot()
    assert nxt["operation"] == "compact" and "dml" not in nxt


def test_dml_on_branch_leaves_main_frozen(table):
    v0 = table.create_branch("fix")
    br = table.branch("fix")
    res = br.delete_where("value >= 900.0")
    assert res["applied"]
    assert table.current_version() == v0  # main frozen
    assert br.read().filter(F.col("value") >= 900.0).count() == 0
    assert table.read().filter(F.col("value") >= 900.0).count() > 0
    st = table.fast_forward("fix")
    assert st.applied
    assert table.read().filter(F.col("value") >= 900.0).count() == 0
    table.drop_branch("fix")


def test_tuple_predicates_accepted(table):
    cond = (F.col("event_type") == "t1") & (F.col("value") >= 950.0)
    n_before = table.read().filter(cond).count()
    res = table.delete_where([("event_type", "=", "t1"), ("value", ">=", 950.0)])
    assert res["rows_changed"] == n_before > 0
    assert table.read().filter(cond).count() == 0
