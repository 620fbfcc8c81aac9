"""Storage-partitioned join (streaming/source.py LakeTableJoinSource,
LakeTable.join_bucketed — the Iceberg SPJ analogue): join-type parity
with Spark's own join over resolved reads, compatible bucket counts
(equal and divisible — rebucket interop), MOR/DV lifecycles on either
side, rename-epoch interop, manifest pruning through leftWhere/
rightWhere, time-travel pins, plan purity (a scan, not a join — zero
Exchange), and plan-time rejection of anything that would break
co-location (non-divisible counts, uncovered bucket keys, type
mismatches).
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from w3_data_etl_pipeline_spark.plans.laketable import LakeTable  # noqa: E402

LS = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)
RS = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_mktsegment", T.StringType()),
        T.StructField("c_acctbal", T.DoubleType()),
    ]
)


def _left_ev(spark, lo, hi, lsn=1):
    return spark.range(lo, hi).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("t"), (F.col("id") % 3).cast("string")).alias("event_type"),
        (F.col("id") % 97).cast("double").alias("value"),
        (F.col("id") + lsn * 1000000).alias("lsn"),
        F.lit("U").alias("op"),
    )


def _right_ev(spark, lo, hi, lsn=1):
    return spark.range(lo, hi).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("seg"), (F.col("id") % 5).cast("string")).alias("c_mktsegment"),
        (F.col("id") * 1.5).alias("c_acctbal"),
        (F.col("id") + lsn * 1000000).alias("lsn"),
        F.lit("U").alias("op"),
    )


def _pair(spark, tmp_path, bl=16, br=8):
    lt = LakeTable.create(spark, str(tmp_path / "l"), LS, ["user_id"], n_buckets=bl)
    rt = LakeTable.create(spark, str(tmp_path / "r"), RS, ["c_custkey"], n_buckets=br)
    lt.merge(_left_ev(spark, 0, 300), 0)
    rt.merge(_right_ev(spark, 100, 500), 0)
    return lt, rt


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _spark_twin(lt, rt, how):
    lr, rr = lt.read(), rt.read()
    if how in ("semi", "anti"):
        return lr.join(rr, lr.user_id == rr.c_custkey, "left_" + how).select(
            "user_id", "event_type", "value"
        )
    key = (
        F.coalesce(lr.user_id, rr.c_custkey)
        if how in ("full", "right")
        else lr.user_id
    )
    return lr.join(
        rr, lr.user_id == rr.c_custkey, "full" if how == "full" else how
    ).select(
        key.alias("user_id"), "event_type", "value", "c_mktsegment", "c_acctbal"
    )


@pytest.mark.parametrize("how", ["inner", "left", "right", "full", "semi", "anti"])
def test_join_type_parity_divisible_counts(spark, tmp_path, how):
    lt, rt = _pair(spark, tmp_path, bl=16, br=8)
    got = lt.join_bucketed(rt, on=[("user_id", "c_custkey")], how=how)
    assert _rows(got) == _rows(_spark_twin(lt, rt, how))


def test_equal_counts_with_mor_and_dv(spark, tmp_path):
    lt, rt = _pair(spark, tmp_path, bl=8, br=8)
    # perturb both sides: MOR deltas, a DV delete, an update
    lt.merge(_left_ev(spark, 50, 120, lsn=2), 1, mode="mor")
    lt.delete_where("user_id >= 280", mode="dv")
    rt.update_where("c_custkey < 110", {"c_acctbal": "c_acctbal + 1000"}, mode="mor")
    got = lt.join_bucketed(rt, on=[("user_id", "c_custkey")], how="inner")
    assert _rows(got) == _rows(_spark_twin(lt, rt, "inner"))


def test_fine_side_left_or_right(spark, tmp_path):
    # divisibility works in both directions
    lt, rt = _pair(spark, tmp_path, bl=4, br=16)
    got = lt.join_bucketed(rt, on=[("user_id", "c_custkey")], how="full")
    assert _rows(got) == _rows(_spark_twin(lt, rt, "full"))


def test_where_prunes_and_stays_exact(spark, tmp_path):
    lt, rt = _pair(spark, tmp_path)
    got = lt.join_bucketed(
        rt,
        on=[("user_id", "c_custkey")],
        where="value >= 50.0",
        other_where="c_mktsegment = 'seg2'",
    )
    want = (
        lt.read()
        .filter("value >= 50.0")
        .join(
            rt.read().filter("c_mktsegment = 'seg2'"),
            F.col("user_id") == F.col("c_custkey"),
        )
        .select("user_id", "event_type", "value", "c_mktsegment", "c_acctbal")
    )
    assert _rows(got) == _rows(want) and got.count() > 0


def test_where_can_skip_every_bucket_group(spark, tmp_path):
    # bounds exclude every left file -> every partition group skipped,
    # empty result, and NO executor work is even planned
    lt, rt = _pair(spark, tmp_path)
    got = lt.join_bucketed(rt, on=[("user_id", "c_custkey")], where="user_id < 0")
    assert got.count() == 0


def test_time_travel_pin(spark, tmp_path):
    lt, rt = _pair(spark, tmp_path)
    v1 = lt.current_version()
    lt.merge(_left_ev(spark, 300, 400, lsn=3), 1)  # must be invisible at v1
    got = lt.join_bucketed(rt, on=[("user_id", "c_custkey")], version=v1)
    assert max(r["user_id"] for r in got.collect()) < 300


def test_rename_epoch_interop(spark, tmp_path):
    lt, rt = _pair(spark, tmp_path)
    rt.rename_column("c_acctbal", "balance")
    rt.merge(
        _right_ev(spark, 450, 520, lsn=2).withColumnRenamed("c_acctbal", "balance"),
        1,
        mode="mor",
    )
    got = lt.join_bucketed(rt, on=[("user_id", "c_custkey")], how="inner")
    assert "balance" in got.columns and "c_acctbal" not in got.columns
    lr, rr = lt.read(), rt.read()
    want = lr.join(rr, lr.user_id == rr.c_custkey).select(
        "user_id", "event_type", "value", "c_mktsegment", "balance"
    )
    assert _rows(got) == _rows(want)


def test_plan_is_a_pure_scan(spark, tmp_path):
    lt, rt = _pair(spark, tmp_path)
    df = lt.join_bucketed(rt, on=[("user_id", "c_custkey")])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    for node in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert node not in plan, plan


def test_rejects_non_divisible_counts(spark, tmp_path):
    lt, rt = _pair(spark, tmp_path, bl=16, br=12)
    with pytest.raises(Exception, match="incompatible bucket counts"):
        lt.join_bucketed(rt, on=[("user_id", "c_custkey")]).collect()


def test_rejects_uncovered_bucket_key(spark, tmp_path):
    lt, rt = _pair(spark, tmp_path)
    with pytest.raises(Exception, match="pair bucket keys"):
        lt.join_bucketed(rt, on=[("value", "c_acctbal")]).collect()


def test_rejects_type_mismatch(spark, tmp_path):
    lt, rt = _pair(spark, tmp_path)
    with pytest.raises(Exception, match="type mismatch"):
        lt.join_bucketed(rt, on=[("user_id", "c_custkey"), ("value", "c_mktsegment")]).collect()


def test_default_on_pairs_bucket_keys(spark, tmp_path):
    lt, rt = _pair(spark, tmp_path)
    got = lt.join_bucketed(rt)  # defaults to positional key pairing
    assert _rows(got) == _rows(_spark_twin(lt, rt, "inner"))


def test_select_projection_pushdown(spark, tmp_path):
    lt, rt = _pair(spark, tmp_path)
    got = lt.join_bucketed(
        rt, on=[("user_id", "c_custkey")], select=["user_id", "c_acctbal"]
    )
    assert got.columns == ["user_id", "c_acctbal"]
    want = (
        lt.read()
        .join(rt.read(), F.col("user_id") == F.col("c_custkey"))
        .select("user_id", "c_acctbal")
    )
    assert _rows(got) == _rows(want)


def test_select_with_full_join_coalesced_key(spark, tmp_path):
    lt, rt = _pair(spark, tmp_path)
    got = lt.join_bucketed(
        rt, on=[("user_id", "c_custkey")], how="full",
        select=["user_id", "c_mktsegment"],
    )
    lr, rr = lt.read(), rt.read()
    want = lr.join(rr, lr.user_id == rr.c_custkey, "full").select(
        F.coalesce(lr.user_id, rr.c_custkey).alias("user_id"), "c_mktsegment"
    )
    assert _rows(got) == _rows(want)


def test_select_rejects_unknown_column(spark, tmp_path):
    lt, rt = _pair(spark, tmp_path)
    with pytest.raises(Exception, match="unknown columns"):
        lt.join_bucketed(rt, select=["nope"]).collect()


def test_select_composes_with_where(spark, tmp_path):
    # the where column (value) is NOT in the projection: the pruned
    # parquet read must still decode it for the filter
    lt, rt = _pair(spark, tmp_path)
    got = lt.join_bucketed(
        rt, on=[("user_id", "c_custkey")], where="value >= 50.0",
        select=["user_id", "c_acctbal"],
    )
    want = (
        lt.read()
        .filter("value >= 50.0")
        .join(rt.read(), F.col("user_id") == F.col("c_custkey"))
        .select("user_id", "c_acctbal")
    )
    assert _rows(got) == _rows(want) and got.count() > 0


def test_explain_join_dry_run(spark, tmp_path):
    lt, rt = _pair(spark, tmp_path)
    rep = lt.explain_join(rt)
    assert rep["groups_run"] == 8 and rep["groups_skipped"] == 0
    assert rep["left"]["files_admitted"] == rep["left"]["files_total"] > 0
    # a predicate excluding every left file skips every inner group
    rep2 = lt.explain_join(rt, where="user_id < 0")
    assert rep2["groups_run"] == 0 and rep2["left"]["files_admitted"] == 0
    # ...but a right join still runs wherever the right side has files
    rep3 = lt.explain_join(rt, how="right", where="user_id < 0")
    assert rep3["groups_run"] == 8
    # and the report matches what execution actually does
    assert lt.join_bucketed(rt, on=[("user_id", "c_custkey")], where="user_id < 0").count() == 0
