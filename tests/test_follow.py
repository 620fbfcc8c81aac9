"""Table-to-table incremental pipelines (streaming/follow.py): the
downstream LakeTable's own exactly-once ledger is the offset store —
resume, idempotence, delete propagation, transforms, multi-hop, and
upstream-rollback retraction all ride the existing merge machinery."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from w3_data_etl_pipeline_spark.plans.laketable import LakeTable
from w3_data_etl_pipeline_spark.streaming.follow import (
    applied_source_version,
    follow_changes,
    sync_changes,
)

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _batch(spark, lo, hi, lsn0=0, delete_every=11):
    return spark.range(lo, hi).select(
        (F.col("id") % 97).alias("user_id"),
        F.concat(F.lit("k"), (F.col("id") % 3).cast("string")).alias("kind"),
        (F.col("id") * 0.5).alias("value"),
        (F.col("id") + lsn0).alias("lsn"),
        F.when(F.col("id") % delete_every == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )


@pytest.fixture()
def src(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA, ["user_id"], n_buckets=8)
    t.merge(_batch(spark, 1, 150), 0)
    t.merge(_batch(spark, 150, 260, lsn0=1000), 1)
    t.merge(_batch(spark, 260, 300, lsn0=2000), 2)
    return t


def _dst(spark, tmp_path, name="dst", schema=SCHEMA):
    return LakeTable.create(
        spark, str(tmp_path / name), schema, ["user_id"], n_buckets=8
    )


def _state(t):
    return sorted(map(tuple, t.read().select("user_id", "kind", "value").collect()))


def test_mirror_catches_up_and_is_idempotent(spark, tmp_path, src):
    dst = _dst(spark, tmp_path)
    out = sync_changes(src, dst, max_versions_per_batch=1)
    assert out["steps"] == src.current_version()
    assert _state(dst) == _state(src)
    again = sync_changes(src, dst)
    assert again["steps"] == 0
    assert applied_source_version(dst) == src.current_version()


def test_resume_from_ledger_after_partial_sync(spark, tmp_path, src):
    dst = _dst(spark, tmp_path)
    sync_changes(src, dst, max_versions_per_batch=1, until_version=1)
    assert applied_source_version(dst) == 1
    # "crash": reopen both tables from disk with fresh handles
    src2 = LakeTable(src.spark, src.root)
    dst2 = LakeTable(dst.spark, dst.root)
    out = sync_changes(src2, dst2, max_versions_per_batch=1)
    assert out["steps"] == src.current_version() - 1
    assert _state(dst2) == _state(src)


def test_wide_steps_net_intermediate_states(spark, tmp_path, src):
    dst = _dst(spark, tmp_path)
    out = sync_changes(src, dst, max_versions_per_batch=10)
    assert out["steps"] == 1
    assert _state(dst) == _state(src)


def test_transform_projection(spark, tmp_path, src):
    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("value2", T.DoubleType()),
        ]
    )
    dst = _dst(spark, tmp_path, schema=out_schema)

    def tf(df):
        return df.select(
            "user_id", (F.col("value") * 2).alias("value2"), "_change_type"
        )

    sync_changes(src, dst, transform=tf)
    want = sorted(
        (r["user_id"], r["value"] * 2)
        for r in src.read().select("user_id", "value").collect()
    )
    got = sorted(map(tuple, dst.read().select("user_id", "value2").collect()))
    assert got == want


def test_key_filter_transform(spark, tmp_path, src):
    dst = _dst(spark, tmp_path)

    def tf(df):  # key-column filter: stable per key, deletes included
        return df.filter(F.col("user_id") % 2 == 0)

    sync_changes(src, dst, transform=tf)
    want = sorted(
        t for t in _state(src) if t[0] % 2 == 0
    )
    assert _state(dst) == want


def test_transform_missing_key_raises(spark, tmp_path, src):
    dst = _dst(spark, tmp_path)
    with pytest.raises(ValueError, match="key columns"):
        sync_changes(src, dst, transform=lambda df: df.drop("user_id"))


def test_multi_hop_chain(spark, tmp_path, src):
    b = _dst(spark, tmp_path, "b")
    c = _dst(spark, tmp_path, "c")
    sync_changes(src, b)
    sync_changes(b, c)
    assert _state(c) == _state(src)
    # another upstream commit propagates through both hops
    src.merge(_batch(spark, 300, 320, lsn0=3000), 3)
    sync_changes(src, b)
    sync_changes(b, c)
    assert _state(c) == _state(src)


def test_upstream_rollback_retracts_downstream(spark, tmp_path, src):
    dst = _dst(spark, tmp_path)
    sync_changes(src, dst)
    v_good = 1
    src.rollback(v_good)  # new version whose STATE is v1's
    sync_changes(src, dst)
    assert _state(dst) == _state(src)
    assert applied_source_version(dst) == src.current_version()


def test_follow_drain_mode(spark, tmp_path, src):
    dst = _dst(spark, tmp_path)
    totals = follow_changes(src, dst, stop_when_caught_up=True)
    assert totals["applied_through"] == src.current_version()
    assert _state(dst) == _state(src)


def test_ledger_stays_folded_over_many_steps(spark, tmp_path, src):
    """Ledger ids are zero-based and cover the whole step range, so the
    contiguous prefix folds into the hwm: downstream snapshot metadata
    must stay O(1), not O(applied steps)."""
    dst = _dst(spark, tmp_path)
    sync_changes(src, dst, max_versions_per_batch=1)
    led = LakeTable._ledger_migrate(dst.snapshot()["ledger"])
    assert led["extra"] == {}, f"unfolded ledger: {led}"
    assert led["hwm"] == src.current_version() - 1
    # wide steps fold too (covered range fills the gaps)
    dst2 = _dst(spark, tmp_path, "dst2")
    sync_changes(src, dst2, max_versions_per_batch=2)
    led2 = LakeTable._ledger_migrate(dst2.snapshot()["ledger"])
    assert led2["extra"] == {} and led2["hwm"] == src.current_version() - 1
