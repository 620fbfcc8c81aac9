"""Table clone (plans/laketable.py LakeTable.clone — the Delta CLONE
analogue): shallow clones are metadata-only and isolated both ways
(source advances don't move the clone, clone writes don't move the
source), mixed external-base + local-delta buckets resolve correctly,
the clone's GC never deletes shared source files, ledger/identity
semantics carry correctly, and deep clones survive outright source
deletion.
"""

from __future__ import annotations

import os
import shutil
import sys

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from w3_data_etl_pipeline_spark.plans.laketable import LakeTable  # noqa: E402

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _ev(spark, lo, hi, et="a", lsn=1, op="U"):
    return spark.range(lo, hi).select(
        F.col("id").alias("user_id"),
        F.lit(et).alias("event_type"),
        (F.col("id") % 97).cast("double").alias("value"),
        (F.col("id") + lsn * 1000000).alias("lsn"),
        F.lit(op).alias("op"),
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _mk(spark, tmp_path, n=300):
    t = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA, ["user_id"], n_buckets=8)
    t.merge(_ev(spark, 0, n), 0)
    return t


def test_shallow_clone_reads_equal_and_is_pinned(spark, tmp_path):
    src = _mk(spark, tmp_path)
    want = _rows(src.read())
    c = src.clone(str(tmp_path / "c"))
    assert _rows(c.read()) == want
    # zero data files under the clone's root
    data_files = [
        n for _, _, ns in os.walk(str(tmp_path / "c" / "data")) for n in ns
    ]
    assert data_files == []
    # source advances; the clone must not move
    src.merge(_ev(spark, 300, 400, lsn=2), 1)
    assert _rows(c.read()) == want


def test_clone_writes_do_not_touch_source(spark, tmp_path):
    src = _mk(spark, tmp_path)
    want_src = _rows(src.read())
    c = src.clone(str(tmp_path / "c"))
    c.merge(_ev(spark, 100, 150, et="patched", lsn=5), 0)
    assert _rows(src.read()) == want_src
    got = dict((r[0], r[1]) for r in c.read().collect())
    assert got[120] == "patched" and got[20] == "a"


def test_clone_mixed_external_base_local_delta(spark, tmp_path):
    src = _mk(spark, tmp_path)
    c = src.clone(str(tmp_path / "c"))
    c.merge(_ev(spark, 50, 80, et="d", lsn=9), 0, mode="mor")
    c.delete_where("user_id >= 290", mode="dv")
    twin = {r[0]: r[1] for r in c.read().collect()}
    assert twin[60] == "d" and twin[40] == "a" and 295 not in twin
    assert c.verify()["ok"]


def test_clone_gc_never_deletes_shared_files(spark, tmp_path):
    src = _mk(spark, tmp_path)
    want = _rows(src.read())
    c = src.clone(str(tmp_path / "c"))
    # un-share by compacting, then expire everything expirable with an
    # aggressive orphan scan: the referenced source files are not ours
    c.compact()
    c.expire_snapshots(keep_last=1, scan_orphans=True, orphan_grace_sec=0)
    assert _rows(src.read()) == want
    assert _rows(c.read()) == want


def test_clone_version_pin(spark, tmp_path):
    src = _mk(spark, tmp_path)
    v1 = src.current_version()
    want_v1 = _rows(src.read())
    src.merge(_ev(spark, 300, 500, lsn=3), 1)
    c = src.clone(str(tmp_path / "c"), version=v1)
    assert _rows(c.read()) == want_v1


def test_clone_ledger_resets(spark, tmp_path):
    src = _mk(spark, tmp_path)
    c = src.clone(str(tmp_path / "c"))
    # batch 0 was applied to the SOURCE pre-clone; the clone's ledger
    # is fresh so batch 0 applies (it is a new stream by contract)
    before = c.current_version()
    c.merge(_ev(spark, 0, 10, et="re", lsn=7), 0)
    assert c.current_version() == before + 1
    # and the clone's own replay guard works
    c.merge(_ev(spark, 0, 10, et="re2", lsn=8), 0)
    assert c.current_version() == before + 1  # no-op replay


def test_clone_carries_schema_identity(spark, tmp_path):
    src = _mk(spark, tmp_path)
    src.rename_column("value", "metric")
    c = src.clone(str(tmp_path / "c"))
    # old files resolve by field id under the clone too
    assert "metric" in c.read().columns
    # and renames diverge independently after the clone
    src.rename_column("metric", "m2")
    assert "metric" in c.read().columns and "m2" in src.read().columns


def test_clone_eq_index_sidecars_still_prune(spark, tmp_path):
    src = _mk(spark, tmp_path)
    src.alter_skip_columns(["event_type"])
    src.compact()  # rewrite so entries carry the index
    c = src.clone(str(tmp_path / "c"))
    assert c.verify()["ok"]  # sidecar refs resolve
    assert _rows(c.read_where("event_type = 'a'")) == _rows(
        c.read().filter("event_type = 'a'")
    )


def test_deep_clone_survives_source_deletion(spark, tmp_path):
    src = _mk(spark, tmp_path)
    src.delete_where("user_id >= 290", mode="dv")
    want = _rows(src.read())
    c = src.clone(str(tmp_path / "c"), deep=True)
    shutil.rmtree(str(tmp_path / "src"))
    assert _rows(c.read()) == want


def test_clone_rejects_existing_destination(spark, tmp_path):
    src = _mk(spark, tmp_path)
    src.clone(str(tmp_path / "c"))
    with pytest.raises(ValueError, match="destination already exists"):
        src.clone(str(tmp_path / "c"))


def test_clone_of_clone(spark, tmp_path):
    src = _mk(spark, tmp_path)
    c1 = src.clone(str(tmp_path / "c1"))
    c1.merge(_ev(spark, 500, 520, lsn=4), 0)
    want = _rows(c1.read())
    c2 = c1.clone(str(tmp_path / "c2"), deep=True)
    shutil.rmtree(str(tmp_path / "c1"))
    shutil.rmtree(str(tmp_path / "src"))
    assert _rows(c2.read()) == want
