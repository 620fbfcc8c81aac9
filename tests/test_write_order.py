"""Declared table write order (alter_write_order — the Iceberg
sort-order table-metadata analogue): once set, EVERY base-file write
(COW merge, overwrite, compact, COW DML, rebucket) clusters each
bucket by the declared columns and splits it into value-contiguous
files of target_rows — so manifest min/max file skipping is a
STANDING property of the table, not a maintenance-window one that
the next microbatch destroys. Pins: the very next COW merge after
the ALTER produces a skipping layout; visible state is bit-identical
to an unordered twin; an explicit compact(cluster_by=...) still
overrides; MOR delta appends stay unsorted; clearing restores the
old layout; the property is versioned (time travel/rollback see the
order active at that snapshot); validation rejects unknown columns
and non-numeric z-order."""

from __future__ import annotations

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


def _events(spark, n=4000, keys=1000, lsn0=0):
    return spark.range(1, n + 1).select(
        (F.col("id") % keys).alias("user_id"),
        F.concat(F.lit("t"), (F.col("id") % 5).cast("string")).alias("event_type"),
        (F.pmod(F.xxhash64("id"), F.lit(10000)) / F.lit(10.0)).alias("value"),
        (F.col("id") + lsn0).alias("lsn"),
        F.lit("U").alias("op"),
    )


def _mk(spark, tmp_path, name):
    return LakeTable.create(
        spark, str(tmp_path / name), SCHEMA, ["user_id"], n_buckets=4
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_next_merge_after_alter_is_skipping_and_state_identical(spark, tmp_path):
    t = _mk(spark, tmp_path, "wo")
    twin = _mk(spark, tmp_path, "plain")
    t.alter_write_order(["value"], target_rows=60)
    assert t.write_order() == {"cols": ["value"], "zorder": False,
                               "target_rows": 60}
    ev = _events(spark)
    t.merge(ev, 0)
    twin.merge(ev, 0)
    # same visible state, different physical layout
    assert _rows(t.read()) == _rows(twin.read())
    sel = "value >= 900.0 AND value < 910.0"
    rep = t.explain_skipping(sel)
    rep_twin = twin.explain_skipping(sel)
    # ordered table: a selective value predicate skips most files;
    # the unordered twin's per-bucket files span the full range
    assert rep["files_skipped"] > 0
    assert rep["files_total"] > rep_twin["files_total"]  # split happened
    assert rep_twin["files_skipped"] == 0
    assert rep["files_kept"] / rep["files_total"] < 0.5
    assert _rows(t.read_where(sel)) == _rows(twin.read_where(sel))


def test_write_order_rides_compact_dml_and_rebucket(spark, tmp_path):
    t = _mk(spark, tmp_path, "wo2")
    t.merge(_events(spark), 0)  # unordered base first
    t.alter_write_order(["value"], target_rows=60)
    sel = "value >= 900.0 AND value < 910.0"
    assert t.explain_skipping(sel)["files_skipped"] == 0
    # a DEFAULT compact (no cluster_by) picks the declared order up
    t.compact()
    assert t.explain_skipping(sel)["files_skipped"] > 0
    before = _rows(t.read())
    # a COW DML rewrite of the touched buckets keeps the layout
    t.delete_where("value >= 990.0")
    assert t.explain_skipping(sel)["files_skipped"] > 0
    # rebucket rewrites everything — still ordered
    t.rebucket(3)
    rep = t.explain_skipping(sel)
    assert rep["files_skipped"] > 0
    assert _rows(t.read_where("value < 990.0")) == [
        r for r in before if r[2] < 990.0
    ]


def test_explicit_cluster_by_overrides_and_mor_deltas_stay_unsorted(spark, tmp_path):
    t = _mk(spark, tmp_path, "wo3")
    t.alter_write_order(["value"], target_rows=60)
    t.merge(_events(spark), 0)
    # MOR delta appends are not value-split (delta buckets are exempt
    # from predicate pruning anyway): no delta file may carry the
    # target_rows split signature of > files_per_bucket base layout
    t.merge(_events(spark, n=400, lsn0=10_000), 1, mode="mor")
    snap = t.snapshot()
    deltas = [f for f in snap["files"] if f.get("kind") == "delta"]
    assert deltas and len(deltas) <= snap["n_buckets"]
    # explicit clustered compact overrides the declared order
    t.compact(cluster_by=["user_id"], max_records_per_file=2000)
    sel = "value >= 900.0 AND value < 910.0"
    assert t.explain_skipping(sel)["files_skipped"] == 0  # user_id layout
    # ...and the NEXT plain write goes back to the declared order
    t.merge(_events(spark, n=4000, lsn0=20_000), 2)
    assert t.explain_skipping(sel)["files_skipped"] > 0


def test_clear_and_versioning(spark, tmp_path):
    t = _mk(spark, tmp_path, "wo4")
    v_unset = t.current_version()
    t.alter_write_order(["value"], target_rows=60)
    v_set = t.current_version()
    t.alter_write_order(None)
    assert t.write_order() is None
    assert t.write_order(version=v_set) == {
        "cols": ["value"], "zorder": False, "target_rows": 60
    }
    assert t.write_order(version=v_unset) is None
    t.merge(_events(spark), 0)
    # cleared: back to one unsplit file per bucket, nothing skips
    rep = t.explain_skipping("value >= 900.0 AND value < 910.0")
    assert rep["files_skipped"] == 0
    # rollback past the clear re-activates the order for new writes
    t.rollback(v_set)
    t.merge(_events(spark, lsn0=50_000), 1)
    assert t.explain_skipping("value >= 900.0 AND value < 910.0")[
        "files_skipped"
    ] > 0


def test_zorder_write_order(spark, tmp_path):
    t = _mk(spark, tmp_path, "woz")
    t.alter_write_order(["user_id", "value"], zorder=True, target_rows=60)
    t.merge(_events(spark), 0)
    # both dimensions prune on a fresh write — the z-order property
    r1 = t.explain_skipping("user_id >= 10 AND user_id < 40")
    r2 = t.explain_skipping("value >= 900.0 AND value < 910.0")
    assert r1["files_skipped"] > 0 and r2["files_skipped"] > 0


def test_validation(spark, tmp_path):
    t = _mk(spark, tmp_path, "wov")
    with pytest.raises(ValueError, match="unknown write-order column"):
        t.alter_write_order(["nope"])
    with pytest.raises(ValueError, match="at least 2"):
        t.alter_write_order(["value"], zorder=True)
    with pytest.raises(ValueError, match="not numeric"):
        t.alter_write_order(["event_type", "value"], zorder=True)
    with pytest.raises(ValueError, match="at least one column"):
        t.alter_write_order([])
    with pytest.raises(ValueError, match="target_rows"):
        t.alter_write_order(["value"], target_rows=0)


def test_maintain_cli_set_write_order(spark, tmp_path):
    import json
    import os
    import subprocess
    import sys

    t = _mk(spark, tmp_path, "wocli")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(*args):
        return subprocess.run(
            [sys.executable, "jobs/maintain.py", "--table", t.root, *args],
            capture_output=True, text=True, cwd=root,
            env={**os.environ, "PYTHONPATH": root},
        )

    r = run("set-write-order", "value", "--target-rows", "60")
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads([ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1])
    assert out["write_order"] == {"cols": ["value"], "zorder": False,
                                  "target_rows": 60}
    r = run("set-write-order", "--clear")
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads([ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1])
    assert out["write_order"] is None
    # columns AND --clear is a usage error
    assert run("set-write-order", "value", "--clear").returncode != 0
