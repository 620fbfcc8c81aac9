"""ANALYZE TABLE (LakeTable.analyze / col_stats — the Iceberg ANALYZE
/ Puffin theta-sketch analogue): one distributed pass persisting
table-level per-column NDV / null count / min/max plus actionable
recommendations (equality-index and write-order candidates). Pins:
counts are computed over the RESOLVED table (MOR deltas folded,
tombstones dropped), approximate NDV lands within tolerance of exact,
the report is persisted as a metadata commit whose staleness is
visible (analyzed_version vs current), recommendations follow the
measured shape, and the maintain CLI verb round-trips."""

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
        T.StructField("mostly_null", T.StringType()),
    ]
)


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["user_id"], n_buckets=4)
    ev = spark.range(1, 2001).select(
        (F.col("id") % 500).alias("user_id"),
        F.concat(F.lit("t"), (F.col("id") % 3).cast("string")).alias("event_type"),
        (F.pmod(F.xxhash64("id"), F.lit(100000)) / F.lit(10.0)).alias("value"),
        F.when(F.col("id") % 100 == 0, F.lit("rare")).alias("mostly_null"),
        F.col("id").alias("lsn"),
        F.lit("U").alias("op"),
    )
    t.merge(ev, 0)
    return t


def test_analyze_counts_resolved_state_and_persists(spark, table):
    v0 = table.current_version()
    rep = table.analyze()
    assert rep["analyzed_version"] == v0
    assert rep["version"] == v0 + 1  # the metadata commit
    # resolved row count: 500 distinct keys, LWW
    assert rep["rows"] == 500
    cols = rep["columns"]
    exact = table.read().agg(
        F.count_distinct("event_type").alias("et"),
        F.count_distinct("user_id").alias("uid"),
        F.sum(F.col("mostly_null").isNull().cast("long")).alias("mn"),
    ).collect()[0]
    assert cols["event_type"]["ndv"] == exact["et"]  # tiny ndv: HLL is exact
    assert abs(cols["user_id"]["ndv"] - exact["uid"]) <= 0.1 * exact["uid"]
    assert cols["mostly_null"]["nulls"] == exact["mn"]
    assert cols["user_id"]["min"] == 0 and cols["user_id"]["max"] == 499
    # persisted + staleness visible
    assert table.col_stats()["analyzed_version"] == v0
    assert table.stats()["analyzed_version"] == v0
    table.delete_where("event_type = 't0'")
    assert table.col_stats()["analyzed_version"] == v0  # now stale, and says so
    assert table.stats()["analyzed_version"] < table.current_version()


def test_analyze_reflects_mor_resolution(spark, table):
    # pending MOR deltas: 100 keys deleted, not yet compacted — the
    # stats must describe what readers SEE, not raw physical rows
    dels = spark.range(0, 100).select(
        F.col("id").alias("user_id"),
        F.lit(None).cast("string").alias("event_type"),
        F.lit(None).cast("double").alias("value"),
        F.lit(None).cast("string").alias("mostly_null"),
        (F.col("id") + 10_000).alias("lsn"),
        F.lit("D").alias("op"),
    )
    table.merge(dels, 1, mode="mor")
    rep = table.analyze()
    assert rep["rows"] == 400


def test_recommendations_follow_shape(table):
    rec = table.analyze()["recommend"]
    # low-cardinality string + key long: equality-index candidates
    assert "event_type" in rec["equality_index"]
    assert "user_id" in rec["equality_index"]
    # mostly-null column is NOT worth an equality index
    assert "mostly_null" not in rec["equality_index"]
    # high-NDV numerics: write-order candidates; strings are not
    assert "value" in rec["write_order"]
    assert "event_type" not in rec["write_order"]


def test_analyze_subset_and_validation(table):
    rep = table.analyze(["value"])
    assert list(rep["columns"]) == ["value"]
    with pytest.raises(ValueError, match="unknown/unsupported"):
        table.analyze(["nope"])


def test_maintain_cli_analyze(table):
    import json
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "jobs/maintain.py", "--table", table.root, "analyze"],
        capture_output=True, text=True, cwd=root,
        env={**os.environ, "PYTHONPATH": root},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads([ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1])
    assert out["rows"] == 500 and "event_type" in out["columns"]
