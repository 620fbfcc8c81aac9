"""Z-order clustered rewrite (compact(zorder=True) — Iceberg rewrite
zorder / Delta OPTIMIZE ZORDER BY analogue): interleaving the bit
representation of each cluster column's grid cell gives every emitted
file a small hyper-rectangle footprint, so manifest bounds prune on
EVERY z-order column — lexicographic clustering only ever prunes on
the first. SURVEY.md §10.12."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from w3_data_etl_pipeline_spark.plans.laketable import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("x", T.LongType()),
        T.StructField("y", T.LongType()),
        T.StructField("name", T.StringType()),
    ]
)

N = 40_000


def _rows(spark):
    # x and y are decorrelated: a lexicographic (x, y) sort leaves y
    # unsorted within every file beyond the first column's runs
    return spark.range(1, N + 1).select(
        F.col("id").alias("k"),
        (F.col("id") % 200).alias("x"),
        F.pmod(F.xxhash64("id"), F.lit(200)).alias("y"),
        F.concat(F.lit("n"), F.col("id").cast("string")).alias("name"),
        F.col("id").alias("lsn"),
        F.lit("U").alias("op"),
    )


def _build(spark, tmp_path, name, zorder):
    t = LakeTable.create(spark, str(tmp_path / name), SCHEMA, ["k"], n_buckets=1)
    t.merge(_rows(spark), 0)
    t.compact(cluster_by=["x", "y"], zorder=zorder, max_records_per_file=1000)
    return t


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("zorder")
    return _build(spark, d, "lex", False), _build(spark, d, "zed", True)


def _admitted(t, preds):
    return len(t.prune_files(t.snapshot(), preds))


def test_zorder_prunes_every_dimension(layouts):
    lex, zed = layouts
    total = len(zed.snapshot()["files"])
    assert total >= 30  # maxRecordsPerFile actually split the bucket

    # first-column predicate: both layouts prune well
    xp = [("x", ">=", 10), ("x", "<", 20)]
    assert _admitted(lex, xp) <= total // 2
    assert _admitted(zed, xp) <= total // 2

    # SECOND-column predicate: lexicographic admits ~everything (y is
    # unsorted within the x-major order), z-order admits a fraction
    yp = [("y", ">=", 10), ("y", "<", 20)]
    lex_y, zed_y = _admitted(lex, yp), _admitted(zed, yp)
    assert lex_y >= total - 2, "x-major layout can't prune on y"
    assert zed_y < lex_y and zed_y <= total // 2

    # conjunction box: z-order admits fewer files than either slab
    box = xp + yp
    assert _admitted(zed, box) <= zed_y


def test_zorder_answers_match_full_scan(spark, layouts):
    lex, zed = layouts
    preds = [("x", ">=", 50), ("x", "<", 70), ("y", ">=", 100), ("y", "<", 140)]
    expect = sorted(
        r["k"]
        for r in lex.read()
        .filter((F.col("x") >= 50) & (F.col("x") < 70) & (F.col("y") >= 100) & (F.col("y") < 140))
        .collect()
    )
    assert expect, "predicate selects something"
    for t in layouts:
        got = sorted(r["k"] for r in t.read_where(preds).collect())
        assert got == expect


def test_zorder_validation(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "tv"), SCHEMA, ["k"], n_buckets=1)
    t.merge(_rows(spark).limit(100), 0)
    with pytest.raises(ValueError):
        t.compact(cluster_by=["x", "name"], zorder=True)  # string column
    # single-column zorder degrades to plain clustering (no interleave)
    v = t.compact(cluster_by=["x"], zorder=True)
    assert v == t.current_version()
