"""SQL predicate strings on read_where/prune_files: the parsed
And/Or tree prunes compositionally (AND excludes on any branch, OR
only when every branch excludes), IN hits the equality path, BETWEEN
expands to range bounds, and the residual filter is the predicate
itself — so a pruned scan always equals read().filter(...)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from w3_data_etl_pipeline_spark.plans.laketable import LakeTable
from w3_data_etl_pipeline_spark.plans.predicate import (
    And,
    Or,
    ParseError,
    Pred,
    evaluate_excludes,
    parse_predicate,
)

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


# ---------------- parser unit tests ----------------

def test_parse_precedence_and_parens():
    t = parse_predicate("a = 1 OR b = 2 AND c = 3")
    assert isinstance(t, Or) and isinstance(t.children[1], And)
    t2 = parse_predicate("(a = 1 OR b = 2) AND c = 3")
    assert isinstance(t2, And) and isinstance(t2.children[0], Or)


def test_parse_leaf_forms():
    assert parse_predicate("x >= 3.5") == Pred("x", ">=", 3.5)
    assert parse_predicate("x IS NULL") == Pred("x", "is_null")
    assert parse_predicate("x IS NOT NULL") == Pred("x", "is_not_null")
    t = parse_predicate("x IN (1, 2, 3)")
    assert isinstance(t, Or) and [p.val for p in t.children] == [1, 2, 3]
    b = parse_predicate("x BETWEEN 2 AND 7")
    assert b == And([Pred("x", ">=", 2), Pred("x", "<=", 7)])
    s = parse_predicate("name = 'it''s'")
    assert s == Pred("name", "=", "it's")


def test_parse_rejects_unsupported():
    for bad in (
        "NOT a = 1",
        "a != 1",
        "a = b",
        "lower(a) = 'x'",
        "a = 1 extra",
        "",
        "a LIKE 'x%'",
    ):
        with pytest.raises(ParseError):
            parse_predicate(bad)


def test_evaluate_tree_semantics():
    # leaf truth is driven by a fake stats check: column name says all
    exc = lambda p: p.col == "dead"
    assert evaluate_excludes(And([Pred("dead", "="), Pred("live", "=")]), exc)
    assert not evaluate_excludes(Or([Pred("dead", "="), Pred("live", "=")]), exc)
    assert evaluate_excludes(Or([Pred("dead", "="), Pred("dead", "=")]), exc)


# ---------------- integration on a clustered table ----------------

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
def clustered(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["user_id"], n_buckets=8)
    t.merge(_events(spark), 0)
    t.compact(cluster_by=["value"], max_records_per_file=8)
    return t


def _norm(paths):
    return {os.path.basename(p) for p in paths}


PREDICATES = [
    "value >= 900.0 OR value < 40.0",
    "value BETWEEN 300.0 AND 420.0",
    "event_type IN ('t1', 't3') AND value >= 700.0",
    "value IS NULL OR value >= 950.0",
    "(value < 100.0 OR value > 880.0) AND event_type = 't2'",
]


def test_string_predicates_equal_full_scan_filter(clustered):
    for s in PREDICATES:
        got = sorted(map(tuple, clustered.read_where(s).collect()))
        want = sorted(map(tuple, clustered.read().filter(F.expr(s)).collect()))
        assert got == want, s
        assert got, f"predicate {s} selected nothing — test is vacuous"


def test_or_prunes_union_of_branches(clustered):
    snap = clustered.snapshot()
    both = clustered.prune_files(snap, "value >= 900.0 OR value < 40.0")
    hi = clustered.prune_files(snap, [("value", ">=", 900.0)])
    lo = clustered.prune_files(snap, [("value", "<", 40.0)])
    assert {f["path"] for f in both} == {f["path"] for f in hi} | {
        f["path"] for f in lo
    }
    # each slab is a small slice of a value-clustered table, so the
    # union must still prune most files
    assert len(both) < len(snap["files"])
    df = clustered.read_where("value >= 900.0 OR value < 40.0")
    assert _norm(df.inputFiles()) == _norm(f["path"] for f in both)


def test_string_conjunction_matches_triple_list(clustered):
    snap = clustered.snapshot()
    a = clustered.prune_files(snap, "value >= 300.0 AND value <= 420.0")
    b = clustered.prune_files(snap, [("value", ">=", 300.0), ("value", "<=", 420.0)])
    assert {f["path"] for f in a} == {f["path"] for f in b}
    c = clustered.prune_files(snap, "value BETWEEN 300.0 AND 420.0")
    assert {f["path"] for f in c} == {f["path"] for f in b}


def test_null_or_range_keeps_both_sides(clustered):
    snap = clustered.snapshot()
    kept = clustered.prune_files(snap, "value IS NULL OR value >= 950.0")
    nulls = clustered.prune_files(snap, [("value", "is_null", None)])
    hi = clustered.prune_files(snap, [("value", ">=", 950.0)])
    assert {f["path"] for f in kept} == {f["path"] for f in nulls} | {
        f["path"] for f in hi
    }
    assert len(kept) < len(snap["files"])


def test_explain_skipping_reports(clustered, spark, tmp_path):
    rep = clustered.explain_skipping("value >= 900.0 OR value < 40.0")
    snap = clustered.snapshot()
    kept = clustered.prune_files(snap, "value >= 900.0 OR value < 40.0")
    assert rep["files_total"] == len(snap["files"])
    assert rep["files_kept"] == len(kept)
    assert rep["files_skipped"] > 0
    assert rep["bytes_total"] == rep["bytes_kept"] + rep["bytes_skipped"]
    assert rep["kept_for_delta_resolution"] == 0  # fully compacted table

    # a table with pending deltas: exempt buckets show up in the report
    t2 = LakeTable.create(
        spark, str(tmp_path / "t2"), SCHEMA, ["user_id"], n_buckets=8
    )
    t2.merge(_events(spark), 0, mode="mor")
    rep2 = t2.explain_skipping("value >= 900.0")
    assert rep2["files_kept"] == rep2["files_total"]  # all delta-exempt
    assert rep2["kept_for_delta_resolution"] == rep2["files_kept"]
