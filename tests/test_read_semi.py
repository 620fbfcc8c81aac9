"""Runtime join-key file pruning (``read_semi`` — the dynamic
partition pruning / Iceberg runtime-filtering analogue): given the
filtered dimension side of a star join, the fact scan must open only
the buckets (and, refined, only the files) that can hold the wanted
keys, while returning exactly ``read().join(keys, 'left_semi')``."""

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


def _events(spark, n=2000, keys=400, lsn0=0):
    return spark.range(1, n + 1).select(
        (F.col("id") % keys).alias("user_id"),
        F.concat(F.lit("t"), (F.col("id") % 5).cast("string")).alias("event_type"),
        (F.pmod(F.xxhash64("id"), F.lit(10000)) / F.lit(10.0)).alias("value"),
        (F.col("id") + lsn0).alias("lsn"),
        F.when(F.col("id") % 13 == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["user_id"], n_buckets=16)
    t.merge(_events(spark), 0)
    return t


def _keys_df(spark, ids):
    return spark.createDataFrame([(int(i),) for i in ids], "user_id long")


def _rows(df):
    return sorted(
        (r["user_id"], r["event_type"], r["value"])
        for r in df.select("user_id", "event_type", "value").collect()
    )


def _oracle(t, keys):
    return _rows(t.read().join(keys, "user_id", "left_semi"))


def test_semi_equals_full_scan_semi_join(table, spark):
    keys = _keys_df(spark, [3, 17, 399, 123456])  # incl. a key not in the table
    assert _rows(table.read_semi(keys)) == _oracle(table, keys)


def test_bucket_pruning_is_exact(table, spark):
    keys = _keys_df(spark, [3, 17])
    snap = table.snapshot()
    n = snap["n_buckets"]
    want = {
        r["b"]
        for r in keys.select(
            F.pmod(F.xxhash64("user_id"), F.lit(n)).cast("int").alias("b")
        ).collect()
    }
    ex = table.explain_semi_skipping(keys)
    assert ex["buckets_wanted"] == len(want)
    assert ex["files_kept"] <= ex["files_kept_bucket_stage"] < ex["files_total"]
    expected_bucket_files = sum(1 for f in snap["files"] if f["bucket"] in want)
    assert ex["files_kept_bucket_stage"] == expected_bucket_files
    # actually-opened files stay within the pruned set
    opened = set(table.read_semi(keys).inputFiles())
    kept = {f["path"] for f in table._semi_prune(keys, snap, 1024)[1]}
    assert {p.split("/t/", 1)[-1] for p in opened} <= kept


def test_empty_keys_returns_empty(table, spark):
    empty = _keys_df(spark, [])
    assert table.read_semi(empty).count() == 0
    ex = table.explain_semi_skipping(empty)
    assert ex["buckets_wanted"] == 0 and ex["files_kept"] == 0


def test_key_type_cast_matches_read_keys_hazard(table, spark):
    # int-typed keys where the table key is long: the cast must land
    # them in the right bucket (a raw xxhash64 of the int would not)
    keys_int = spark.createDataFrame([(3,), (17,)], "user_id int")
    assert _rows(table.read_semi(keys_int)) == _oracle(
        table, _keys_df(spark, [3, 17])
    )


def test_file_refinement_after_split_compact(table, spark):
    # split each bucket into many key-sorted files: per-file key bounds
    # must refine beyond the bucket stage
    table.compact(max_records_per_file=8)
    keys = _keys_df(spark, [3])
    ex = table.explain_semi_skipping(keys)
    assert ex["refined"] is True
    assert ex["files_kept"] < ex["files_kept_bucket_stage"]
    assert _rows(table.read_semi(keys)) == _oracle(table, keys)


def test_probe_limit_exceeded_still_exact(table, spark):
    keys = _keys_df(spark, range(0, 50))
    ex = table.explain_semi_skipping(keys, probe_limit=8)
    assert ex["refined"] is False
    assert ex["files_kept"] == ex["files_kept_bucket_stage"]
    assert _rows(table.read_semi(keys, probe_limit=8)) == _oracle(table, keys)


def test_mor_delta_buckets_stay_whole_and_resolve(table, spark):
    # a MOR update lands delta files; wanted keys in those buckets must
    # resolve to the delta image, and the delta bucket is never
    # file-refined away
    table.update_where([("user_id", "=", 3)], {"value": "-1.0"}, mode="mor")
    keys = _keys_df(spark, [3, 17])
    got = _rows(table.read_semi(keys))
    assert got == _oracle(table, keys)
    assert any(v == -1.0 for (_, _, v) in got)


def test_deleted_key_absent(table, spark):
    # key 13 % 13 == 0 rows are deletes; a fully-deleted key must not
    # resurrect through the pruned scan
    table.delete_where([("user_id", "=", 17)])
    keys = _keys_df(spark, [17])
    assert _rows(table.read_semi(keys)) == []


def test_equality_index_refines_key_pruning(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "eq"), SCHEMA, ["user_id"], n_buckets=4
    )
    t.merge(_events(spark, n=1200, keys=300), 0)
    t.alter_skip_columns(["user_id"])
    t.compact(max_records_per_file=16)
    keys = _keys_df(spark, [7])
    ex = t.explain_semi_skipping(keys)
    assert ex["files_kept"] < ex["files_kept_bucket_stage"]
    assert _rows(t.read_semi(keys)) == _oracle(t, keys)


# ---------- read_in: runtime IN-list skipping on a non-key column ----------


def test_read_in_equals_filter_after_clustered_compact(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "ri"), SCHEMA, ["user_id"], n_buckets=4)
    t.merge(_events(spark, n=2000, keys=500), 0)
    t.compact(cluster_by=["value"], max_records_per_file=32)
    vals = spark.createDataFrame([(5.0,), (700.5,)], "value double")
    got = _rows(t.read_in("value", vals))
    want = _rows(t.read().filter(F.col("value").isin([5.0, 700.5])))
    assert got == want
    # clustered bounds must actually skip files
    total = len(t.snapshot()["files"])
    opened = len(set(t.read_in("value", vals).inputFiles()))
    assert 0 < opened < total


def test_read_in_mor_stale_value_never_resurrects(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "rm"), SCHEMA, ["user_id"], n_buckets=4)
    t.merge(
        spark.createDataFrame(
            [(1, "a", 10.0, 1, "U"), (2, "a", 20.0, 1, "U")],
            "user_id long, event_type string, value double, lsn long, op string",
        ),
        0,
    )
    # key 1's value moves 10.0 -> 99.0 via a MOR delta
    t.update_where([("user_id", "=", 1)], {"value": "99.0"}, mode="mor")
    vals = spark.createDataFrame([(10.0,)], "value double")
    # the STALE match (key 1 @ 10.0) must not resurrect
    assert _rows(t.read_in("value", vals)) == []
    vals2 = spark.createDataFrame([(99.0,)], "value double")
    assert _rows(t.read_in("value", vals2)) == [(1, "a", 99.0)]


def test_read_in_probe_limit_fallback(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "rf"), SCHEMA, ["user_id"], n_buckets=4)
    t.merge(_events(spark, n=600, keys=200), 0)
    vals = t.read().select("value").limit(50)
    got = _rows(t.read_in("value", vals, probe_limit=8))
    want = _rows(t.read().join(vals.distinct(), "value", "left_semi"))
    assert got == want


def test_read_in_eq_index_on_categorical(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "rc"), SCHEMA, ["user_id"], n_buckets=4)
    t.merge(_events(spark, n=1600, keys=400), 0)
    t.alter_skip_columns(["event_type"])
    t.compact(cluster_by=["event_type"], max_records_per_file=64)
    vals = spark.createDataFrame([("t1",)], "event_type string")
    got = _rows(t.read_in("event_type", vals))
    want = _rows(t.read().filter(F.col("event_type") == "t1"))
    assert got == want
    total = len(t.snapshot()["files"])
    opened = len(set(t.read_in("event_type", vals).inputFiles()))
    assert 0 < opened < total


def test_read_in_unknown_column_and_bad_values_df(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "re"), SCHEMA, ["user_id"], n_buckets=4)
    t.merge(_events(spark, n=100, keys=50), 0)
    with pytest.raises(ValueError, match="unknown column"):
        t.read_in("nope", spark.createDataFrame([(1,)], "x int"))
    with pytest.raises(ValueError, match="exactly one column"):
        t.read_in("value", spark.createDataFrame([(1, 2)], "x int, y int"))
