"""Generic MERGE INTO (Delta merge / Iceberg MERGE INTO clause API):
ordered first-clause-wins semantics over t./s. expressions, classic
upsert equivalence, conditional update/delete, explicit-values insert
NULLing unspecified columns, the ambiguous-source error, bucket-
granular rewrite cost, MOR resolution, no-op without a commit, and
the per-snapshot audit record."""

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


def _base(spark, n=300):
    return spark.range(0, n).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("t"), (F.col("id") % 5).cast("string")).alias("event_type"),
        (F.col("id") % 97).cast("double").alias("value"),
        F.lit(1).alias("lsn"),
        F.lit("U").alias("op"),
    )


def _source(spark, lo=200, hi=400):
    # overlaps keys [200,300) (matched) and adds [300,400) (unmatched)
    return spark.range(lo, hi).select(
        F.col("id").alias("user_id"),
        F.lit("src").alias("event_type"),
        (F.col("id") % 89).cast("double").alias("value"),
        F.lit(7).alias("lsn"),
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["user_id"], n_buckets=8)
    t.merge(_base(spark), 0)
    return t


def test_classic_upsert(table, spark):
    res = table.merge_into(
        _source(spark),
        [
            ("update", None, {"event_type": "s.event_type", "value": "s.value"}),
            ("insert", None, None),
        ],
    )
    assert res["applied"]
    assert res["rows"] == {
        "unchanged": 0, "copied": 200, "updated": 100, "deleted": 0,
        "inserted": 100,
    }
    got = {r["user_id"]: r for r in table.read().collect()}
    assert len(got) == 400
    for uid in range(0, 200):
        assert got[uid]["event_type"].startswith("t")  # untouched
    for uid in range(200, 400):
        assert got[uid]["event_type"] == "src"
        assert got[uid]["value"] == float(uid % 89)
    # inserted rows took s.lsn; a later lower-LSN CDC event must lose
    lsn = {r["user_id"]: r["_lsn"] for r in table.read(include_meta=True).collect()}
    assert lsn[350] == 7 and lsn[250] == 1  # insert takes s.lsn, update keeps t._lsn


def test_first_clause_wins_and_conditions(table, spark):
    # delete claims s.value < 10 first; the update only sees the rest
    res = table.merge_into(
        _source(spark),
        [
            ("delete", "s.value < 10.0", None),
            ("update", "s.value > t.value", {"value": "s.value + 1000"}),
        ],
    )
    assert res["applied"]
    assert res["rows"]["deleted"] > 0 and res["rows"]["updated"] > 0
    assert res["rows"]["inserted"] == 0  # no insert clause: source-only dropped
    got = {r["user_id"]: r for r in table.read().collect()}
    assert len(got) == 300 - res["rows"]["deleted"]
    for uid in range(200, 300):
        s_val = float(uid % 89)
        t_val = float(uid % 97)
        if s_val < 10.0:
            assert uid not in got  # delete clause won even when update also applied
        elif s_val > t_val:
            assert got[uid]["value"] == s_val + 1000
        else:
            assert got[uid]["value"] == t_val  # matched, no clause accepted: kept


def test_explicit_insert_values_null_unspecified(table, spark):
    res = table.merge_into(
        _source(spark, lo=500, hi=510),
        [("insert", None, {"event_type": "'fresh'"})],
    )
    assert res["rows"]["inserted"] == 10
    assert res["rows"]["updated"] == res["rows"]["deleted"] == 0
    assert res["rows"]["unchanged"] == 0  # no matched rows at all
    got = table.read().filter(F.col("user_id") >= 500).collect()
    assert len(got) == 10
    for r in got:
        assert r["event_type"] == "fresh" and r["value"] is None


def test_ambiguous_source_raises(table, spark):
    dup = _source(spark).union(_source(spark).limit(1))
    with pytest.raises(ValueError, match="multiple rows"):
        table.merge_into(dup, [("insert", None, None)])


def test_validation(table, spark):
    with pytest.raises(ValueError, match="key/system"):
        table.merge_into(_source(spark), [("update", None, {"user_id": "0"})])
    with pytest.raises(ValueError, match="unknown column"):
        table.merge_into(_source(spark), [("update", None, {"nope": "0"})])
    with pytest.raises(ValueError, match="clauses must be"):
        table.merge_into(_source(spark), [("upsert", None, None)])
    with pytest.raises(ValueError, match="missing key"):
        table.merge_into(_source(spark).drop("user_id"), [("insert", None, None)])


def test_no_op_commits_nothing(table, spark):
    v0 = table.current_version()
    res = table.merge_into(
        _source(spark),
        [("update", "s.value > 1e9", {"value": "s.value"})],
    )
    assert not res["applied"]
    assert table.current_version() == v0


def test_bucket_granular_and_audit(table, spark):
    snap0 = table.snapshot()
    res = table.merge_into(
        _source(spark, lo=290, hi=310),
        [("update", None, {"value": "s.value"}), ("insert", None, None)],
    )
    assert res["applied"] and res["buckets_rewritten"] <= 8
    snap1 = table.snapshot(res["version"])
    old = {f["path"] for f in snap0["files"]}
    rewritten = {f["bucket"] for f in snap1["files"] if f["path"] not in old}
    assert len(rewritten) == res["buckets_rewritten"]
    kept0 = {f["path"] for f in snap0["files"] if f["bucket"] not in rewritten}
    kept1 = {f["path"] for f in snap1["files"] if f["bucket"] not in rewritten}
    assert kept0 == kept1
    assert snap1["operation"] == "merge-into"
    assert snap1["dml"]["rows"] == res["rows"]
    table.compact()
    assert "dml" not in table.snapshot()


def test_resolves_mor_deltas_first(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "m"), SCHEMA, ["user_id"], n_buckets=4)
    t.merge(_base(spark, n=100), 0, mode="mor")
    # LWW supersede: user 0..50 get value 999 at a higher LSN
    fix = spark.range(0, 50).select(
        F.col("id").alias("user_id"),
        F.lit("fixed").alias("event_type"),
        F.lit(999.0).alias("value"),
        F.lit(5).alias("lsn"),
        F.lit("U").alias("op"),
    )
    t.merge(fix, 1, mode="mor")
    # the merge condition must see the RESOLVED value (999), not the
    # stale base row
    res = t.merge_into(
        spark.range(0, 100).select(
            F.col("id").alias("user_id"), F.lit(0.0).alias("value")
        ),
        [("update", "t.value = 999.0", {"event_type": "'was-resolved'"})],
    )
    assert res["rows"]["updated"] == 50
    assert t.read().filter("event_type = 'was-resolved'").count() == 50


def _rows(df):
    return sorted(map(tuple, df.collect()))


CLAUSES = [
    ("delete", "t.value < 10.0", None),
    ("update", "s.value > t.value", {"event_type": "concat(s.event_type, '-up')",
                                     "value": "s.value + t.value"}),
    ("insert", "s.value >= 5.0", None),
]


def test_mor_merge_into_matches_cow_twin(spark, tmp_path):
    cow = LakeTable.create(spark, str(tmp_path / "c"), SCHEMA, ["user_id"], n_buckets=8)
    mor = LakeTable.create(spark, str(tmp_path / "m"), SCHEMA, ["user_id"], n_buckets=8)
    cow.merge(_base(spark), 0)
    mor.merge(_base(spark), 0)
    src = _source(spark)
    res_c = cow.merge_into(src, CLAUSES)
    snap0 = {f["path"] for f in mor.snapshot()["files"]}
    res_m = mor.merge_into(src, CLAUSES, mode="mor")
    # identical Delta-style metric split and identical visible state
    assert res_m["rows"] == res_c["rows"]
    assert res_m["buckets_rewritten"] == 0 and res_m["delta_files"] >= 1
    snap1 = mor.snapshot()
    assert snap0 <= {f["path"] for f in snap1["files"]}  # appended only
    added = [f for f in snap1["files"] if f["path"] not in snap0]
    assert added and all(f["kind"] == "delta" for f in added)
    assert _rows(mor.read()) == _rows(cow.read())
    # compaction folds the images without changing the visible state
    before = _rows(mor.read())
    mor.compact(min_deltas=1, min_delta_rows=1)
    assert not any(f.get("kind") == "delta" for f in mor.snapshot()["files"])
    assert _rows(mor.read()) == before


def test_mor_merge_into_lineage_and_later_cdc_wins(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "l"), SCHEMA, ["user_id"], n_buckets=4,
        row_lineage=True,
    )
    t.merge(_base(spark), 0)
    ids0 = {
        r["user_id"]: r["_row_id"]
        for r in t.read(include_lineage=True).select("user_id", "_row_id").collect()
    }
    t.merge_into(
        _source(spark),
        [("update", None, {"value": "s.value"}), ("insert", None, None)],
        mode="mor",
    )
    after = {
        r["user_id"]: r["_row_id"]
        for r in t.read(include_lineage=True).select("user_id", "_row_id").collect()
    }
    # updated keys keep their permanent identity through the MOR image
    for k in range(200, 300):
        assert after[k] == ids0[k]
    # a strictly-later CDC event still outranks the MOR image
    late = spark.createDataFrame(
        [(250, "late", 1.0, 99, "U")],
        "user_id long, event_type string, value double, lsn long, op string",
    )
    t.merge(late, 5, mode="mor")
    got = t.read_keys([(250,)]).collect()
    assert got[0]["event_type"] == "late"


def test_nmbs_sync_cow(table, spark):
    # classic table sync: after the merge the target mirrors the source
    src = _source(spark)
    res = table.merge_into(
        src,
        [
            ("update", None, {"event_type": "s.event_type", "value": "s.value"}),
            ("insert", None, None),
            ("nmbs_delete", None, None),
        ],
    )
    assert res["rows"] == {
        "unchanged": 0, "copied": 0, "updated": 100, "deleted": 200,
        "inserted": 100,
    }
    got = _rows(table.read())
    want = sorted(
        (r["user_id"], r["event_type"], r["value"]) for r in src.collect()
    )
    assert got == want


def test_nmbs_conditional_update(table, spark):
    # flag stale rows instead of deleting them; untouched-bucket files
    # must carry by reference (bucket-granular rewrite over the
    # widened fold)
    res = table.merge_into(
        _source(spark),
        [
            ("update", None, {"value": "s.value"}),
            ("nmbs_update", "t.user_id % 2 = 0", {"event_type": "'stale'"}),
        ],
    )
    # targets 0..299; unmatched-by-source = 0..199; half even -> 100
    assert res["rows"]["updated"] == 200 and res["rows"]["deleted"] == 0
    got = {r["user_id"]: r for r in table.read().collect()}
    assert len(got) == 300
    for uid in range(0, 200):
        want = "stale" if uid % 2 == 0 else got[uid]["event_type"]
        assert got[uid]["event_type"] == want
        if uid % 2 == 1:
            assert got[uid]["event_type"].startswith("t")
    for uid in range(200, 300):
        assert got[uid]["event_type"].startswith("t")  # matched, value-only


def test_nmbs_bucket_granular_rewrite(spark, tmp_path):
    # an NMBS merge whose claims hash into a strict subset of buckets
    # must not rewrite the others, even though the fold widened
    t = LakeTable.create(spark, str(tmp_path / "g"), SCHEMA, ["user_id"],
                         n_buckets=16)
    t.merge(_base(spark, n=500), 0)
    before = {f["path"]: f for f in t.snapshot()["files"]}
    # source = rows 0..479 unchanged-shaped; NMBS deletes only 480..499
    src = _base(spark, n=500).filter("user_id < 480").drop("op")
    res = t.merge_into(
        src,
        [("nmbs_delete", None, None)],
    )
    assert res["rows"]["deleted"] == 20
    assert t.read().count() == 480
    snap = t.snapshot()
    # every bucket holds source rows here, so this pins the metric
    # path; the subset-claim case is covered below with a narrow source
    assert res["buckets_rewritten"] <= 16
    t2 = LakeTable.create(spark, str(tmp_path / "g2"), SCHEMA, ["user_id"],
                          n_buckets=16)
    t2.merge(_base(spark, n=500), 0)
    before2 = {f["path"] for f in t2.snapshot()["files"]}
    # empty source, conditional NMBS update claiming ONE key: only that
    # key's bucket rewrites
    empty = _source(spark, 0, 0)
    res2 = t2.merge_into(
        empty,
        [("nmbs_update", "t.user_id = 42", {"event_type": "'only'"})],
    )
    assert res2["rows"]["updated"] == 1
    assert res2["buckets_rewritten"] == 1
    after2 = {f["path"] for f in t2.snapshot()["files"]}
    # 15 of 16 buckets' files carried by reference
    carried = before2 & after2
    assert len(carried) >= 15
    got = {r["user_id"]: r["event_type"] for r in t2.read().collect()}
    assert got[42] == "only" and got[41].startswith("t")


def test_nmbs_mor_matches_cow_twin(spark, tmp_path):
    cow = LakeTable.create(spark, str(tmp_path / "c"), SCHEMA, ["user_id"],
                           n_buckets=8)
    mor = LakeTable.create(spark, str(tmp_path / "m"), SCHEMA, ["user_id"],
                           n_buckets=8)
    cow.merge(_base(spark), 0)
    mor.merge(_base(spark), 0)
    src = _source(spark)
    clauses = [
        ("update", "s.value > t.value", {"value": "s.value"}),
        ("insert", None, None),
        ("nmbs_update", "t.value < 10.0", {"event_type": "'lowval'"}),
        ("nmbs_delete", "t.value >= 90.0", None),
    ]
    res_c = cow.merge_into(src, clauses)
    res_m = mor.merge_into(src, clauses, mode="mor")
    assert res_m["rows"] == res_c["rows"]
    assert res_m["buckets_rewritten"] == 0 and res_m["delta_files"] >= 1
    assert _rows(mor.read()) == _rows(cow.read())
    mor.compact(min_deltas=1, min_delta_rows=1)
    assert _rows(mor.read()) == _rows(cow.read())


def test_nmbs_lineage_carry(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "l"), SCHEMA, ["user_id"], n_buckets=4,
        row_lineage=True,
    )
    t.merge(_base(spark), 0)
    ids0 = {
        r["user_id"]: r["_row_id"]
        for r in t.read(include_lineage=True).select("user_id", "_row_id").collect()
    }
    t.merge_into(
        _source(spark),
        [("nmbs_update", None, {"event_type": "'stale'"})],
    )
    after = {
        r["user_id"]: r["_row_id"]
        for r in t.read(include_lineage=True).select("user_id", "_row_id").collect()
    }
    for k in range(0, 200):  # NMBS-updated rows keep permanent identity
        assert after[k] == ids0[k]
    for k in range(200, 300):  # matched-unclaimed rows untouched
        assert after[k] == ids0[k]


def test_narrow_key_type_coerced_not_misbucketed(spark, tmp_path):
    # a VALUES-literal/JSON-inferred INT key against a BIGINT-keyed
    # table must upsert, not land in the wrong bucket and duplicate
    t = LakeTable.create(spark, str(tmp_path / "k"), SCHEMA, ["user_id"],
                         n_buckets=8)
    t.merge(_base(spark, n=10), 0)
    narrow = spark.createDataFrame(
        [(3, "n", 99.0, 5, "U")],
        "user_id int, event_type string, value double, lsn int, op string",
    )
    t.merge(narrow, 1)
    got = t.read().filter("user_id = 3").collect()
    assert len(got) == 1 and got[0]["event_type"] == "n"
    # merge_into with a narrow-keyed source matches, not duplicates
    t.merge_into(
        spark.createDataFrame([(4, "m", 1.0)],
                              "user_id int, event_type string, value double"),
        [("update", None, {"event_type": "'m'"}), ("insert", None, None)],
    )
    assert t.read().filter("user_id = 4").count() == 1
    assert t.read().count() == 10
