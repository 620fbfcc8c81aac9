"""Generated columns (plans/laketable.py add_column(generated_as=...)
— the Delta GENERATED ALWAYS AS analogue): write-time computation when
a batch omits the column (COW and MOR), null-safe validation with a
clear rejection when a batch supplies contradicting values (tombstones
exempt), pre-add history reads the initial default, rename/drop of
referenced columns blocked while the generated column itself renames
freely, merge_into explicitness, and the SQL ALTER form.
"""

from __future__ import annotations

import os
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


def _ev(spark, ids, et="a", lsn=1, op="U", **extra):
    rows = [(i, et, float(i % 97), i + lsn * 10**6, op, *extra.values()) for i in ids]
    return spark.createDataFrame(
        rows, ["user_id", "event_type", "value", "lsn", "op", *extra.keys()]
    )


def _mk(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["user_id"], n_buckets=4)
    t.merge(_ev(spark, range(0, 50)), 0)
    t.add_column("band", "string", generated_as="upper(event_type) || '-' || CAST(CAST(value / 50 AS INT) AS STRING)")
    return t


def test_omitted_column_is_computed_cow_and_mor(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_ev(spark, range(10, 20), et="x", lsn=2), 1)            # cow
    t.merge(_ev(spark, range(20, 25), et="y", lsn=3), 2, mode="mor")
    got = {r["user_id"]: r["band"] for r in t.read().collect()}
    assert got[12] == f"X-{int((12 % 97) / 50)}"
    assert got[22] == f"Y-{int((22 % 97) / 50)}"
    # pre-add rows read NULL (write-time generation, not a backfill)
    assert got[5] is None


def test_supplied_matching_ok_contradicting_rejected(spark, tmp_path):
    t = _mk(spark, tmp_path)
    ok = _ev(spark, [30], et="z", lsn=5).withColumn(
        "band", F.expr("upper(event_type) || '-' || CAST(CAST(value / 50 AS INT) AS STRING)")
    )
    t.merge(ok, 1)
    assert {r["band"] for r in t.read().filter("user_id = 30").collect()} == {
        f"Z-{int((30 % 97) / 50)}"
    }
    bad = _ev(spark, [31], et="z", lsn=6).withColumn("band", F.lit("WRONG"))
    with pytest.raises(ValueError, match="contradict"):
        t.merge(bad, 2)
    # nothing committed by the rejected batch
    assert t.read().filter("user_id = 31 AND event_type = 'z'").count() == 0


def test_tombstones_exempt_from_validation(spark, tmp_path):
    t = _mk(spark, tmp_path)
    dels = _ev(spark, [3, 4], lsn=9, op="D").withColumn(
        "band", F.lit(None).cast("string")
    )
    t.merge(dels, 1)  # must not raise
    got = {r["user_id"] for r in t.read().collect()}
    assert 3 not in got and 4 not in got


def test_rename_drop_guards(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="referenced by generated"):
        t.rename_column("event_type", "etype")
    with pytest.raises(ValueError, match="referenced by generated"):
        t.drop_column("value")
    # the generated column itself renames freely and keeps generating
    t.rename_column("band", "bucket_band")
    t.merge(_ev(spark, [40], et="q", lsn=9), 1)
    got = {r["user_id"]: r["bucket_band"] for r in t.read().collect()}
    assert got[40] == f"Q-{int((40 % 97) / 50)}"
    # dropping the generated column lifts the guards
    t.drop_column("bucket_band")
    t.rename_column("event_type", "etype")


def test_merge_into_generated_semantics(spark, tmp_path):
    """merge_into treats generated columns the Delta way: never
    directly assignable, always recomputed from the post-image on
    every claimed update/insert row (COW and MOR)."""
    t = _mk(spark, tmp_path)
    src = spark.createDataFrame([(100, "m", 1.0)], ["user_id", "event_type", "value"])
    with pytest.raises(ValueError, match="GENERATED ALWAYS AS"):
        t.merge_into(src, [("update", None, {"band": "'X'"}), ("insert", None, None)])
    t.merge_into(src, [("insert", None, None)])
    assert {
        r["band"] for r in t.read().filter("user_id = 100").collect()
    } == {"M-0"}
    # assigning a REFERENCED column recomputes the generated value
    t.merge_into(src, [("update", None, {"event_type": "'zz'"})])
    assert {
        r["band"] for r in t.read().filter("user_id = 100").collect()
    } == {"ZZ-0"}
    # MOR images recompute too (tombstones stay NULL-valued)
    t.merge_into(src, [("update", None, {"event_type": "'mm'"})], mode="mor")
    assert {
        r["band"] for r in t.read().filter("user_id = 100").collect()
    } == {"MM-0"}


def test_update_where_generated_semantics(spark, tmp_path):
    """update_where: direct SET of a generated column is rejected; a
    SET over a referenced column recomputes from the post-update row —
    COW and MOR — and untouched rows keep their stored values."""
    t = _mk(spark, tmp_path)
    t.merge(_ev(spark, range(10, 20), et="x", lsn=2), 1)  # band = X-0
    with pytest.raises(ValueError, match="GENERATED ALWAYS AS"):
        t.update_where("user_id = 12", {"band": "'WRONG'"})
    t.update_where("user_id = 12", {"event_type": "'cw'"})
    t.update_where("user_id = 13", {"event_type": "'mr'"}, mode="mor")
    got = {r["user_id"]: r["band"] for r in t.read().collect()}
    assert got[12] == "CW-0"
    assert got[13] == "MR-0"
    assert got[14] == "X-0"  # untouched row unchanged
    # pre-add rows (band NULL) that the predicate does not touch stay NULL
    assert got[5] is None


def test_add_column_generated_unresolvable_rejected(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "u"), SCHEMA, ["user_id"], n_buckets=4)
    with pytest.raises(ValueError, match="does not resolve"):
        t.add_column("bad", "string", generated_as="upper(event_typo)")
    # self-reference cannot resolve either (column not in schema yet)
    with pytest.raises(ValueError, match="does not resolve"):
        t.add_column("selfy", "string", generated_as="upper(selfy)")


def test_string_literal_is_not_a_reference(spark, tmp_path):
    """A column name inside a STRING LITERAL of an unrelated generation
    expression must not block that column's rename/drop (references
    come from resolution, not regex)."""
    t = LakeTable.create(spark, str(tmp_path / "lit"), SCHEMA, ["user_id"], n_buckets=4)
    t.merge(_ev(spark, range(5)), 0)
    t.add_column("tagged", "string", generated_as="'value' || upper(event_type)")
    t.rename_column("value", "val2")  # literal 'value' is not a ref
    with pytest.raises(ValueError, match="referenced by generated"):
        t.rename_column("event_type", "etype")  # real ref still guards


def test_generated_excludes_write_default(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "g"), SCHEMA, ["user_id"], n_buckets=4)
    with pytest.raises(ValueError, match="mutually exclusive"):
        t.add_column("x", "string", write_default="a", generated_as="event_type")


def test_sql_alter_generated(spark, tmp_path):
    from w3_data_etl_pipeline_spark.plans.sql import LakeCatalog

    t = LakeTable.create(spark, str(tmp_path / "s"), SCHEMA, ["user_id"], n_buckets=4)
    t.merge(_ev(spark, range(5)), 0)
    cat = LakeCatalog(spark).register("st", t)
    cat.sql("ALTER TABLE st ADD COLUMN loud STRING GENERATED ALWAYS AS (upper(event_type))")
    cat.sql("INSERT INTO st (user_id, event_type, value) VALUES (9, 'hi', 1.5)")
    rows = {r["user_id"]: r["loud"] for r in t.read().collect()}
    assert rows[9] == "HI" and rows[1] is None


GEN = "upper(event_type) || '-' || CAST(CAST(FLOOR(value / 50) AS INT) AS STRING)"


def _expected_band(et, value):
    return f"{et.upper()}-{int((value) // 50)}"


@pytest.mark.parametrize("seed", [5, 77])
def test_generated_random_lifecycle(spark, tmp_path, seed):
    """Property net: random omit/supply-correct/delete batches under
    random COW/MOR storage with compaction and a mid-run rename of the
    generated column — the final state's generated values must equal
    the expression for every key touched post-add, NULL for untouched
    pre-add keys, against a pure-Python model."""
    import random

    rng = random.Random(seed)
    t = LakeTable.create(
        spark, str(tmp_path / f"g{seed}"), SCHEMA, ["user_id"], n_buckets=4
    )
    model: dict[int, tuple] = {}  # user_id -> (lsn, et, value, post_add)
    lsn = 0

    def batch(ids, et, op, post_add):
        nonlocal lsn
        lsn += 1
        rows = [(i, et, float(i % 97), i + lsn * 10**6, op) for i in ids]
        for i in ids:
            cur = model.get(i)
            if cur is None or i + lsn * 10**6 > cur[0]:
                if op == "D":
                    model.pop(i, None)
                else:
                    model[i] = (i + lsn * 10**6, et, float(i % 97), post_add)
        return spark.createDataFrame(
            rows, ["user_id", "event_type", "value", "lsn", "op"]
        )

    t.merge(batch(rng.sample(range(100), 60), "pre", "U", False), 0)
    t.add_column("band", "string", generated_as=GEN)
    name = "band"
    for step in range(10):
        ids = rng.sample(range(120), rng.randint(1, 30))
        kind = rng.random()
        mode = rng.choice(["cow", "mor"])
        if kind < 0.2:
            t.merge(batch(ids, f"d{step}", "D", True), step + 1, mode=mode)
        elif kind < 0.6:
            t.merge(batch(ids, f"o{step}", "U", True), step + 1, mode=mode)
        else:
            b = batch(ids, f"s{step}", "U", True).withColumn(
                name, F.expr(GEN.replace("band", name))
            )
            t.merge(b, step + 1, mode=mode)
        if rng.random() < 0.25:
            t.compact()
        if step == 5:
            t.rename_column(name, "band2")
            name = "band2"
    got = {r["user_id"]: (r["event_type"], r["value"], r[name]) for r in t.read().collect()}
    assert set(got) == set(model)
    for uid, (lsn_, et, value, post_add) in model.items():
        want = _expected_band(et, value) if post_add else None
        assert got[uid] == (et, value, want), (uid, got[uid], want)
