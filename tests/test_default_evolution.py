"""Default-value schema evolution (Iceberg spec-v3 ``initial-default``
/ ``write-default``): ``add_column`` is metadata-only, yet history
reads a VALUE instead of NULL. The invariants:

* initial-default: rows written before the add read it (the add bumps
  the schema epoch, so pre-add files miss the new field id in their
  epoch map and that miss resolves to the default, not NULL);
* write-default: a writer that does not supply the column writes it —
  full-image semantics, so a batch lacking the column SETS it to the
  default on the rows it touches (merge COW + MOR, merge_into insert);
* defaults are field-id keyed (they survive renames) and die with the
  column (drop + re-add under the same name = every older file is
  pre-add for the NEW column — dropped data never resurrects);
* compact materializes the default into rewritten files; time travel
  to a pre-add version has no column at all.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from w3_data_etl_pipeline_spark.plans.laketable import LakeTable

SCHEMA = T.StructType(
    [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
)


def _ev(spark, rows, ddl="k long, v string, lsn long, op string"):
    return spark.createDataFrame(rows, ddl)


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["k"], n_buckets=4)
    t.merge(_ev(spark, [(1, "a", 1, "I"), (2, "b", 2, "I")]), 1)
    return t


def _col(t, name):
    return {r.k: getattr(r, name) for r in t.read().collect()}


def test_initial_default_fills_history_metadata_only(spark, table):
    files_before = {f["path"] for f in table.snapshot()["files"]}
    table.add_column("tier", "string", initial_default="legacy",
                     write_default="standard")
    table.add_column("score", "double")  # no defaults -> NULL
    assert {f["path"] for f in table.snapshot()["files"]} == files_before
    assert _col(table, "tier") == {1: "legacy", 2: "legacy"}
    assert _col(table, "score") == {1: None, 2: None}


def test_write_default_on_batches_missing_the_column(spark, table):
    table.add_column("tier", "string", initial_default="legacy",
                     write_default="standard")
    table.merge(_ev(spark, [(2, "b2", 10, "U"), (3, "c", 11, "I")]), 2)
    assert _col(table, "tier") == {1: "legacy", 2: "standard", 3: "standard"}
    # an explicit value beats the default
    table.merge(
        _ev(spark, [(3, "c2", 20, "U", "gold")],
            "k long, v string, lsn long, op string, tier string"),
        3,
    )
    assert _col(table, "tier") == {1: "legacy", 2: "standard", 3: "gold"}
    # ... and the MOR fast path agrees with COW
    table.merge(_ev(spark, [(1, "a2", 30, "U")]), 4, mode="mor")
    assert _col(table, "tier") == {1: "standard", 2: "standard", 3: "gold"}


def test_defaults_survive_rename_and_compact(spark, table):
    table.add_column("tier", "string", initial_default="legacy",
                     write_default="standard")
    table.rename_column("tier", "level")  # fid-keyed: defaults follow
    assert _col(table, "level") == {1: "legacy", 2: "legacy"}
    table.merge(_ev(spark, [(3, "c", 11, "I")]), 2)
    table.compact()  # materializes the default into rewritten files
    assert _col(table, "level") == {1: "legacy", 2: "legacy", 3: "standard"}


def test_merge_into_insert_takes_write_default(spark, table):
    table.add_column("tier", "string", write_default="standard")
    src = spark.createDataFrame([(9, "z")], "k long, v string")
    table.merge_into(src, [("insert", None, None)], insert_lsn=99)
    assert _col(table, "tier")[9] == "standard"
    # explicit-values insert: unspecified columns also take the default
    src2 = spark.createDataFrame([(10, "y")], "k long, v string")
    table.merge_into(
        src2, [("insert", None, {"v": "s.v"})], insert_lsn=100
    )
    assert _col(table, "tier")[10] == "standard"


def test_drop_and_readd_never_resurrects(spark, table):
    table.add_column("tier", "string", initial_default="old",
                     write_default="old_w")
    table.merge(
        _ev(spark, [(1, "a2", 10, "U", "explicit")],
            "k long, v string, lsn long, op string, tier string"),
        2,
    )
    table.drop_column("tier")
    table.add_column("tier", "string", initial_default="reborn")
    # the re-added column has a FRESH id: every existing file is
    # pre-add, so even the explicitly-written 'explicit' cannot leak
    assert set(_col(table, "tier").values()) == {"reborn"}


def test_typed_defaults_cast_at_plan_time(spark, table):
    table.add_column("since", "date", initial_default="2020-01-02")
    table.add_column("weight", "double", initial_default=5, write_default=7)
    import datetime

    got = _col(table, "since")
    assert got[1] == datetime.date(2020, 1, 2)
    assert _col(table, "weight") == {1: 5.0, 2: 5.0}
    table.merge(_ev(spark, [(3, "c", 11, "I")]), 2)
    assert _col(table, "weight")[3] == 7.0


def test_time_travel_and_validation(spark, table):
    v1 = table.snapshot()["version"]
    table.add_column("tier", "string", initial_default="legacy")
    assert "tier" not in table.read(version=v1).columns
    with pytest.raises(ValueError, match="already exists"):
        table.add_column("tier", "string")
    with pytest.raises(ValueError, match="JSON scalar"):
        table.add_column("bad", "string", initial_default=object())


def test_alter_write_default_set_and_drop(spark, table):
    table.add_column("tier", "string", initial_default="legacy",
                     write_default="standard")
    table.alter_column_default("tier", write_default="v2")
    table.merge(_ev(spark, [(3, "c", 11, "I")]), 2)
    assert _col(table, "tier") == {1: "legacy", 2: "legacy", 3: "v2"}
    table.alter_column_default("tier", write_default=None)  # DROP DEFAULT
    table.merge(_ev(spark, [(4, "d", 12, "I")]), 3)
    got = _col(table, "tier")
    assert got[4] is None and got[1] == "legacy"  # initial survives the drop
    with pytest.raises(ValueError, match="no such column"):
        table.alter_column_default("nope", write_default="x")


def test_alter_column_type_widening(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("n", T.IntegerType()),
            T.StructField("x", T.FloatType()),
        ]
    )
    t = LakeTable.create(spark, str(tmp_path / "tw"), schema, ["k"], n_buckets=4)
    t.merge(
        spark.createDataFrame(
            [(1, 7, 1.5, 1, "I")], "k long, n int, x float, lsn long, op string"
        ),
        1,
    )
    files_before = {f["path"] for f in t.snapshot()["files"]}
    t.alter_column_type("n", "long")
    t.alter_column_type("x", "double")
    assert {f["path"] for f in t.snapshot()["files"]} == files_before  # metadata-only
    row = t.read().collect()[0]
    assert (row.n, row.x) == (7, 1.5)
    assert dict(t.read().dtypes)["n"] == "bigint"
    # narrow batch into the widened column still lands wide
    t.merge(
        spark.createDataFrame(
            [(2, 9, 2.5, 2, "I")], "k long, n int, x float, lsn long, op string"
        ),
        2,
    )
    assert {r.k: r.n for r in t.read().collect()} == {1: 7, 2: 9}
    with pytest.raises(ValueError, match="unsafe type change"):
        t.alter_column_type("n", "int")  # narrowing refused
    with pytest.raises(ValueError, match="bucketing key"):
        t.alter_column_type("k", "string")
    assert t.alter_column_type("n", "long") == t.snapshot()["version"]  # no-op


def test_patch_hydration_respects_write_default(spark, table):
    """A full-image I/U row inside a PATCH batch that omits a
    defaulted column must behave exactly like the same row sent
    straight to merge() (write-default), while a 'P' row's missing
    column still means 'keep the stored value'."""
    table.add_column("tier", "string", write_default="standard")
    table.merge(
        _ev(spark, [(1, "a1", 5, "U", "gold")],
            "k long, v string, lsn long, op string, tier string"),
        2,
    )
    # patch batch WITHOUT the tier column: U on k=1 (full image ->
    # write default), P on k=2 (keep stored, i.e. NULL from pre-add)
    batch = spark.createDataFrame(
        [(1, "a2", 10, "U"), (2, "b2", 11, "P")],
        "k long, v string, lsn long, op string",
    )
    hydrated = table.hydrate_patches(batch)
    table.merge(hydrated, 3)
    got = {r.k: (r.v, r.tier) for r in table.read().collect()}
    assert got[1] == ("a2", "standard")  # full image reset to default
    assert got[2] == ("b2", None)        # patch kept the stored value
