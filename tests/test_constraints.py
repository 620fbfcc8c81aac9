"""CHECK constraints (Delta ALTER TABLE ADD CONSTRAINT analogue):
existing-data validation on add, write-time enforcement riding the
write job as an Observation (violated commits abort BEFORE a snapshot
advances), SQL CHECK NULL-passes semantics, MOR delete-tombstone
exemption, maintenance rewrites exempt, drop restores writability."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from w3_data_etl_pipeline_spark.plans.laketable import (
    ConstraintViolation,
    LakeTable,
)

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _rows(spark, lo, hi, value_expr="cast(id % 50 as double)", etype="'ok'"):
    return spark.range(lo, hi).selectExpr(
        "id as user_id",
        f"{etype} as event_type",
        f"{value_expr} as value",
        "id as lsn",
        "'U' as op",
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["user_id"], n_buckets=4)
    t.merge(_rows(spark, 0, 200), 0)
    return t


def test_add_validates_existing_data(table, spark):
    v0 = table.current_version()
    with pytest.raises(ConstraintViolation) as e:
        table.add_constraint("small", "value < 10.0")
    assert e.value.counts == {"small": table.read().filter("value >= 10.0").count()}
    assert table.current_version() == v0  # nothing committed
    v = table.add_constraint("nonneg", "value >= 0.0")
    assert v == v0 + 1
    assert table.constraints() == {"nonneg": "value >= 0.0"}


def test_merge_enforcement_aborts_before_commit(table, spark):
    table.add_constraint("nonneg", "value >= 0.0")
    v0 = table.current_version()
    bad = _rows(spark, 200, 210, value_expr="cast(-1.0 as double)")
    for mode in ("cow", "mor"):
        with pytest.raises(ConstraintViolation) as e:
            table.merge(bad, 1, mode=mode)
        assert e.value.counts == {"nonneg": 10}
        assert table.current_version() == v0  # aborted pre-commit
    # the failed batch_id was never ledgered: a FIXED retry applies
    st = table.merge(_rows(spark, 200, 210), 1)
    assert st.applied
    assert table.read().count() == 210


def test_null_passes_and_tombstones_exempt(table, spark):
    table.add_constraint("nonneg", "value >= 0.0")
    nulls = _rows(spark, 300, 305, value_expr="cast(null as double)")
    assert table.merge(nulls, 1).applied  # SQL CHECK: NULL is not FALSE
    # MOR delete tombstones carry NULL value columns by construction —
    # they must not trip the check
    dels = spark.range(0, 5).selectExpr(
        "id as user_id",
        "cast(null as string) as event_type",
        "cast(null as double) as value",
        "id + 1000 as lsn",
        "'D' as op",
    )
    assert table.merge(dels, 2, mode="mor").applied
    assert table.read().filter("user_id < 5").count() == 0


def test_dml_and_merge_into_enforced(table, spark):
    table.add_constraint("nonneg", "value >= 0.0")
    v0 = table.current_version()
    with pytest.raises(ConstraintViolation):
        table.update_where("user_id < 10", {"value": "-5.0"})
    with pytest.raises(ConstraintViolation):
        table.merge_into(
            spark.range(0, 10).selectExpr("id as user_id"),
            [("update", None, {"value": "-1.0"})],
        )
    assert table.current_version() == v0
    # delete_where only removes rows: survivors already satisfied
    assert table.delete_where("user_id >= 150")["applied"]


def test_compact_exempt_and_drop_restores(table, spark):
    # hide a violation from validation (validate=False), then compact:
    # maintenance rewrites carry existing rows and must not abort
    table.merge(_rows(spark, 400, 405, value_expr="cast(-2.0 as double)"), 1,
                mode="mor")
    table.add_constraint("nonneg", "value >= 0.0", validate=False)
    v = table.compact()
    assert v == table.current_version()
    with pytest.raises(ConstraintViolation):
        table.merge(_rows(spark, 500, 505, value_expr="cast(-1.0 as double)"), 2)
    table.drop_constraint("nonneg")
    assert table.constraints() == {}
    assert table.merge(
        _rows(spark, 500, 505, value_expr="cast(-1.0 as double)"), 2
    ).applied


def test_validation_errors(table):
    with pytest.raises(ValueError, match="must be"):
        table.add_constraint("bad name", "value >= 0")
    with pytest.raises(Exception):  # unresolvable column fails fast
        table.add_constraint("ghost", "no_such_col > 0")
    table.add_constraint("nonneg", "value >= 0.0")
    with pytest.raises(ValueError, match="already exists"):
        table.add_constraint("nonneg", "value >= 1.0")
    v0 = table.current_version()
    # idempotent re-add (same expression) commits metadata only
    assert table.add_constraint("nonneg", "value >= 0.0") == v0 + 1
    with pytest.raises(ValueError, match="no such constraint"):
        table.drop_constraint("ghost")
