"""Maintenance autopilot (maintain.py `auto`): one scheduler-friendly
verb that reads the O(metadata) signals and fires exactly the actions
they call for. Pins: debt-triggered partial compaction fires on MOR
delta + DV mask pressure and clears it; a clean table is a full no-op
(every action reported skipped with its reason); dry-run mutates
nothing; the fsck gate stops everything on a corrupted table (exit
path, no actions); stale-ANALYZE fires only past the configured
staleness; write-order tables are exempt from the small-file
collapse (their splits are intentional)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

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

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _events(spark, n=800, keys=200, lsn0=0):
    return spark.range(1, n + 1).select(
        (F.col("id") % keys).alias("user_id"),
        F.concat(F.lit("t"), (F.col("id") % 5).cast("string")).alias("event_type"),
        (F.col("id") / 10.0).alias("value"),
        (F.col("id") + lsn0).alias("lsn"),
        F.lit("U").alias("op"),
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["user_id"], n_buckets=4)
    t.merge(_events(spark), 0)
    return t


def _auto(t, *extra):
    r = subprocess.run(
        [sys.executable, "jobs/maintain.py", "--table", t.root, "auto", *extra],
        capture_output=True, text=True, cwd=ROOT,
        env={**os.environ, "PYTHONPATH": ROOT},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return json.loads(
        [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    )


def _fired(out, action):
    return [a for a in out["actions"] if a["action"] == action]


def test_clean_table_is_a_reported_noop(table):
    out = _auto(table)
    assert out["fsck_ok"] and not out["actions"]
    reasons = {s["action"]: s["reason"] for s in out["skipped"]}
    assert "compact" in reasons and "collapse-small-files" in reasons


def test_debt_triggers_compaction_and_clears(spark, table):
    table.merge(_events(spark, lsn0=10_000), 1, mode="mor")
    table.delete_where("user_id = 7", mode="dv")
    assert (table.stats()["delta_debt"] or 0) >= 0.25
    out = _auto(table)
    fired = _fired(out, "compact")
    assert fired and "delta_debt" in fired[0]["reason"]
    st = table.stats()
    assert st["delta_files"] == 0 and st["dv_files"] == 0
    # second run: nothing left to do
    out2 = _auto(table)
    assert not _fired(out2, "compact")


def test_dry_run_mutates_nothing(spark, table):
    table.merge(_events(spark, lsn0=10_000), 1, mode="mor")
    v0 = table.current_version()
    out = _auto(table, "--dry-run")
    assert _fired(out, "compact") and out["dry_run"]
    assert LakeTable(table.spark, table.root).current_version() == v0


def test_fsck_gate_stops_everything(spark, table):
    table.merge(_events(spark, lsn0=10_000), 1, mode="mor")  # would compact
    victim = table.snapshot()["files"][0]["path"]
    os.remove(os.path.join(table.root, victim))
    out = _auto(table)
    assert out["fsck_ok"] is False and out["actions"] == []
    assert "missing_files" in out["error_counts"]


def test_stale_analyze_fires_only_past_threshold(spark, table):
    table.analyze()
    out = _auto(table, "--analyze-every", "5")
    assert not _fired(out, "analyze")
    for i in range(5):
        table.merge(_events(spark, n=50, lsn0=20_000 + i * 100), 2 + i)
    out2 = _auto(table, "--analyze-every", "5")
    fired = _fired(out2, "analyze")
    assert fired and "stale" in fired[0]["reason"]


def test_write_order_exempts_small_file_collapse(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "wo"), SCHEMA, ["user_id"], n_buckets=4
    )
    t.alter_write_order(["value"], target_rows=10)  # many tiny files
    t.merge(_events(spark), 0)
    snap = t.snapshot()
    assert len(snap["files"]) > 4 * snap["n_buckets"]  # the condition holds
    out = _auto(t)
    assert not _fired(out, "collapse-small-files")
    assert any(
        s["action"] == "collapse-small-files" and "write order" in s["reason"]
        for s in out["skipped"]
    )
