"""Cross-feature integration on the REAL streaming path: a standing
write order and a positional-deletion-vector delete interleaved with
checkpointed WAL drains. Pins that the round's new surfaces compose
with the core exactly-once CDC loop: (1) the stream's own COW
microbatches come out value-clustered and range-split (file skipping
works mid-stream with no compaction ever run), (2) a DV delete landed
BETWEEN two drains composes with resume-from-checkpoint — the final
state equals the single-threaded oracle replay with the delete folded
in at the right point (including the stale-DELETE contract: a key
deleted by DV loses its LSN memory, so a later segment's event legally
re-inserts it), and (3) the table passes a deep fsck at the end."""

from __future__ import annotations

import glob
import os
import shutil

import pytest

from w3_data_etl_pipeline_spark import datagen, oracle
from w3_data_etl_pipeline_spark.plans.laketable import LakeTable
from w3_data_etl_pipeline_spark.schemas import CHANGE_EVENTS, SOURCE_FILES
from w3_data_etl_pipeline_spark.streaming.cdc import run_stream

N_SNAP_KEYS = 400
N_EVENTS = 2000
N_EVENT_KEYS = 500


@pytest.fixture()
def fixtures(spark):
    snap = datagen.source_snapshot(spark, N_SNAP_KEYS).cache()
    events = datagen.change_events(spark, N_EVENTS, N_EVENT_KEYS).cache()
    return snap, events


def _engine_shas(table):
    return {
        (r["repo"], r["path"]): r["content_sha"]
        for r in table.state_fingerprint().collect()
    }


def test_write_order_and_dv_through_checkpointed_stream(spark, tmp_path, fixtures):
    snap, events = fixtures
    snap_rows = [r.asDict() for r in snap.collect()]
    ev_rows = [r.asDict() for r in events.collect()]
    ev1 = [e for e in ev_rows if e["lsn"] <= 1000]
    ev2 = [e for e in ev_rows if e["lsn"] > 1000]

    wal = tmp_path / "wal"
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(wal)

    def land(i, lo, hi):
        staging = str(tmp_path / f"stage{i}")
        events.filter(
            (events.lsn >= lo) & (events.lsn <= hi)
        ).coalesce(1).write.parquet(staging)
        part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        shutil.move(part, str(wal / f"seg{i}.parquet"))

    t = LakeTable.create(
        spark, str(tmp_path / "t"), SOURCE_FILES, ["repo", "path"], n_buckets=8
    )
    t.overwrite(snap, lsn=datagen.GENESIS_LSN)
    t.alter_write_order(["lang"], target_rows=16)

    # phase 1: drain segment 0 through the checkpointed stream
    land(0, 1, 1000)
    run1 = run_stream(spark, t, str(wal), ckpt, CHANGE_EVENTS, enrich=False)
    assert run1.stats and all(s.applied for s in run1.stats)
    state1 = oracle.reduce_events(snap_rows, ev1)
    assert _engine_shas(t) == oracle.expected_fingerprint(state1)

    # the stream's OWN microbatch rewrites are already clustered:
    # a selective lang predicate skips files with no compaction run
    langs = sorted({v["lang"] for v in state1.values() if v.get("lang")})
    victim = langs[0]
    rep = t.explain_skipping(f"lang = '{victim}'")
    assert rep["files_skipped"] > 0

    # phase 2: a DV delete lands BETWEEN drains
    res = t.delete_where(f"lang = '{victim}'", mode="dv")
    assert res["applied"] and res["buckets_rewritten"] == 0
    state1b = {
        k: v for k, v in state1.items() if v.get("lang") != victim
    }
    assert _engine_shas(t) == oracle.expected_fingerprint(state1b)

    # phase 3: more WAL lands; resume from the SAME checkpoint. The
    # deleted keys lost their LSN memory (stale-DELETE contract), so
    # phase-2 events legally re-insert some of them — the oracle
    # replay over the post-delete state models exactly that.
    land(1, 1001, 2000)
    run2 = run_stream(spark, t, str(wal), ckpt, CHANGE_EVENTS, enrich=False)
    assert run2.stats and all(s.applied for s in run2.stats)
    final = oracle.reduce_events(list(state1b.values()), ev2)
    assert _engine_shas(t) == oracle.expected_fingerprint(final)

    # standing order still holds on the newest microbatch's files,
    # and the whole interleaving passes a deep integrity check
    assert t.verify(deep=True)["ok"]
    st = t.stats()
    assert st["write_order"] == {
        "cols": ["lang"], "zorder": False, "target_rows": 16
    }
