"""Bucket-function changes vs in-flight commits: a MOR delta append
normally commutes with any concurrent commit, but NOT across a
rebucket — its files' bucket labels were computed under the old
count, and appending them would poison every bucket-pruned path
(point lookups, change-feed pruning, compaction fold grouping). Both
the live optimistic rebase and the staged publish must refuse and
send the caller back to re-merge. SURVEY.md §10.9/§8."""

from __future__ import annotations

import pytest

from w3_data_etl_pipeline_spark import datagen, oracle
from w3_data_etl_pipeline_spark.plans.laketable import CommitConflictError, LakeTable
from w3_data_etl_pipeline_spark.schemas import SOURCE_FILES

N_KEYS = 120
N_EVENTS = 400


def _setup(spark, tmp_path, name):
    snap = datagen.source_snapshot(spark, N_KEYS, content_max=128)
    events = datagen.change_events(spark, N_EVENTS, N_KEYS, content_max=128)
    t = LakeTable.create(
        spark, str(tmp_path / name), SOURCE_FILES, ["repo", "path"], n_buckets=8
    )
    t.overwrite(snap, lsn=datagen.GENESIS_LSN)
    snap_rows = [r.asDict() for r in snap.collect()]
    return t, snap_rows, events


def _shas(t):
    return {
        (r["repo"], r["path"]): r["content_sha"]
        for r in t.state_fingerprint().collect()
    }


def test_publish_conflicts_with_rebucket(spark, tmp_path):
    t, snap_rows, events = _setup(spark, tmp_path, "t_pubrb")
    st = t.merge(events, 0, mode="mor", stage_id="audit")
    assert st.stage_id == "audit"
    t.rebucket(16)  # main's bucket function changes while the audit runs
    with pytest.raises(CommitConflictError, match="rebucket"):
        t.publish("audit")
    # recovery path: drop the stale stage, re-merge under the SAME
    # batch_id (ledger unburned), publish cleanly
    t.abandon("audit")
    t.merge(events, 0, mode="mor", stage_id="audit")
    assert t.publish("audit").applied
    event_rows = [r.asDict() for r in events.collect()]
    assert _shas(t) == oracle.expected_fingerprint(
        oracle.reduce_events(snap_rows, event_rows)
    )
    # the published delta's bucket labels match the NEW function: a
    # bucket-pruned point lookup finds a key the batch touched
    some = events.filter(events.op != "D").select("repo", "path").first()
    assert t.read_keys([(some["repo"], some["path"])]).count() <= 1


def test_live_delta_rebase_refuses_rebucket(spark, tmp_path):
    """Simulated version race: a delta commit built against the
    pre-rebucket snapshot loses the version number to the rebucket and
    must raise instead of appending stale-bucket files."""
    t, _, events = _setup(spark, tmp_path, "t_liverb")
    stale = t.snapshot()
    t.rebucket(16)  # takes version stale+1
    with pytest.raises(CommitConflictError, match="rebucket"):
        t._commit_merge(
            stale,
            t.schema(stale),
            batch_id=7,
            version=stale["version"] + 1,
            new_files=[],
            lin_rows=[],
            touched=[],
            kind="delta",
        )
    # the refused batch is NOT ledgered: a clean re-merge applies
    assert t.merge(events, 7, mode="mor").applied
