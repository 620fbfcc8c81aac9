"""Sink-swappability contract: the same microbatch sequence driven
through `apply_batch` against (a) the LakeTable MERGE engine and (b)
the trivial DictSink reference backend must produce identical
final-state fingerprints and identical exactly-once bookkeeping.
This is what guards the claim that the LakeTable sink is swappable
for an Iceberg/Delta `MERGE INTO` writer (plans/laketable.py:1-7)."""

from __future__ import annotations

import pytest

from w3_data_etl_pipeline_spark import datagen
from w3_data_etl_pipeline_spark.plans.laketable import LakeTable
from w3_data_etl_pipeline_spark.plans.sinks import DictSink
from w3_data_etl_pipeline_spark.schemas import SOURCE_FILES
from w3_data_etl_pipeline_spark.streaming.cdc import apply_batch

N_KEYS, N_EVENTS = 300, 1500


@pytest.fixture(scope="module")
def batches(spark):
    events = datagen.change_events(spark, N_EVENTS, int(N_KEYS * 1.5)).cache()
    cuts = [(1, 500), (501, 1000), (1001, 1500)]
    return [
        events.filter((events.lsn >= lo) & (events.lsn <= hi)) for lo, hi in cuts
    ]


def _fps(sink):
    return {
        (r["repo"], r["path"]): r["content_sha"]
        for r in sink.state_fingerprint().collect()
    }


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_both_backends_reach_identical_state(spark, tmp_path, batches, mode):
    snap = datagen.source_snapshot(spark, N_KEYS)
    lake = LakeTable.create(
        spark, str(tmp_path / f"lake_{mode}"), SOURCE_FILES, ["repo", "path"], n_buckets=8
    )
    lake.overwrite(snap, lsn=datagen.GENESIS_LSN)
    ref = DictSink(spark, ["repo", "path"])
    ref.load([r.asDict() for r in snap.collect()])

    for i, b in enumerate(batches):
        s_lake = apply_batch(lake, b, i, enrich=True, mode=mode)
        s_ref = apply_batch(ref, b, i, enrich=True, mode=mode)
        assert s_lake.applied and s_ref.applied

    # replay an old batch through BOTH: exactly-once no-op on each
    s_lake = apply_batch(lake, batches[0], 0, enrich=True, mode=mode)
    s_ref = apply_batch(ref, batches[0], 0, enrich=True, mode=mode)
    assert not s_lake.applied and not s_ref.applied

    assert _fps(lake) == _fps(ref)
