"""Two concurrent WRITERS on one table (the multi-executor commit
story the north rule implies): MOR merges commute under the
Iceberg-style optimistic retry — whoever loses the `open(path, 'x')`
version race re-reads the winner and rebases manifest-arithmetic-only
— so two threads interleaving disjoint batches must land every commit,
burn every batch id exactly once, and produce exactly the
single-threaded oracle's final state. A duplicate-batch-id race must
apply exactly once (the ledger short-circuit is commit-atomic).
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import types as T

from w3_data_etl_pipeline_spark.plans.laketable import LakeTable

SCHEMA = T.StructType(
    [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
)

N_BATCHES = 5  # per writer
PER_BATCH = 40
N_KEYS = 50


def _events(spark, lo_lsn, n):
    return spark.range(lo_lsn, lo_lsn + n).selectExpr(
        f"id % {N_KEYS} AS k",
        "concat('v@', id) AS v",
        "id AS lsn",
        "CASE WHEN id % 11 = 0 THEN 'D' ELSE 'I' END AS op",
    )


def test_two_writers_interleave_losslessly(spark, tmp_path):
    root = str(tmp_path / "t")
    LakeTable.create(spark, root, SCHEMA, ["k"], n_buckets=4)
    errs: list = []

    def writer(wid: int):
        try:
            t = LakeTable(spark, root)  # own handle, shared storage
            for i in range(N_BATCHES):
                lo = (wid * N_BATCHES + i) * PER_BATCH + 1
                st = t.merge(
                    _events(spark, lo, PER_BATCH),
                    batch_id=wid * 100 + i,
                    mode="mor",
                )
                assert st.applied, f"writer {wid} batch {i} did not land"
        except Exception as e:  # noqa: BLE001
            errs.append((wid, repr(e)))

    th = [threading.Thread(target=writer, args=(w,)) for w in (0, 1)]
    [x.start() for x in th]
    [x.join(timeout=600) for x in th]
    assert not errs, errs

    t = LakeTable(spark, root)
    # every commit landed: create is v0, then one version per merge
    assert t.current_version() == 2 * N_BATCHES
    for wid in (0, 1):
        for i in range(N_BATCHES):
            assert t.merge(
                _events(spark, 1, 1), batch_id=wid * 100 + i
            ).applied is False, "ledger lost a batch id"

    # final state == the single-threaded LWW oracle over all events
    n_total = 2 * N_BATCHES * PER_BATCH
    state = {}
    for lsn in range(1, n_total + 1):
        k = lsn % N_KEYS
        if lsn % 11 == 0:
            state.pop(k, None)
        else:
            state[k] = f"v@{lsn}"
    got = {r.k: r.v for r in t.read().collect()}
    assert got == state


def test_duplicate_batch_id_race_applies_once(spark, tmp_path):
    root = str(tmp_path / "t2")
    LakeTable.create(spark, root, SCHEMA, ["k"], n_buckets=4)
    results: list = []
    barrier = threading.Barrier(2)

    def racer():
        t = LakeTable(spark, root)
        barrier.wait()
        st = t.merge(_events(spark, 1, 30), batch_id=77, mode="mor")
        results.append(st.applied)

    th = [threading.Thread(target=racer) for _ in range(2)]
    [x.start() for x in th]
    [x.join(timeout=300) for x in th]
    t = LakeTable(spark, root)
    # at least one landed; the table is exactly one-batch worth either
    # way (both racers wrote identical content under LWW, and a loser
    # that slipped past the ledger pre-check commuted to the same state)
    assert any(results) and len(results) == 2
    assert t.read().count() == len(
        {lsn % N_KEYS for lsn in range(1, 31) if lsn % 11 != 0}
    )
    assert t.merge(_events(spark, 1, 1), batch_id=77).applied is False


def test_concurrent_writers_never_collide_row_ids(spark, tmp_path):
    """Row-id ranges are claimed inside `_write_snapshot` — the same
    exclusive-create commit that orders the writers — so a loser's
    rebase re-reads the winner's next_row_id and two racing commits
    can never hand out overlapping ranges."""
    root = str(tmp_path / "t3")
    LakeTable.create(spark, root, SCHEMA, ["k"], n_buckets=4, row_lineage=True)
    errs: list = []

    def writer(wid: int):
        try:
            t = LakeTable(spark, root)
            for i in range(3):
                lo = (wid * 3 + i) * PER_BATCH + 1
                t.merge(_events(spark, lo, PER_BATCH),
                        batch_id=wid * 100 + i, mode="mor")
        except Exception as e:  # noqa: BLE001
            errs.append((wid, repr(e)))

    th = [threading.Thread(target=writer, args=(w,)) for w in (0, 1)]
    [x.start() for x in th]
    [x.join(timeout=600) for x in th]
    assert not errs, errs

    t = LakeTable(spark, root)
    snap = t.snapshot()
    # claimed manifest ranges are disjoint and within next_row_id
    spans = sorted(
        (f["first_row_id"], f["first_row_id"] + f["rows"])
        for f in snap["files"]
        if "first_row_id" in f and f.get("rows") is not None
    )
    for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
        assert a1 <= b0, f"overlapping id ranges {a0, a1} vs {b0, b1}"
    assert spans[-1][1] <= snap["next_row_id"]
    # ... and the resolved read agrees
    df = t.read(include_lineage=True)
    assert df.count() == df.select("_row_id").distinct().count()
