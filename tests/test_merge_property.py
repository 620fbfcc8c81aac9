"""Randomized batch-partition property: for ANY way of slicing a
change stream into microbatches — random assignment (out-of-order
interleaving), shuffled rows, cross-batch duplicate redelivery, whole
replayed batches — both COW and MOR apply (with a mid-stream partial
compaction) must converge to the serial oracle's state byte-for-byte.
Seeded random like the patch-fold property test: deterministic runs,
three trials per mode."""

from __future__ import annotations

import random

from pyspark.sql import types as T

from w3_data_etl_pipeline_spark import oracle
from w3_data_etl_pipeline_spark.plans.laketable import LakeTable
from w3_data_etl_pipeline_spark.schemas import SOURCE_FILES

N_KEYS = 40
N_EVENTS = 200

BOOT_SCHEMA = T.StructType(SOURCE_FILES.fields + [T.StructField("lsn", T.LongType())])
EVENT_SCHEMA = T.StructType(
    SOURCE_FILES.fields
    + [T.StructField("lsn", T.LongType()), T.StructField("op", T.StringType())]
)


def _gen(rng):
    keys = [(f"org{i % 7}/r{i % 13}", f"src/f{i}.py") for i in range(N_KEYS)]
    snap_rows = [
        {
            "repo": r,
            "path": p,
            "commit": f"boot{i}",
            "lang": "Python",
            "content": f"base-{i}",
            "lsn": 0,
        }
        for i, (r, p) in enumerate(keys)
    ]
    event_rows = []
    for lsn in range(1, N_EVENTS + 1):
        r, p = rng.choice(keys)
        op = rng.choices(["I", "U", "D"], weights=[2, 5, 1])[0]
        event_rows.append(
            {
                "repo": r,
                "path": p,
                "commit": f"c{lsn:04d}",
                "lang": "Python",
                "content": f"v{lsn}-{rng.randint(0, 999)}",
                "lsn": lsn,
                "op": op,
            }
        )
    return snap_rows, event_rows


def _random_batches(rng, event_rows):
    """Random batch assignment (arbitrary cross-batch reordering of
    updates — the max-LSN guard must absorb it), repaired to the
    engine's DOCUMENTED stale-delete contract: reordering must not
    span a delete, because tombstone retention ends at the write (COW)
    or the compaction fold (MOR), after which a stale lower-LSN update
    would legally resurrect the key (same boundary as Iceberg/Delta
    COW deletes; see LakeTable.merge / hydrate_patches docstrings)."""
    n_batches = rng.randint(4, 7)
    batches = [[] for _ in range(n_batches)]
    for e in event_rows:
        batches[rng.randrange(n_batches)].append(e)  # out-of-order slicing
    # cross-batch duplicate redelivery: stale copies land in LATER batches
    for _ in range(10):
        src = rng.randrange(n_batches - 1)
        if batches[src]:
            dup = dict(rng.choice(batches[src]))
            batches[src + rng.randint(1, n_batches - 1 - src)].append(dup)
    # repair: any event older than a key's final delete may not arrive
    # in a LATER batch than that delete — pull it into the delete's own
    # batch (per-key order within a batch is irrelevant: fused dedup)
    last_d = {}
    for bi, b in enumerate(batches):
        for e in b:
            if e["op"] == "D":
                k = (e["repo"], e["path"])
                if k not in last_d or e["lsn"] > last_d[k][0]:
                    last_d[k] = (e["lsn"], bi)
    for bi, b in enumerate(batches):
        for e in list(b):
            k = (e["repo"], e["path"])
            if k in last_d and e["lsn"] < last_d[k][0] and bi > last_d[k][1]:
                b.remove(e)
                batches[last_d[k][1]].append(e)
    for b in batches:
        rng.shuffle(b)
    return batches


def test_any_batching_converges_to_oracle(spark, tmp_path):
    for trial, mode in [(1, "cow"), (2, "mor"), (3, "cow"), (4, "mor"), (5, "mor")]:
        rng = random.Random(1000 + trial)
        snap_rows, event_rows = _gen(rng)
        batches = _random_batches(rng, event_rows)
        t = LakeTable.create(
            spark,
            str(tmp_path / f"t_prop{trial}"),
            SOURCE_FILES,
            ["repo", "path"],
            n_buckets=8,
        )
        t.overwrite(spark.createDataFrame(snap_rows, BOOT_SCHEMA), lsn=0)
        replay_at = rng.randrange(len(batches))
        for i, b in enumerate(batches):
            df = spark.createDataFrame(b, EVENT_SCHEMA)
            st = t.merge(df, i, mode=mode)
            assert st.applied
            if i == replay_at:
                # whole-batch redelivery with the same id: ledger no-op
                assert not t.merge(df, i, mode=mode).applied
            if mode == "mor" and i == len(batches) // 2:
                t.compact(min_deltas=2)  # mid-stream partial fold
        exp = oracle.expected_fingerprint(
            oracle.reduce_events(snap_rows, event_rows)
        )
        got = {
            (r["repo"], r["path"]): r["content_sha"]
            for r in t.state_fingerprint().collect()
        }
        assert got == exp, f"trial {trial} ({mode}) diverged from oracle"
