"""Phase-level timing of one COW CDC apply run (the bench_cdc config)
in a given tree — names where the wall goes by wrapping the engine's
own seams with timers: enrich+plan (apply_batch minus merge),
merge pre-pass (snapshot read + dedup + lineage collect),
_write_data (the bucket rewrite job), _file_stats (footer stats),
_write_snapshot (manifest commit). Run it on two trees to diff:

    python BENCH/profile_cow_phases.py /root/repo
    python BENCH/profile_cow_phases.py /tmp/r3tree
"""

from __future__ import annotations

import json
import os
import sys
import time

TREE = os.path.abspath(sys.argv[1]) if len(sys.argv) > 1 else "/root/repo"
sys.path.insert(0, TREE)
os.chdir(TREE)

from w3_data_etl_pipeline_spark import datagen  # noqa: E402
from w3_data_etl_pipeline_spark.plans.laketable import LakeTable  # noqa: E402
from w3_data_etl_pipeline_spark.schemas import SOURCE_FILES  # noqa: E402
from w3_data_etl_pipeline_spark.session import get_spark  # noqa: E402
from w3_data_etl_pipeline_spark.streaming.cdc import apply_batch  # noqa: E402

PHASES: dict[str, float] = {}
COUNTS: dict[str, int] = {}


def wrap(cls, name: str):
    orig = getattr(cls, name)

    def timed(self, *a, **kw):
        t0 = time.time()
        try:
            return orig(self, *a, **kw)
        finally:
            PHASES[name] = PHASES.get(name, 0.0) + (time.time() - t0)
            COUNTS[name] = COUNTS.get(name, 0) + 1

    setattr(cls, name, timed)


for seam in ("_write_data", "_write_snapshot", "_file_stats", "snapshot", "_scan"):
    if hasattr(LakeTable, seam):
        wrap(LakeTable, seam)


def main() -> None:
    n_keys, n_events, n_batches, cmax = 500000, 2000000, 2, 4096
    spark = get_spark("cow_phases", master="local[32]", shuffle_partitions=32)
    work = f"/tmp/cow_phases_{os.getpid()}"
    os.makedirs(work, exist_ok=True)
    snap = datagen.source_snapshot(spark, n_keys, content_max=cmax)
    table = LakeTable.create(
        spark, os.path.join(work, "t"), SOURCE_FILES, ["repo", "path"], n_buckets=64
    )
    table.overwrite(snap, lsn=0)
    events = datagen.change_events(spark, n_events, int(n_keys * 1.2), content_max=cmax)
    per = n_events // n_batches
    batches = []
    for i in range(n_batches):
        lo, hi = i * per + 1, (i + 1) * per if i < n_batches - 1 else n_events
        seg = os.path.join(work, f"wal_{i}")
        events.filter((events.lsn >= lo) & (events.lsn <= hi)).write.mode(
            "overwrite"
        ).parquet(seg)
        batches.append(spark.read.parquet(seg))
    PHASES.clear()
    COUNTS.clear()
    t0 = time.time()
    for i, b in enumerate(batches):
        try:
            apply_batch(table, b, i, enrich=True, salt_partitions=None, mode="cow", patches=False)
        except TypeError:  # r3 tree predates the patches kwarg
            apply_batch(table, b, i, enrich=True, salt_partitions=None, mode="cow")
    wall = time.time() - t0
    out = {
        "tree": os.path.basename(TREE),
        "wall_s": round(wall, 2),
        "eps": round(n_events / wall, 1),
        "phases_s": {k: round(v, 2) for k, v in sorted(PHASES.items())},
        "calls": COUNTS,
        "unaccounted_s": round(
            wall - PHASES.get("_write_data", 0) - PHASES.get("_write_snapshot", 0), 2
        ),
    }
    print(json.dumps(out), flush=True)
    import shutil

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
