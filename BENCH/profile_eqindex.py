"""Matched-pair write-side cost of the per-file equality index
(alter_skip_columns): same session, same WAL slices, same table
config; the only variable is whether (repo, path-correlated) 'commit'
— a high-ndv string column — is index-opted. The index is the one
stats item that reads data pages back (one column per file the commit
wrote), so this prints the honest price of enabling it on the CDC hot
path. One JSON line:

    python BENCH/profile_eqindex.py [n_keys n_events n_batches]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from w3_data_etl_pipeline_spark import datagen  # noqa: E402
from w3_data_etl_pipeline_spark.plans.laketable import LakeTable  # noqa: E402
from w3_data_etl_pipeline_spark.schemas import SOURCE_FILES  # noqa: E402
from w3_data_etl_pipeline_spark.session import get_spark  # noqa: E402
from w3_data_etl_pipeline_spark.streaming.cdc import apply_batch  # noqa: E402

from bench import _bench_workdir  # noqa: E402


def _run(spark, work, segs, n_keys, indexed) -> float:
    table = LakeTable.create(
        spark, os.path.join(work, "t"), SOURCE_FILES, ["repo", "path"], n_buckets=64
    )
    if indexed:
        table.alter_skip_columns(["commit"])
    table.overwrite(datagen.source_snapshot(spark, n_keys, content_max=2048), lsn=0)
    t0 = time.time()
    for i, b in enumerate(segs):
        assert apply_batch(
            table, b, i, enrich=True, mode="mor", patches=False
        ).applied
    return time.time() - t0


def main() -> None:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 1_600_000
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    spark = get_spark("profile_eqindex", master="local[32]", shuffle_partitions=32)
    work = _bench_workdir()
    try:
        events = datagen.change_events(
            spark, n_events, int(n_keys * 1.2), content_max=2048
        )
        per = n_events // n_batches
        segs = []
        for i in range(n_batches):
            lo = i * per + 1
            hi = (i + 1) * per if i < n_batches - 1 else n_events
            p = os.path.join(work, f"wal_{i}")
            events.filter((events.lsn >= lo) & (events.lsn <= hi)).write.mode(
                "overwrite"
            ).parquet(p)
            segs.append(spark.read.parquet(p))
        walls = {"plain": [], "indexed": []}
        for rep in range(2):  # interleave A/B/A/B to share host drift
            for name, idx in (("plain", False), ("indexed", True)):
                sub = os.path.join(work, f"{name}{rep}")
                os.makedirs(sub, exist_ok=True)
                walls[name].append(_run(spark, sub, segs, n_keys, idx))
                shutil.rmtree(sub, ignore_errors=True)
        plain = min(walls["plain"])
        indexed = min(walls["indexed"])
        print(
            json.dumps(
                {
                    "metric": "eq_index_write_overhead",
                    "n_events": n_events,
                    "plain_wall_s": round(plain, 2),
                    "indexed_wall_s": round(indexed, 2),
                    "plain_eps": round(n_events / plain, 1),
                    "indexed_eps": round(n_events / indexed, 1),
                    "overhead_x": round(indexed / plain, 3),
                    "walls": {k: [round(x, 2) for x in v] for k, v in walls.items()},
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
