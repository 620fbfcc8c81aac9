"""Per-batch maintenance cost under the streaming expiry policy
(VERDICT r2 #6 'done =' evidence): drive many microbatches with
expire_keep enabled and show the per-batch apply wall — and the expiry
step inside it — stays FLAT as table history grows, because expiry
diffs only the expiring manifests (scan_orphans=False) instead of
walking the whole data directory every batch.

Prints one JSON line per batch plus a summary comparing the first and
last quartile of batches (a growing O(table-files) term would show as
last >> first), and a direct timing of manifest-diff vs full-walk
expiry at final history depth.

Usage: python BENCH/profile_expire.py [n_batches] [events_per_batch]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000

    from w3_data_etl_pipeline_spark import datagen
    from w3_data_etl_pipeline_spark.plans.laketable import LakeTable
    from w3_data_etl_pipeline_spark.schemas import SOURCE_FILES
    from w3_data_etl_pipeline_spark.session import get_spark
    from w3_data_etl_pipeline_spark.streaming.cdc import apply_batch

    spark = get_spark("profile_expire", master="local[8]", shuffle_partitions=8)
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="prof_expire_", dir=base)
    try:
        n_keys = 20_000
        n_events = n_batches * per_batch
        snap = datagen.source_snapshot(spark, n_keys, content_max=512)
        table = LakeTable.create(
            spark, os.path.join(work, "t"), SOURCE_FILES, ["repo", "path"], n_buckets=32
        )
        table.overwrite(snap, lsn=0)
        events = datagen.change_events(spark, n_events, int(n_keys * 1.2), content_max=512)
        segs = []
        for i in range(n_batches):
            lo, hi = i * per_batch + 1, (i + 1) * per_batch
            seg = os.path.join(work, f"wal_{i}")
            events.filter((events.lsn >= lo) & (events.lsn <= hi)).write.mode(
                "overwrite"
            ).parquet(seg)
            segs.append(seg)

        walls = []
        for i, seg in enumerate(segs):
            b = spark.read.parquet(seg)
            t0 = time.time()
            st = apply_batch(table, b, i, enrich=False, mode="cow", expire_keep=2)
            wall = time.time() - t0
            walls.append(wall)
            print(json.dumps({"batch": i, "applied": st.applied, "wall_s": round(wall, 3)}))

        k = max(1, n_batches // 4)
        first_q = sum(walls[:k]) / k
        last_q = sum(walls[-k:]) / k

        # direct expiry timing at final depth: rebuild history, then
        # time manifest-diff vs full walk on identical table states
        for j in range(n_batches, n_batches + 6):
            b = spark.read.parquet(segs[j % len(segs)])
            apply_batch(table, b, j, enrich=False, mode="cow")  # no expiry: grow history
        t0 = time.time()
        s1 = table.expire_snapshots(keep_last=2, scan_orphans=False)
        diff_s = time.time() - t0
        for j in range(n_batches + 6, n_batches + 12):
            b = spark.read.parquet(segs[j % len(segs)])
            apply_batch(table, b, j, enrich=False, mode="cow")
        t0 = time.time()
        s2 = table.expire_snapshots(keep_last=2, scan_orphans=True)
        walk_s = time.time() - t0
        print(
            json.dumps(
                {
                    "summary": "per-batch apply wall with expire_keep=2",
                    "first_quartile_mean_s": round(first_q, 3),
                    "last_quartile_mean_s": round(last_q, 3),
                    "growth_ratio": round(last_q / first_q, 3),
                    "expire_manifest_diff_s": round(diff_s, 4),
                    "expire_full_walk_s": round(walk_s, 4),
                    "diff_removed": s1,
                    "walk_removed": s2,
                    "n_batches": n_batches,
                    "events_per_batch": per_batch,
                }
            )
        )
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
