"""End-to-end CDC drive: seeded snapshot + WAL segments -> streaming
engine (checkpointed, exactly-once) -> state fingerprint vs the
single-threaded oracle. This is the engine's primary runtime surface.

Usage: python tools/cdc_demo.py [n_keys] [n_events] [workdir] [mode]
mode: cow (default) | mor (append deltas, resolve on read, compact at end)
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from w3_data_etl_pipeline_spark import datagen, oracle  # noqa: E402
from w3_data_etl_pipeline_spark.plans.laketable import LakeTable  # noqa: E402
from w3_data_etl_pipeline_spark.schemas import CHANGE_EVENTS, SOURCE_FILES  # noqa: E402
from w3_data_etl_pipeline_spark.session import get_spark  # noqa: E402
from w3_data_etl_pipeline_spark.streaming.cdc import run_stream  # noqa: E402


def main() -> int:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    work = (sys.argv[3] if len(sys.argv) > 3 else "") or tempfile.mkdtemp(prefix="cdc_demo_")
    mode = sys.argv[4] if len(sys.argv) > 4 else "cow"
    spark = get_spark("cdc_demo", master="local[8]", shuffle_partitions=8)

    snap = datagen.source_snapshot(spark, n_keys)
    events = datagen.change_events(spark, n_events, int(n_keys * 1.5))

    table = LakeTable.create(spark, os.path.join(work, "target"), SOURCE_FILES, ["repo", "path"], n_buckets=32)
    table.overwrite(snap, lsn=0)

    wal = os.path.join(work, "wal")
    os.makedirs(wal, exist_ok=True)
    n_segs = 4
    per = n_events // n_segs
    for i in range(n_segs):
        lo, hi = i * per + 1, (i + 1) * per if i < n_segs - 1 else n_events
        staging = os.path.join(work, f"stage{i}")
        events.filter((events.lsn >= lo) & (events.lsn <= hi)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staging)
        shutil.move(glob.glob(os.path.join(staging, "part-*.parquet"))[0], os.path.join(wal, f"seg{i:03d}.parquet"))

    t0 = time.time()
    run = run_stream(
        spark, table, wal, os.path.join(work, "ckpt"), CHANGE_EVENTS,
        enrich=True, salt_partitions=8, mode=mode,
    )
    dt = time.time() - t0
    if mode == "mor":
        table.compact()
    applied = sum(s.deduped_rows for s in run.stats)
    print(f"stream drained: {len(run.stats)} batches, {applied} events consumed, {dt:.1f}s")
    print(f"table version: {table.current_version()}  lineage rows: {table.lineage().count()}")

    got = {(r["repo"], r["path"]): r["content_sha"] for r in table.state_fingerprint().collect()}
    exp = oracle.expected_fingerprint(
        oracle.reduce_events(
            [r.asDict() for r in snap.collect()], [r.asDict() for r in events.collect()]
        )
    )
    match = got == exp
    print(f"final state: {len(got)} keys; oracle: {len(exp)} keys; sha256 equality: {match}")
    print(f"events/sec (incl. commit overhead): {n_events/dt:.0f}")
    return 0 if match else 1


if __name__ == "__main__":
    raise SystemExit(main())
