"""Matched-pair ingest cost of a STANDING write order on the CDC
apply path: two identical tables, the same pre-generated change
batches merged into each (mode='cow' — the mode whose base rewrites
the order clusters), the only variable being
``alter_write_order(['lang'], target_rows=N)`` on one of them. Prints
apply throughput for both plus the skipping the ordered table buys
(explain_skipping on a selective lang predicate, immediately after
the LAST microbatch — the standing-layout property, no compaction
ever run). This is the honest trade the feature asks the operator to
make: ~one in-partition sort per microbatch against continuous
file-skipping on the sort column. One JSON line:

    python BENCH/profile_write_order.py [n_keys n_events n_batches target_rows]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    target_rows = int(sys.argv[4]) if len(sys.argv) > 4 else 200

    from w3_data_etl_pipeline_spark import datagen
    from w3_data_etl_pipeline_spark.plans.laketable import LakeTable
    from w3_data_etl_pipeline_spark.schemas import SOURCE_FILES
    from w3_data_etl_pipeline_spark.session import get_spark

    spark = get_spark("prof_wo", master="local[32]", shuffle_partitions=32)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    work = tempfile.mkdtemp(prefix="prof_wo_")
    try:
        events = datagen.change_events(spark, n_events, int(n_keys * 1.2)).persist()
        events.count()
        per = n_events // n_batches

        def run(name: str, ordered: bool) -> dict:
            t = LakeTable.create(
                spark, os.path.join(work, name), SOURCE_FILES,
                ["repo", "path"], n_buckets=64,
            )
            t.overwrite(datagen.source_snapshot(spark, n_keys), lsn=0)
            if ordered:
                t.alter_write_order(["lang"], target_rows=target_rows)
            t0 = time.time()
            for i in range(n_batches):
                lo = i * per + 1
                hi = (i + 1) * per if i < n_batches - 1 else n_events
                b = events.filter((events.lsn >= lo) & (events.lsn <= hi))
                t.merge(b, batch_id=i + 1, mode="cow")
            wall = time.time() - t0
            rep = t.explain_skipping("lang = 'Rust'")
            return {
                "apply_wall_s": round(wall, 2),
                "events_per_sec": int(n_events / wall),
                "files_total": rep["files_total"],
                "files_skipped_lang_pred": rep["files_skipped"],
                "bytes_skipped_frac": round(
                    rep["bytes_skipped"] / max(rep["bytes_total"], 1), 3
                ),
            }

        # ordered runs FIRST and so pays session warmup — any bias
        # is AGAINST the feature being profiled
        ordered = run("ordered", ordered=True)
        plain = run("plain", ordered=False)
        print(
            json.dumps(
                {
                    "metric": "write_order_ingest_cost",
                    "n_keys": n_keys,
                    "n_events": n_events,
                    "n_batches": n_batches,
                    "target_rows": target_rows,
                    "plain": plain,
                    "ordered": ordered,
                    "throughput_ratio": round(
                        ordered["events_per_sec"] / max(plain["events_per_sec"], 1),
                        3,
                    ),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
