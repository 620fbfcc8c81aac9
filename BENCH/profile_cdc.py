"""Phase-level profile of the CDC apply path at one parallelism level.

Usage: python BENCH/profile_cdc.py <cores> [n_keys] [n_events] [n_batches] [enrich]
Prints one JSON line with per-phase seconds summed over batches.
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
    cores = int(sys.argv[1])
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 50000
    n_events = int(sys.argv[3]) if len(sys.argv) > 3 else 400000
    n_batches = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    enrich = (sys.argv[5] if len(sys.argv) > 5 else "1") == "1"

    from w3_data_etl_pipeline_spark import datagen
    from w3_data_etl_pipeline_spark.functions.enrich import enrich_changes
    from w3_data_etl_pipeline_spark.operators.dedupe import latest_by_key
    from w3_data_etl_pipeline_spark.plans.laketable import LakeTable
    from w3_data_etl_pipeline_spark.schemas import SOURCE_FILES
    from w3_data_etl_pipeline_spark.session import get_spark

    spark = get_spark(f"prof{cores}", master=f"local[{cores}]", shuffle_partitions=cores)
    spark.range(1000000).selectExpr("sum(id)").collect()

    work = tempfile.mkdtemp(prefix="prof_cdc_")
    phases = {"snapshot": 0.0, "dedup_lineage": 0.0, "enrich_count": 0.0, "merge_write": 0.0}
    try:
        t0 = time.time()
        snap_df = datagen.source_snapshot(spark, n_keys)
        table = LakeTable.create(spark, os.path.join(work, "t"), SOURCE_FILES, ["repo", "path"], n_buckets=64)
        table.overwrite(snap_df, lsn=0)
        phases["snapshot"] = time.time() - t0

        events = datagen.change_events(spark, n_events, int(n_keys * 1.2)).persist()
        events.count()

        per = n_events // n_batches
        tall = time.time()
        for i in range(n_batches):
            lo, hi = i * per + 1, (i + 1) * per if i < n_batches - 1 else n_events
            b = events.filter((events.lsn >= lo) & (events.lsn <= hi))

            t = time.time()
            if enrich:
                b = enrich_changes(b)
                b.count()
            phases["enrich_count"] += time.time() - t

            # isolate the dedup+lineage collect (what merge() does first)
            t = time.time()
            snap = table.snapshot()
            from pyspark.sql import functions as F

            dd = latest_by_key(b, ["repo", "path"], ["lsn", "commit"]).withColumn(
                "_bucket", table._bucket_expr(snap)
            )
            dd.groupBy("_bucket").agg(F.count("*")).collect()
            phases["dedup_lineage"] += time.time() - t

            t = time.time()
            table.merge(b, i, mode="cow")
            phases["merge_write"] += time.time() - t
        wall = time.time() - tall
        print(
            json.dumps(
                {
                    "cores": cores,
                    "n_events": n_events,
                    "enrich": enrich,
                    "wall_apply_s": round(wall, 2),
                    "events_per_sec": round(n_events / wall, 1),
                    "phases_s": {k: round(v, 2) for k, v in phases.items()},
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
