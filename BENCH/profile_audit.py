"""Matched-pair cost of audit-gated ingest (write-audit-publish per
microbatch) vs the direct MOR apply path.

Same session, same generated WAL slices, same table config; the only
variable is ``audit=`` — a representative content-predicate scan over
the batch-scope staged view (read_staged(scope='batch'), O(batch)),
plus the stage/publish metadata round-trip. Prints one JSON line:

    python BENCH/profile_audit.py [n_keys n_events n_batches]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from w3_data_etl_pipeline_spark import datagen  # noqa: E402
from w3_data_etl_pipeline_spark.plans.laketable import LakeTable  # noqa: E402
from w3_data_etl_pipeline_spark.schemas import SOURCE_FILES  # noqa: E402
from w3_data_etl_pipeline_spark.session import get_spark  # noqa: E402
from w3_data_etl_pipeline_spark.streaming.cdc import apply_batch  # noqa: E402

from bench import _bench_workdir  # noqa: E402


def _run(spark, work, events_segs, n_keys, audit) -> float:
    table = LakeTable.create(
        spark, os.path.join(work, "t"), SOURCE_FILES, ["repo", "path"], n_buckets=64
    )
    table.overwrite(datagen.source_snapshot(spark, n_keys, content_max=2048), lsn=0)
    t0 = time.time()
    for i, b in enumerate(events_segs):
        st = apply_batch(
            table, b, i, enrich=True, mode="mor", patches=False, audit=audit
        )
        assert st.applied, f"batch {i} did not apply"
    return time.time() - t0


def main() -> None:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 1_600_000
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    spark = get_spark("profile_audit", master="local[32]", shuffle_partitions=32)
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

        def clean_audit(df):
            # representative validation: full predicate scan of the
            # batch view (every row's content inspected)
            return df.filter(F.col("content").startswith("CORRUPT")).isEmpty()

        # interleave A/B/A/B to share any host drift equally
        walls = {"direct": [], "audited": []}
        for rep in range(2):
            for name, audit in (("direct", None), ("audited", clean_audit)):
                sub = os.path.join(work, f"{name}{rep}")
                os.makedirs(sub, exist_ok=True)
                walls[name].append(_run(spark, sub, segs, n_keys, audit))
                shutil.rmtree(sub, ignore_errors=True)
        direct = min(walls["direct"])
        audited = min(walls["audited"])
        print(
            json.dumps(
                {
                    "metric": "audit_gate_overhead",
                    "n_events": n_events,
                    "direct_wall_s": round(direct, 2),
                    "audited_wall_s": round(audited, 2),
                    "direct_eps": round(n_events / direct, 1),
                    "audited_eps": round(n_events / audited, 1),
                    "overhead_x": round(audited / direct, 3),
                    "walls": {k: [round(x, 2) for x in v] for k, v in walls.items()},
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
