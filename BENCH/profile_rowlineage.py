"""Matched-pair write-side cost of row lineage (Iceberg v3 analogue):
two identical tables, the same snapshot load + MOR CDC batch stream +
compact + COW batch applied to each — the only variable is
``row_lineage`` on vs off. Quantifies the claim in laketable.py's
ROWID_COL comment: lineage is FREE on the append/MOR path (ids are one
``first_row_id`` long per manifest entry, assigned at the commit choke
point — no data-side work) and costs one broadcast map join on
lineage READS plus materialized-column bytes on rewrite paths
(compact / COW). Prints one JSON line:

    python BENCH/profile_rowlineage.py [n_keys n_events n_batches]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from w3_data_etl_pipeline_spark import datagen  # noqa: E402
from w3_data_etl_pipeline_spark.plans.laketable import LakeTable  # noqa: E402
from w3_data_etl_pipeline_spark.schemas import SOURCE_FILES  # noqa: E402
from w3_data_etl_pipeline_spark.session import get_spark  # noqa: E402

from bench import _bench_workdir  # noqa: E402


def _run(spark, work, events, lineage: bool, n_keys: int, n_batches: int,
         n_events: int) -> dict:
    tag = "lineage" if lineage else "plain"
    table = LakeTable.create(
        spark, os.path.join(work, f"t_{tag}"), SOURCE_FILES, ["repo", "path"],
        n_buckets=64, row_lineage=lineage,
    )
    out: dict = {"variant": tag}

    t0 = time.time()
    table.overwrite(datagen.source_snapshot(spark, n_keys), lsn=0)
    out["snapshot_load_s"] = round(time.time() - t0, 3)

    per = n_events // n_batches
    t0 = time.time()
    for i in range(n_batches):
        lo = i * per + 1
        hi = (i + 1) * per if i < n_batches - 1 else n_events
        b = events.filter((events.lsn >= lo) & (events.lsn <= hi))
        table.merge(b, i + 1, mode="mor")
    out["mor_apply_s"] = round(time.time() - t0, 3)
    out["mor_eps"] = round(n_events / (time.time() - t0))

    t0 = time.time()
    table.compact()  # the rewrite that MATERIALIZES lineage
    out["compact_s"] = round(time.time() - t0, 3)

    # one COW batch: the carry window rides the existing bucket sort
    cow = events.filter(events.lsn <= per).withColumn(
        "lsn", events.lsn + n_events
    )
    t0 = time.time()
    table.merge(cow, n_batches + 1, mode="cow")
    out["cow_apply_s"] = round(time.time() - t0, 3)

    t0 = time.time()
    out["rows"] = table.read().count()
    out["read_plain_s"] = round(time.time() - t0, 3)
    if lineage:
        t0 = time.time()
        df = table.read(include_lineage=True)
        out["lineage_rows"] = df.count()
        out["read_lineage_s"] = round(time.time() - t0, 3)
        ids = df.selectExpr(
            "count(distinct _row_id) AS n", "count(*) AS m"
        ).collect()[0]
        assert ids["n"] == ids["m"], "row ids must be unique"
    out["table_bytes"] = sum(
        f.get("bytes") or 0 for f in table.snapshot()["files"]
    )
    return out


def main() -> None:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 400000
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    spark = get_spark("prof_rowlin", master="local[32]", shuffle_partitions=32)
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm

    work = _bench_workdir()
    events = datagen.change_events(spark, n_events, int(n_keys * 1.2)).persist()
    events.count()
    # interleave A/B/A/B to bracket host drift like profile_dml_mor
    runs = []
    for rep in range(2):
        for lineage in (False, True):
            runs.append(
                _run(spark, os.path.join(work, f"rep{rep}"), events, lineage,
                     n_keys, n_batches, n_events)
            )
    agg: dict = {"n_keys": n_keys, "n_events": n_events, "n_batches": n_batches}
    for tag in ("plain", "lineage"):
        per = [r for r in runs if r["variant"] == tag]
        agg[tag] = {
            k: round(min(r[k] for r in per), 3)
            for k in per[0]
            if isinstance(per[0][k], (int, float))
        }
    agg["mor_overhead_ratio"] = round(
        agg["lineage"]["mor_apply_s"] / agg["plain"]["mor_apply_s"], 3
    )
    agg["cow_overhead_ratio"] = round(
        agg["lineage"]["cow_apply_s"] / agg["plain"]["cow_apply_s"], 3
    )
    agg["compact_overhead_ratio"] = round(
        agg["lineage"]["compact_s"] / agg["plain"]["compact_s"], 3
    )
    print(json.dumps(agg))


if __name__ == "__main__":
    main()
