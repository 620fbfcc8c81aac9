"""Matched-triple delete cost: copy-on-write vs equality-tombstone MOR
vs positional deletion vectors. Three identical tables (same snapshot,
same buckets, same session), the same selective DELETE against each —
the only variable is the mode. Quantifies the two claims mode='dv'
exists for:

* WRITE: dv bytes ∝ masked POSITIONS (a file key + a long per row) —
  smaller than MOR's per-key tombstone images and orders of magnitude
  under COW's touched-bucket rewrite.
* READ: the dv mask is a broadcast anti-join, so the post-delete full
  read plans NO shuffle exchange; MOR tombstones force a key-hash
  exchange (max-LSN resolution) on every read until compaction. The
  JSON reports `read_shuffles` per mode straight from the executed
  plan — at 100 TB that exchange is the whole difference.

One JSON line:

    python BENCH/profile_dv.py [n_keys n_buckets content_max]
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


def _added(table: LakeTable, before_paths: set) -> tuple[int, int]:
    files = [f for f in table.snapshot()["files"] if f["path"] not in before_paths]
    return len(files), sum(f.get("bytes") or 0 for f in files)


def _shuffles(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")


def _run(spark, work, mode: str, n_keys: int, n_buckets: int, cmax: int) -> dict:
    table = LakeTable.create(
        spark,
        os.path.join(work, f"t_{mode}"),
        SOURCE_FILES,
        ["repo", "path"],
        n_buckets=n_buckets,
    )
    table.overwrite(
        datagen.source_snapshot(spark, n_keys, content_max=cmax), lsn=0
    )
    victim = table.read().select("repo").orderBy("repo").first()["repo"]
    out: dict = {"mode": mode}

    before = {f["path"] for f in table.snapshot()["files"]}
    t0 = time.time()
    res = table.delete_where(f"repo = '{victim}'", mode=mode)
    out["delete_wall_s"] = round(time.time() - t0, 3)
    out["delete_rows"] = res["rows_changed"]
    out["delete_files"], out["delete_bytes"] = _added(table, before)

    post = table.read()
    out["read_shuffles"] = _shuffles(post)
    t0 = time.time()
    out["post_rows"] = post.count()
    out["post_read_wall_s"] = round(time.time() - t0, 3)

    t0 = time.time()
    table.compact()
    out["compact_wall_s"] = round(time.time() - t0, 3)
    assert table.read().count() == out["post_rows"]
    return out


def main() -> None:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    cmax = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
    spark = get_spark("profile_dv", master="local[32]", shuffle_partitions=32)
    work = _bench_workdir()
    try:
        cow = _run(spark, work, "cow", n_keys, n_buckets, cmax)
        mor = _run(spark, work, "mor", n_keys, n_buckets, cmax)
        dv = _run(spark, work, "dv", n_keys, n_buckets, cmax)
        print(
            json.dumps(
                {
                    "metric": "dv_vs_mor_vs_cow_delete",
                    "n_keys": n_keys,
                    "n_buckets": n_buckets,
                    "content_max": cmax,
                    "cow": cow,
                    "mor": mor,
                    "dv": dv,
                    "bytes_cow_over_dv": round(
                        cow["delete_bytes"] / max(dv["delete_bytes"], 1), 1
                    ),
                    "bytes_mor_over_dv": round(
                        mor["delete_bytes"] / max(dv["delete_bytes"], 1), 2
                    ),
                }
            )
        )
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
