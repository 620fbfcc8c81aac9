"""Matched-pair write-side cost of merge-on-read DML vs copy-on-write
DML: two identical tables (same snapshot, same buckets, same session),
the same selective DELETE and UPDATE run against each — the only
variable is mode='cow' vs mode='mor'. Quantifies the claim in
delete_where's docstring: MOR write cost is ∝ matched rows, COW is
∝ touched-bucket bytes (and a key-column predicate touches EVERY
bucket, because keys hash across all of them). Also prints the honest
other side of the trade: post-DML read wall (the MOR resolve window)
and the compact() cost that closes it. One JSON line:

    python BENCH/profile_dml_mor.py [n_keys n_buckets content_max]
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
    """(files, bytes) added by the commits since ``before_paths``."""
    files = [f for f in table.snapshot()["files"] if f["path"] not in before_paths]
    return len(files), sum(f.get("bytes") or 0 for f in files)


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
    rows = (
        table.read().select("repo", "commit").orderBy("repo", "commit").take(100)
    )
    victim = rows[0]["repo"]
    # the update victim must survive the delete: take it from a later repo
    victim_commit = next(r["commit"] for r in rows if r["repo"] != victim)
    out: dict = {"mode": mode}

    before = {f["path"] for f in table.snapshot()["files"]}
    t0 = time.time()
    res = table.delete_where(f"repo = '{victim}'", mode=mode)
    out["delete_wall_s"] = round(time.time() - t0, 3)
    out["delete_rows"] = res["rows_changed"]
    out["delete_files"], out["delete_bytes"] = _added(table, before)

    before = {f["path"] for f in table.snapshot()["files"]}
    t0 = time.time()
    # point-update by a high-ndv VALUE column: min/max bounds admit
    # nearly every file (md5-random), so COW rewrites nearly the whole
    # table for ONE matched row — the worst case MOR exists to fix
    res = table.update_where(
        f"commit = '{victim_commit}'", {"lang": "'Vendored'"}, mode=mode
    )
    out["update_wall_s"] = round(time.time() - t0, 3)
    out["update_rows"] = res["rows_changed"]
    out["update_files"], out["update_bytes"] = _added(table, before)

    t0 = time.time()
    out["post_dml_rows"] = table.read().count()
    out["post_dml_read_wall_s"] = round(time.time() - t0, 3)

    t0 = time.time()
    table.compact()
    out["compact_wall_s"] = round(time.time() - t0, 3)
    t0 = time.time()
    assert table.read().count() == out["post_dml_rows"]
    out["post_compact_read_wall_s"] = round(time.time() - t0, 3)
    return out


def main() -> None:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    cmax = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
    spark = get_spark("profile_dml_mor", master="local[32]", shuffle_partitions=32)
    work = _bench_workdir()
    try:
        cow = _run(spark, work, "cow", n_keys, n_buckets, cmax)
        mor = _run(spark, work, "mor", n_keys, n_buckets, cmax)
        print(
            json.dumps(
                {
                    "metric": "dml_mor_vs_cow",
                    "n_keys": n_keys,
                    "n_buckets": n_buckets,
                    "content_max": cmax,
                    "cow": cow,
                    "mor": mor,
                    "delete_bytes_ratio": round(
                        cow["delete_bytes"] / max(mor["delete_bytes"], 1), 1
                    ),
                    "update_bytes_ratio": round(
                        cow["update_bytes"] / max(mor["update_bytes"], 1), 1
                    ),
                }
            )
        )
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
