"""Sustained long-replay CDC evidence (north rule: "replaying the
full change stream — including mid-stream kill/resume from checkpoint
— and asserting per-row sha256(content) equality against the final
table state").

Drives N microbatches (default 64 x 1M events = 64M change events,
~3 decades below the 10^10 target but 16x the per-round driver bench)
through the REAL maintenance loop — MOR merge + hot-bucket compaction
+ snapshot expiry + lineage compaction — with:

  * a mid-stream KILL: at the halfway batch the table handle is
    dropped and the table re-opened cold from disk (fresh manifest
    cache — process-restart semantics), then the PREVIOUS batch is
    replayed with its original batch_id and asserted a ledger no-op
    before the stream continues;
  * per-batch apply wall recorded, with first-vs-last-quartile growth
    ratio (a creeping O(history) term shows as last >> first);
  * final-state verification OUTSIDE the engine: DuckDB recomputes
    last-writer-wins over the staged genesis snapshot + every WAL
    segment and FULL OUTER JOINs per-key sha256(content) against the
    engine's final table — mismatches must be zero.

Events are staged as parquet WAL segments outside the timed region
(what a binlog tailer delivers). content_max defaults to 512 so the
64M-event staging fits comfortably in /dev/shm; the per-event byte
cost at 4KB content is covered by bench.py's pinned configs.

Usage: python BENCH/marathon_cdc.py [n_batches] [per_batch] [n_keys] [cores]
Prints one JSON line per batch plus a final summary line.
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
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    n_keys = int(sys.argv[3]) if len(sys.argv) > 3 else 500_000
    cores = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    import duckdb

    from run_scaling_bracketed import host_capacity
    from w3_data_etl_pipeline_spark import datagen
    from w3_data_etl_pipeline_spark.plans.laketable import LakeTable
    from w3_data_etl_pipeline_spark.schemas import SOURCE_FILES
    from w3_data_etl_pipeline_spark.session import get_spark
    from w3_data_etl_pipeline_spark.streaming.cdc import apply_batch

    spark = get_spark(
        "marathon_cdc", master=f"local[{cores}]", shuffle_partitions=2 * cores
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JIT warm

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="marathon_cdc_", dir=base)
    cap_before = round(host_capacity(), 1)
    try:
        content_max = 512
        snap = datagen.source_snapshot(spark, n_keys, content_max=content_max)
        snap_dir = os.path.join(work, "snap")
        snap.write.mode("overwrite").parquet(snap_dir)

        root = os.path.join(work, "t")
        table = LakeTable.create(spark, root, SOURCE_FILES, ["repo", "path"], n_buckets=64)
        table.overwrite(spark.read.parquet(snap_dir), lsn=0)

        # single-pass staging: per-segment filter writes would regenerate
        # the full stream once per segment (O(n_batches * n_events))
        from pyspark.sql import functions as F

        events = datagen.change_events(
            spark, n_batches * per_batch, int(n_keys * 1.2), content_max=content_max
        )
        wal_root = os.path.join(work, "wal")
        events.withColumn(
            "seg", ((F.col("lsn") - 1) / per_batch).cast("long")
        ).write.partitionBy("seg").mode("overwrite").parquet(wal_root)
        segs = [os.path.join(wal_root, f"seg={i}") for i in range(n_batches)]

        def apply_one(tbl: LakeTable, i: int):
            return apply_batch(
                tbl,
                spark.read.parquet(segs[i]),
                i,
                enrich=True,
                mode="mor",
                auto_compact_deltas=8,
                expire_keep=2,
                lineage_compact_every=8,
            )

        walls, kill_events = [], []
        for i in range(n_batches):
            if i == n_batches // 2:
                # mid-stream kill: drop the handle, re-open cold from
                # disk, replay the previous batch — the exactly-once
                # ledger must make it a no-op, not a double-apply
                del table
                table = LakeTable(spark, root)
                st = apply_one(table, i - 1)
                assert st.applied is False, f"replay of batch {i-1} re-applied!"
                kill_events.append(
                    {"killed_before_batch": i, "replayed": i - 1, "noop": True}
                )
            t0 = time.time()
            st = apply_one(table, i)
            wall = time.time() - t0
            assert st.applied is True
            walls.append(wall)
            print(
                json.dumps(
                    {
                        "batch": i,
                        "wall_s": round(wall, 3),
                        "eps": round(per_batch / wall),
                        "version": st.version,
                        "skew_prereduced": st.skew_prereduced,
                    }
                ),
                flush=True,
            )

        # ---- final-state verification outside the engine ----
        final_dir = os.path.join(work, "engine_final")
        table.read().selectExpr(
            "repo", "path", "sha2(content, 256) AS sha"
        ).write.mode("overwrite").parquet(final_dir)

        con = duckdb.connect()
        con.execute(f"SET threads={max(4, cores // 2)}")
        mismatch, e_cnt, o_cnt = con.execute(
            f"""
            WITH ev AS (
              SELECT repo, path, lsn, op, content
              FROM read_parquet('{wal_root}/seg=*/*.parquet')
            ),
            base AS (
              SELECT repo, path, lsn, 'I' AS op, content
              FROM read_parquet('{snap_dir}/*.parquet')
            ),
            allr AS (SELECT * FROM ev UNION ALL SELECT * FROM base),
            oracle AS (
              SELECT repo, path,
                     arg_max(op, lsn) AS op,
                     sha256(arg_max(content, lsn)) AS sha
              FROM allr GROUP BY repo, path
            ),
            o AS (SELECT repo, path, sha FROM oracle WHERE op <> 'D'),
            e AS (SELECT repo, path, sha FROM read_parquet('{final_dir}/*.parquet'))
            SELECT
              (SELECT count(*) FROM o FULL OUTER JOIN e USING (repo, path)
                WHERE o.sha IS DISTINCT FROM e.sha) AS mismatches,
              (SELECT count(*) FROM e) AS engine_rows,
              (SELECT count(*) FROM o) AS oracle_rows
            """
        ).fetchone()

        k = max(1, n_batches // 4)
        total_wall = sum(walls)
        summary = {
            "summary": "sustained CDC replay with kill/resume + sha256 final-state equality",
            "n_events": n_batches * per_batch,
            "n_batches": n_batches,
            "n_keys": n_keys,
            "cores": cores,
            "mode": "mor+auto_compact8+expire2+lineage_compact8+enrich",
            "sustained_eps": round(n_batches * per_batch / total_wall),
            "apply_wall_s": round(total_wall, 1),
            "first_quartile_mean_s": round(sum(walls[:k]) / k, 3),
            "last_quartile_mean_s": round(sum(walls[-k:]) / k, 3),
            "growth_ratio": round((sum(walls[-k:]) / k) / (sum(walls[:k]) / k), 3),
            "kill_resume": kill_events,
            "sha256_mismatches": mismatch,
            "engine_rows": e_cnt,
            "oracle_rows": o_cnt,
            "cap_before_M": cap_before,
            "cap_after_M": round(host_capacity(), 1),
        }
        print(json.dumps(summary), flush=True)
        return 0 if mismatch == 0 and e_cnt == o_cnt else 1
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
