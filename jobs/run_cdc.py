"""spark-submit entrypoint for the CDC ingest stream (north rule:
"run via spark-submit --py-files on a multi-executor cluster").

Packs the whole engine behind one cluster-launchable job: bootstrap
(optional) + WAL tail -> enrich -> dedup -> MERGE -> lineage, with the
checkpoint + ledger giving kill/resume exactly-once. The master is
NOT set here — it comes from spark-submit, so the identical command
line works on local[N], YARN, or k8s:

    tools/submit.sh --master local[8] -- \
        --table /data/lake/repos --events-dir /data/wal \
        --checkpoint /data/ckpt --mode mor --auto-compact 8

Replaces the reference's Airflow-triggered batch DAG entry
(reference src/dags/w3c.py:49-54) with a single resumable stream job.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import SparkSession  # noqa: F401 (type hints)

from w3_data_etl_pipeline_spark.plans.laketable import LakeTable
from w3_data_etl_pipeline_spark.schemas import CHANGE_EVENTS, SOURCE_FILES
from w3_data_etl_pipeline_spark.streaming.cdc import run_stream


def _get_or_create_table(spark: SparkSession, path: str, n_buckets: int) -> LakeTable:
    meta = os.path.join(path, "_meta")
    if os.path.isdir(meta):
        return LakeTable(spark, path)
    return LakeTable.create(spark, path, SOURCE_FILES, ["repo", "path"], n_buckets=n_buckets)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="CDC WAL tail -> LakeTable upsert")
    p.add_argument("--table", required=True, help="LakeTable root (created if absent)")
    p.add_argument("--events-dir", required=True, help="parquet WAL segment directory")
    p.add_argument("--checkpoint", required=True, help="streaming checkpoint dir")
    p.add_argument("--bootstrap", help="optional parquet snapshot to overwrite as initial state")
    p.add_argument("--mode", choices=["cow", "mor"], default="cow")
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument("--max-files-per-trigger", type=int, default=4)
    p.add_argument("--salt-partitions", type=int, default=None, help="salted repartition for hot-repo skew")
    p.add_argument("--auto-compact", type=int, default=None, help="fold buckets crossing N deltas (mor)")
    p.add_argument("--auto-compact-rows", type=int, default=None,
                   help="fold buckets crossing N pending delta ROWS (manifest stats; ORs with --auto-compact)")
    p.add_argument("--expire-keep", type=int, default=None, help="retain only last N snapshots")
    p.add_argument("--lineage-compact-every", type=int, default=None,
                   help="consolidate lineage audit files every N applied batches")
    p.add_argument("--no-enrich", action="store_true")
    p.add_argument("--quarantine-dir", default=None,
                   help="dead-letter sink for malformed events (per-batch overwrite)")
    p.add_argument("--no-patch-probe", action="store_true",
                   help="source sends full images only: skip the per-batch op='P' probe")
    p.add_argument("--audit-predicate", default=None,
                   help="SQL boolean every staged row must satisfy "
                        "(write-audit-publish: the batch is staged, the "
                        "batch-scope view is checked, and a violation "
                        "abandons the stage and dead-letters the batch "
                        "under <quarantine-dir>/rejected/ without burning "
                        "the exactly-once ledger), e.g. "
                        "\"content IS NOT NULL AND length(content) < 1048576\"")
    args = p.parse_args(argv)

    # master/deploy-mode/executors come from spark-submit (its
    # launcher puts them in the default SparkConf); only session-level
    # semantics (UTC, Arrow, AQE, shuffle sizing) are pinned here
    from pyspark import SparkConf

    from w3_data_etl_pipeline_spark.session import get_spark

    spark = get_spark("cdc_ingest", master=SparkConf().get("spark.master", None))
    try:
        table = _get_or_create_table(spark, args.table, args.buckets)
        if args.bootstrap and table.current_version() == 0:
            table.overwrite(spark.read.parquet(args.bootstrap), lsn=0)
        audit = None
        if args.audit_predicate:
            from pyspark.sql import functions as F

            pred = args.audit_predicate

            def audit(df, _p=pred):  # noqa: E731 - closure over the CLI predicate
                return df.filter(~F.expr(_p)).isEmpty()

        run = run_stream(
            spark,
            table,
            args.events_dir,
            args.checkpoint,
            CHANGE_EVENTS,
            max_files_per_trigger=args.max_files_per_trigger,
            enrich=not args.no_enrich,
            salt_partitions=args.salt_partitions,
            mode=args.mode,
            auto_compact_deltas=args.auto_compact,
            auto_compact_delta_rows=args.auto_compact_rows,
            expire_keep=args.expire_keep,
            quarantine_dir=args.quarantine_dir,
            lineage_compact_every=args.lineage_compact_every,
            patches=False if args.no_patch_probe else "auto",
            audit=audit,
        )
        applied = sum(1 for s in run.stats if s.applied)
        rejected = sum(1 for s in run.stats if s.rejected)
        out = {
            "batches": len(run.stats),
            "applied": applied,
            "rejected": rejected,
            "replayed_noops": len(run.stats) - applied - rejected,
            "events": sum(s.deduped_rows for s in run.stats),
            "table_version": table.current_version(),
            # O(metadata) post-run table summary (manifest stats)
            "table_stats": table.stats(),
        }
        print(json.dumps(out))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
