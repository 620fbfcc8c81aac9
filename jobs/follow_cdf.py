"""spark-submit entrypoint for a change-feed follower: keep a derived
LakeTable in sync with an upstream LakeTable's change feed,
exactly-once (streaming/follow.py). Third leg of the deployment
triad — run_cdc.py ingests, maintain.py operates, follow_cdf.py
derives:

    tools/submit.sh --master local[8] -- \
        jobs/follow_cdf.py --src /data/lake/repos --dst /data/lake/py_only \
        --filter-sql "repo LIKE 'py/%'" --drain

The downstream table's own ledger is the offset store, so there is no
checkpoint argument: kill the job anywhere and rerun the same command
line — applied upstream versions no-op through the ledger. --filter-sql
must use key-stable predicates only (see streaming/follow.py).
"""

from __future__ import annotations

import argparse
import json
import sys

from w3_data_etl_pipeline_spark.plans.laketable import LakeTable
from w3_data_etl_pipeline_spark.session import get_spark
from w3_data_etl_pipeline_spark.streaming.follow import (
    applied_source_version,
    follow_changes,
)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="LakeTable change-feed follower")
    p.add_argument("--src", required=True, help="upstream LakeTable root")
    p.add_argument("--dst", required=True, help="derived LakeTable root (created "
                   "if absent, with the upstream schema and key columns)")
    p.add_argument("--filter-sql", help="key-stable SQL predicate applied to the "
                   "change rows (e.g. \"repo LIKE 'py/%%'\")")
    p.add_argument("--select", nargs="*", help="value columns to keep downstream "
                   "(default: all)")
    p.add_argument("--buckets", type=int, default=None,
                   help="downstream bucket count (default: upstream's)")
    p.add_argument("--max-versions-per-batch", type=int, default=8)
    p.add_argument("--poll-interval", type=float, default=2.0)
    p.add_argument("--max-polls", type=int, default=None)
    p.add_argument("--drain", action="store_true",
                   help="stop when caught up instead of polling")
    args = p.parse_args(argv)

    spark = get_spark("follow-cdf")
    src = LakeTable(spark, args.src)
    snap = src.snapshot()
    keys = snap["key_cols"]
    import os

    if os.path.isdir(os.path.join(args.dst, "_meta")):
        dst = LakeTable(spark, args.dst)
    else:
        schema = src.schema(snap)
        if args.select:
            from pyspark.sql import types as T

            keep = set(keys) | set(args.select)
            schema = T.StructType([f for f in schema.fields if f.name in keep])
        dst = LakeTable.create(
            spark, args.dst, schema, keys,
            n_buckets=args.buckets or snap["n_buckets"],
        )

    transform = None
    if args.filter_sql or args.select:
        from pyspark.sql import functions as F

        def transform(df):  # noqa: F811
            if args.filter_sql:
                df = df.filter(F.expr(args.filter_sql))
            if args.select:
                extra = [c for c in args.select if c not in keys]
                df = df.select(*keys, *extra, "_change_type")
            return df

    totals = follow_changes(
        src, dst, transform=transform,
        max_versions_per_batch=args.max_versions_per_batch,
        poll_interval=args.poll_interval,
        max_polls=args.max_polls,
        stop_when_caught_up=args.drain,
    )
    print(json.dumps({
        "verb": "follow",
        **totals,
        "resume_point": applied_source_version(dst),
        "dst_version": dst.current_version(),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
