"""Storage-partitioned join vs shuffle join on the same two tables.

The claim join_bucketed exists for: joining two LakeTables co-bucketed
on the join key should cost ZERO network movement — the usual plan
(Exchange both sides on the key, then SortMergeJoin) rewrites both
tables over the wire, and at 100 TB that Exchange IS the job. This
profile builds the north-rule source table (repo, path, commit, lang,
content) and a per-file metrics side table with the same keys and
bucket layout, runs the same aggregate over

  * shuffle: LakeTable.read() x2 -> DataFrame join -> agg
  * spj:     LakeTable.join_bucketed -> agg

and reports wall time, the exchange count lifted from each executed
plan (spj must plan 0 join exchanges; the final tiny agg exchange is
shared by both), and row-count equality of the two paths.

One JSON line:

    python BENCH/profile_spj.py [n_keys n_buckets content_max reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from w3_data_etl_pipeline_spark import datagen  # noqa: E402
from w3_data_etl_pipeline_spark.plans.laketable import LakeTable  # noqa: E402
from w3_data_etl_pipeline_spark.schemas import SOURCE_FILES  # noqa: E402
from w3_data_etl_pipeline_spark.session import get_spark  # noqa: E402

from bench import _bench_workdir  # noqa: E402

METRICS = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("n_lines", T.LongType()),
    ]
)


def _exchanges(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count("Exchange")


def _agg(df):
    return df.agg(
        F.count("*").alias("n"),
        F.sum("n_bytes").alias("bytes"),
        F.countDistinct("lang").alias("langs"),
    )


def main() -> None:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cmax = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("profile_spj", master=f"local[{cpus}]", shuffle_partitions=cpus)
    work = os.path.join(_bench_workdir(), f"spj_{os.getpid()}")
    os.makedirs(work, exist_ok=True)
    try:
        snap = datagen.source_snapshot(spark, n_keys, content_max=cmax).cache()
        snap.count()
        left = LakeTable.create(
            spark, f"{work}/l", SOURCE_FILES, ["repo", "path"], n_buckets=n_buckets
        )
        left.overwrite(snap, lsn=0)
        right = LakeTable.create(
            spark, f"{work}/r", METRICS, ["repo", "path"], n_buckets=n_buckets
        )
        right.overwrite(
            snap.select(
                "repo",
                "path",
                F.length("content").cast("long").alias("n_bytes"),
                (F.length("content") - F.length(F.replace(F.col("content"), F.lit("\n"), F.lit(""))) + 1)
                .cast("long")
                .alias("n_lines"),
            ),
            lsn=0,
        )
        snap.unpersist()

        def shuffle_join():
            return _agg(left.read().join(right.read(), ["repo", "path"]))

        def spj():
            # explicit projection: the Python DataSource API has no
            # pruneColumns hook, so unlike the JVM path Catalyst can't
            # shrink the scan for us
            return _agg(left.join_bucketed(right, select=["n_bytes", "lang"]))

        out = {"n_keys": n_keys, "n_buckets": n_buckets, "content_max": cmax}
        results = {}
        for name, fn in (("shuffle", shuffle_join), ("spj", spj)):
            best, rows = None, None
            for _ in range(reps):
                t0 = time.monotonic()
                rows = fn().collect()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            results[name] = rows[0].asDict()
            out[f"{name}_sec"] = round(best, 3)
            out[f"{name}_exchanges"] = _exchanges(fn())
        out["equal"] = results["shuffle"] == results["spj"]
        out["speedup"] = round(out["shuffle_sec"] / out["spj_sec"], 2)
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
