"""Streaming CDF source cost profile: drain an N-version lifecycle
through the Python DataSource stream and compare against the batch
``changes()`` path reading the same windows.

Usage: python BENCH/profile_stream_source.py [sf_dir] [versions]

Prints one JSON line:
  {"rows": R, "versions": N,
   "stream_wall_s": ..., "stream_rows_per_s": ...,
   "batch_wall_s": ...,  "ratio": stream/batch}

The comparison isolates the DataSource-API integration cost (python
worker round-trips, Arrow hops, per-trigger planning) from the diff
work itself — the batch path runs the SAME per-window diffs as
DataFrame jobs. Run in a healthy capacity window (bench.py probes).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from w3_data_etl_pipeline_spark.plans.laketable import LakeTable  # noqa: E402
from w3_data_etl_pipeline_spark.session import get_spark  # noqa: E402
from w3_data_etl_pipeline_spark.streaming.source import (  # noqa: E402
    LakeTableChangeSource,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n_versions = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "profile_stream_source", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.dataSource.register(LakeTableChangeSource)
    e = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "user_id", "event_id", "event_type", "value"
    )
    base = e.withColumn("lsn", F.col("event_id")).withColumn("op", F.lit("U"))
    work = tempfile.mkdtemp(prefix="prof_scdf_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    t = LakeTable.create(spark, f"{work}/t", schema, ["user_id"], n_buckets=32)

    # LIVE TAIL: the stream starts on the empty table FIRST (so the
    # per-version rate limit is in force — the cold-start first batch
    # is deliberately unlimited, see source.py) and the commits land
    # while it runs; stream wall therefore includes the commit work
    # itself, exactly like a production tail. The batch comparison
    # below replays the same per-version diffs afterwards.
    name = "prof_scdf_sink"
    q = (
        spark.readStream.format("laketable_cdf")
        .option("path", f"{work}/t")
        .option("maxVersionsPerTrigger", 1)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    while not q.recentProgress:
        time.sleep(0.1)  # rate-limit floor known after first trigger

    t0 = time.time()
    for i in range(n_versions):
        t.merge(
            base.filter(F.pmod(F.col("event_id"), F.lit(n_versions)) == i),
            i,
            mode="mor" if i % 2 else "cow",
        )
    cur = t.current_version()
    apply_wall = time.time() - t0

    batch_rows = 0
    windows = []
    for v in range(0, cur):
        n = t.changes(v, v + 1).count()
        windows.append(n)
        batch_rows += n

    deadline = time.time() + 600
    while time.time() < deadline:
        n = spark.sql(f"select count(*) c from {name}").collect()[0]["c"]
        if n >= batch_rows:
            break
        time.sleep(0.2)
    stream_wall = time.time() - t0
    got = spark.sql(f"select count(*) c from {name}").collect()[0]["c"]
    q.stop()

    # batch path: the same per-version windows as DataFrame jobs
    t0 = time.time()
    for v in range(0, cur):
        t.changes(v, v + 1).count()
    batch_wall = time.time() - t0
    print(
        json.dumps(
            {
                "rows": got,
                "expected_rows": batch_rows,
                "versions": cur,
                "stream_wall_s": round(stream_wall, 2),
                "apply_wall_s": round(apply_wall, 2),
                "stream_lag_s": round(stream_wall - apply_wall, 2),
                "batch_wall_s": round(batch_wall, 2),
                "ratio_vs_batch": round(
                    (stream_wall - apply_wall) / max(batch_wall, 1e-9), 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
