"""Incremental join-view maintenance cost: per-sync wall vs a full
re-join, as single-bucket microbatches land on a large table.

The claim: sync cost tracks CHANGED BUCKET GROUPS, not table size —
a microbatch touching k of B buckets costs one SPJ over k groups plus
one merge of those groups' rows, while the naive alternative re-joins
the whole table per refresh. One JSON line:

    python BENCH/profile_joinview.py [n_keys n_batches keys_per_batch]
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

from w3_data_etl_pipeline_spark.plans.laketable import LakeTable  # noqa: E402
from w3_data_etl_pipeline_spark.session import get_spark  # noqa: E402
from w3_data_etl_pipeline_spark.streaming.joinview import (  # noqa: E402
    create_join_view,
    sync_join_view,
)

from bench import _bench_workdir  # noqa: E402

LS = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)
RS = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)


def main() -> None:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    per_batch = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("profile_jv", master=f"local[{cpus}]", shuffle_partitions=cpus)
    work = os.path.join(_bench_workdir(), f"jv_{os.getpid()}")
    os.makedirs(work, exist_ok=True)
    pairs = [("user_id", "c_custkey")]
    try:
        lt = LakeTable.create(spark, f"{work}/l", LS, ["user_id"], n_buckets=64)
        rt = LakeTable.create(spark, f"{work}/r", RS, ["c_custkey"], n_buckets=32)
        base = spark.range(n_keys).select(
            F.col("id").alias("user_id"),
            F.concat(F.lit("t"), (F.col("id") % 7).cast("string")).alias("event_type"),
            (F.col("id") % 97).cast("double").alias("value"),
            F.col("id").alias("lsn"),
            F.lit("U").alias("op"),
        )
        lt.merge(base, 0)
        rt.merge(
            spark.range(n_keys).select(
                F.col("id").alias("c_custkey"),
                F.concat(F.lit("s"), (F.col("id") % 5).cast("string")).alias("c_mktsegment"),
                F.col("id").alias("lsn"),
                F.lit("U").alias("op"),
            ),
            0,
        )
        view = create_join_view(lt, rt, f"{work}/v", on=pairs)
        t0 = time.monotonic()
        r0 = sync_join_view(lt, rt, view, on=pairs)
        full_sec = time.monotonic() - t0
        # group id of a key under the view layout: left bucket mod bc
        grp = F.pmod(F.xxhash64("user_id"), F.lit(64)) % 32
        seq = 0

        def run_series(localized: bool):
            nonlocal seq
            secs, grps = [], []
            for b in range(n_batches):
                seq += 1
                if localized:
                    # every key of the batch lives in ONE bucket group —
                    # the single-hot-entity shape (one repo, one tenant)
                    src = base.filter(grp == (b % 32)).limit(per_batch)
                else:
                    # uniformly-hashed keys: per_batch >> groups touches
                    # every group — the worst case, equal to full refresh
                    lo = (b * 7919) % (n_keys - per_batch)
                    src = base.filter(
                        (F.col("user_id") >= lo)
                        & (F.col("user_id") < lo + per_batch)
                    )
                batch = src.select(
                    "user_id",
                    F.lit(f"upd{seq}").alias("event_type"),
                    (F.col("value") + 1).alias("value"),
                    F.lit(10**9 + seq).alias("lsn"),
                    F.lit("U").alias("op"),
                )
                lt.merge(batch, seq, mode="mor")
                t0 = time.monotonic()
                r = sync_join_view(lt, rt, view, on=pairs)
                secs.append(round(time.monotonic() - t0, 3))
                grps.append(r["groups"])
            return secs, grps

        loc_secs, loc_groups = run_series(localized=True)
        sca_secs, sca_groups = run_series(localized=False)
        out = {
            "n_keys": n_keys,
            "per_batch": per_batch,
            "initial_full_sync_sec": round(full_sec, 3),
            "initial_groups": r0["groups"],
            "localized_sync_secs": loc_secs,
            "localized_groups": loc_groups,
            "localized_median_sec": sorted(loc_secs)[len(loc_secs) // 2],
            "scattered_sync_secs": sca_secs,
            "scattered_groups": sca_groups,
            "scattered_median_sec": sorted(sca_secs)[len(sca_secs) // 2],
            "rows_view": view.read().count(),
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
