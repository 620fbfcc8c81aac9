"""Per-phase scaling diagnosis: times each CDC pipeline stage at one
parallelism level. Run sequentially at 8 and 32 to find which stage
fails to scale.

Usage: python BENCH/phase_scaling.py <cores>
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

N_KEYS = 250_000
N_EVENTS = 1_000_000


def main() -> None:
    cores = int(sys.argv[1])
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

    from pyspark.sql import functions as F

    from w3_data_etl_pipeline_spark import datagen
    from w3_data_etl_pipeline_spark.functions.enrich import enrich_changes
    from w3_data_etl_pipeline_spark.operators.dedupe import latest_by_key
    from w3_data_etl_pipeline_spark.plans.laketable import LakeTable
    from w3_data_etl_pipeline_spark.schemas import SOURCE_FILES
    from w3_data_etl_pipeline_spark.session import get_spark

    extra = {"spark.local.dir": "/dev/shm/spark-local-ph"} if os.path.isdir("/dev/shm") else {}
    spark = get_spark(f"ph{cores}", master=f"local[{cores}]", shuffle_partitions=cores, extra_conf=extra)
    spark.range(10_000_000).selectExpr("sum(id)").collect()

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="phase_", dir=base)
    res: dict[str, float] = {}
    try:
        t = time.time()
        snap_df = datagen.source_snapshot(spark, N_KEYS)
        table = LakeTable.create(
            spark, os.path.join(work, "t"), SOURCE_FILES, ["repo", "path"], n_buckets=64
        )
        table.overwrite(snap_df, lsn=0)
        res["t_snapshot_write"] = time.time() - t

        t = time.time()
        events = datagen.change_events(spark, N_EVENTS, int(N_KEYS * 1.2)).persist()
        n = events.count()
        res["t_gen_persist"] = time.time() - t

        t = time.time()
        enr = enrich_changes(events).persist()
        enr.count()
        res["t_enrich"] = time.time() - t

        snap = table.snapshot()
        t = time.time()
        dd = latest_by_key(enr, ["repo", "path"], ["lsn", "commit"]).withColumn(
            "_bucket", table._bucket_expr(snap)
        ).persist()
        dd.count()
        res["t_dedup"] = time.time() - t

        t = time.time()
        dd.groupBy("_bucket").agg(
            F.min("lsn"), F.max("lsn"), F.count("*")
        ).collect()
        res["t_lineage_collect"] = time.time() - t

        phys = table._phys_schema(snap)
        t = time.time()
        tgt = table._read_files([f["path"] for f in snap["files"]], phys).drop("_op")
        tgt.count()
        res["t_tgt_read"] = time.time() - t

        keys = ["repo", "path"]
        value_cols = [
            f_.name for f_ in table.schema(snap).fields if f_.name not in keys and f_.name != "_lsn"
        ]
        ev = dd.select(
            *[F.col(k).alias(f"_ev_{k}") for k in keys],
            F.col("lsn").alias("_ev_lsn"),
            F.col("op").alias("_ev_op"),
            *[(F.col(c) if c in dd.columns else F.lit(None)).alias(f"_ev_{c}") for c in value_cols],
        )
        cond = [tgt[k].eqNullSafe(ev[f"_ev_{k}"]) for k in keys]
        j = tgt.join(ev, cond, "full_outer")
        take_ev = ev["_ev_lsn"].isNotNull() & (tgt["_lsn"].isNull() | (ev["_ev_lsn"] >= tgt["_lsn"]))
        deleted = take_ev & (ev["_ev_op"] == "D")
        merged = j.filter(~deleted).select(
            *[F.when(take_ev, ev[f"_ev_{k}"]).otherwise(tgt[k]).alias(k) for k in keys],
            *[F.when(take_ev, ev[f"_ev_{c}"]).otherwise(tgt[c]).alias(c) for c in value_cols],
            F.when(take_ev, ev["_ev_lsn"]).otherwise(tgt["_lsn"]).alias("_lsn"),
        )
        t = time.time()
        out = os.path.join(work, "out")
        par = spark.sparkContext.defaultParallelism
        (
            merged.withColumn("_bucket", table._bucket_expr(snap))
            .repartition(max(1, min(64, par)), "_bucket")
            .write.partitionBy("_bucket")
            .mode("overwrite")
            .parquet(out)
        )
        res["t_join_write"] = time.time() - t

        print(json.dumps({"cores": cores, "rows": n, **{k: round(v, 2) for k, v in res.items()}}))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
