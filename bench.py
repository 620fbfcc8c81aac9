"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the CDC
apply-throughput microbench (the north metric), and prints ONE JSON
line: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {name: sec}, "sf": ..., "cdc_events_per_sec": ...}.

Scaling-efficiency evidence (local[8] vs local[32]) lives in
BENCH/run_scaling.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The 20-query headline set is FROZEN at round 1's composition so the
# driver's BENCH_r{N} totals stay longitudinally comparable round over
# round; new round-3 capabilities are timed in EXTENDED and reported
# under separate JSON keys (queries_extended / value_extended).
HEADLINE = [
    "q1_pricing_summary",
    "star_join_revenue",
    "fact_build_star",
    "price_banding",
    "max_lsn_dedup",
    "topk_orders_per_segment",
    "exact_dedup_docs",
    "token_counts_docs",
    "quality_docs",
    "fingerprint_docs",
    "embedding_cosine_topk",
    "minhash_lsh_pairs",
    "simhash_docs",
    "path_normalize_synthetic",
    "ua_enrich_traffic",
    "range_join_bands",
    "distinct_users_by_type",
    "asof_click_attribution",
    "tumbling_window_counts",
    "rollup_orders",
]

EXTENDED = [
    "text_signals_docs",
    "tfidf_top_terms",
    "neardup_clusters",
    "token_budget_sample",
    "stateful_running_state",
    "cdc_lineage_audit",
    "paragraph_dedup_docs",
    "range_frame_weekly_revenue",
    "unpivot_charge_components",
    # round 4: file skipping, field-id evolution, real-codec media,
    # write-audit-publish
    "cdc_clustered_file_skip",
    "cdc_rename_evolution",
    "media_features",
    "cdc_wap_publish",
    "cdc_eq_skip",
    "cdc_zorder_skip",
    # round 4 tail: row-level DML + generic MERGE INTO
    "cdc_delete_update",
    "cdc_merge_into",
    # round 4 late: runtime join-key file pruning (DPP analogue) +
    # change-feed follower pipeline
    "cdc_join_prune",
    "cdc_follow_pipeline",
    # round 4 resumed session: positional deletion vectors, standing
    # write order, ANALYZE TABLE
    "cdc_delete_dv",
    "cdc_write_order",
    "cdc_analyze",
    # round 4 second resume: MOR MERGE INTO, NOT-MATCHED-BY-SOURCE
    # sync merge, SQL front-end, streaming CDF source
    "cdc_merge_into_mor",
    "cdc_merge_sync",
    "cdc_sql_surface",
    "cdc_stream_cdf",
    "cdc_batch_read",
    # round 4 third resume: storage-partitioned join, shallow clone,
    # incrementally-maintained join view
    "cdc_bucket_join",
    "cdc_clone",
    "cdc_join_view",
    "cdc_generated_col",
    # round 5: partition-spec pruning, session windows (the real-JPEG
    # gate jpeg_media_features stays registry/tail-gated but out of the
    # bench list: its wall is per-doc Python codec work by design)
    "cdc_partition_prune",
    "session_windows_user",
]


def _bench_workdir() -> str:
    """RAM-backed when available: the sandbox has ONE virtio disk whose
    ext4 write path degrades ~2.6x under 32 concurrent writers (a real
    cluster has per-executor local disks), so table/shuffle I/O on it
    measures the sandbox, not the engine."""
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    return tempfile.mkdtemp(prefix="bench_cdc_", dir=base)


def bench_cdc(
    spark,
    n_keys: int = 500000,
    n_events: int = 4000000,
    n_batches: int = 4,
    mode: str = "cow",
    content_max: int = 4096,
    enrich: bool = True,
    hot_key_frac: float = 0.0,
) -> float:
    """events/sec through enrich + fused-dedup bucketed MERGE commits
    (batch mode: measures the engine apply path without file-stream
    overhead). Sized so the ~1s/batch fixed term (driver plan build +
    job scheduling + snapshot commit) is <5% of wall — 1M events
    per microbatch, the regime a real binlog tailer runs in."""
    from w3_data_etl_pipeline_spark import datagen
    from w3_data_etl_pipeline_spark.plans.laketable import LakeTable
    from w3_data_etl_pipeline_spark.schemas import SOURCE_FILES
    from w3_data_etl_pipeline_spark.streaming.cdc import apply_batch

    work = _bench_workdir()
    try:
        snap = datagen.source_snapshot(spark, n_keys, content_max=content_max)
        table = LakeTable.create(spark, os.path.join(work, "t"), SOURCE_FILES, ["repo", "path"], n_buckets=64)
        table.overwrite(snap, lsn=0)
        # materialize each microbatch slice OUTSIDE the timed region as
        # parquet WAL segments (exactly what the streaming source
        # delivers). NOT .persist(): reading Spark's columnar cache
        # with 2KB strings serializes at high thread counts (measured
        # 12-18x slowdown at 32 threads vs an identical parquet scan —
        # G1 humongous-allocation churn in cache-batch decompression),
        # which benchmarks the cache, not the engine.
        events = datagen.change_events(
            spark, n_events, int(n_keys * 1.2), content_max=content_max
        )
        if hot_key_frac:
            # adversarial hot KEY: this fraction of the stream lands on
            # one (repo, path) — the worst case for the bucket shuffle
            # (a hot key is indivisible storage-side, exactly like one
            # Kafka partition key)
            from pyspark.sql import functions as F

            hot = F.pmod(F.col("lsn"), F.lit(int(round(1 / hot_key_frac)))) == 0
            events = events.withColumn(
                "repo", F.when(hot, F.lit("org0/hotrepo")).otherwise(F.col("repo"))
            ).withColumn(
                "path", F.when(hot, F.lit("src/hot.rs")).otherwise(F.col("path"))
            )
        per = n_events // n_batches
        batches = []
        for i in range(n_batches):
            lo, hi = i * per + 1, (i + 1) * per if i < n_batches - 1 else n_events
            seg = os.path.join(work, f"wal_{i}")
            events.filter((events.lsn >= lo) & (events.lsn <= hi)).write.mode(
                "overwrite"
            ).parquet(seg)
            batches.append(spark.read.parquet(seg))
        t0 = time.time()
        for i, b in enumerate(batches):
            # patches=False: this synthetic source sends full images by
            # construction, so skip the per-batch partial-image probe
            # (~0.2s/1M-row batch, 3-6% of apply wall) — also keeps the
            # metric comparable with rounds 1-2, which predate patches
            apply_batch(table, b, i, enrich=enrich, salt_partitions=None, mode=mode, patches=False)
        dt = time.time() - t0
        return n_events / dt
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _capacity() -> "float | None":
    """Pure-CPU host probe (Mmd5/s over 8 processes) — the same probe
    the scaling harness brackets with. Run at START and END so any
    reader can see whether the shared-host window drifted DURING the
    run (the round-4 lesson: it regularly does)."""
    try:
        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
        )
        from run_scaling_bracketed import host_capacity

        return round(host_capacity(), 1)
    except Exception:
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    cap_pre = _capacity()

    from w3_data_etl_pipeline_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus))

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    # JVM/codegen warmup on a trivial action
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        _ = n
    timings_ext: dict[str, float] = {}
    for name in EXTENDED:
        fn = qs[name]
        t0 = time.time()
        _ = fn(spark, sf_dir).count()
        timings_ext[name] = round(time.time() - t0, 3)
    # second, warm pass over the headline set (JIT + page cache
    # steady): reported under its own key — `value` keeps the
    # single-cold-run semantics rounds 1-2 used, `value_warm` is the
    # steady-state number a long-running service would see and is far
    # less sensitive to this sandbox's variable host windows.
    timings_warm: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        _ = fn(spark, sf_dir).count()
        timings_warm[name] = round(time.time() - t0, 3)
    cdc_caps: dict = {}
    if os.environ.get("SPARK_GRAFT_SKIP_CDC"):
        # scale-escalation runs (BENCH/make_sfN.py) time the query set
        # only; the CDC microbench is sf-independent
        cdc_eps = cdc_eps_mor = cdc_eps_mor_hot = 0.0
    else:
        # per-leg capacity brackets: the shared host drifts FASTER than
        # a whole-run probe pair resolves (measured: both run-level
        # probes >= 12 while the CDC legs ran in a <9 trough), so each
        # north-metric leg records the window it actually saw
        c0 = _capacity()
        cdc_eps = bench_cdc(spark, mode="cow")
        c1 = _capacity()
        cdc_eps_mor = bench_cdc(spark, mode="mor")
        c2 = _capacity()
        # skew datapoint: 50% of events on ONE (repo, path)
        cdc_eps_mor_hot = bench_cdc(spark, mode="mor", hot_key_frac=0.5)
        c3 = _capacity()
        cdc_caps = {"cow": [c0, c1], "mor": [c1, c2], "hot": [c2, c3]}
    total = round(sum(timings.values()), 3)
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    # pure-CPU host probe (Mmd5/s across 8 processes, same probe the
    # scaling harness brackets with): lets any reader normalize this
    # run for the sandbox's shared-host capacity window (healthy >= 12;
    # see BENCH/BASELINE.md).
    cap = _capacity()
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_extended": timings_ext,
                "value_extended": round(sum(timings_ext.values()), 3),
                "queries_warm": timings_warm,
                "value_warm": round(sum(timings_warm.values()), 3),
                "host_capacity_mmd5": cap,
                "host_capacity_mmd5_pre": cap_pre,
                "cdc_capacity_brackets": cdc_caps,
                "sf": sf,
                "cdc_events_per_sec": round(cdc_eps, 1),
                "cdc_events_per_sec_mor": round(cdc_eps_mor, 1),
                "cdc_events_per_sec_mor_hotkey": round(cdc_eps_mor_hot, 1),
                "cpus": int(cpus),
            }
        )
    )


if __name__ == "__main__":
    main()
