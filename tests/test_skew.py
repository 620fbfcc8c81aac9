"""Salted repartition: breaks hot-key concentration that a plain
key-hash partitioning would create (north rule: 'salted
repartitioning to break hot-repo skew')."""

from __future__ import annotations

from pyspark.sql import functions as F

from w3_data_etl_pipeline_spark import datagen
from w3_data_etl_pipeline_spark.operators.skew import salted_repartition


def _partition_sizes(df):
    return [
        r["n"]
        for r in df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.count("*").alias("n"))
        .collect()
    ]


def test_salted_repartition_balances_hot_keys(spark):
    # one pathological hot key: 80% of rows on a single (repo, path)
    n = 20000
    base = datagen.change_events(spark, n, 2000, dup_every=0)
    hot = base.withColumn(
        "repo", F.when(F.col("lsn") % 5 != 0, F.lit("org0/hot")).otherwise(F.col("repo"))
    ).withColumn(
        "path", F.when(F.col("lsn") % 5 != 0, F.lit("src/hot.py")).otherwise(F.col("path"))
    )

    p = 8
    by_key = hot.repartition(p, "repo", "path")
    salted = salted_repartition(hot, ["repo", "path"], "lsn", p)

    key_sizes = _partition_sizes(by_key)
    salted_sizes = _partition_sizes(salted)
    mean = n / p

    # raw key partitioning: the hot partition holds ~80% of all rows
    assert max(key_sizes) > 0.5 * n
    # salted: every partition is within 2x of the mean
    assert len(salted_sizes) == p
    assert max(salted_sizes) < 2 * mean

    # content preserved bit-for-bit (same multiset of rows)
    assert salted.exceptAll(hot).count() == 0
    assert hot.exceptAll(salted).count() == 0


def test_merge_hot_key_guard(spark, tmp_path):
    """A batch whose rows concentrate on ONE key (one bucket) trips the
    merge's gated pre-reduce (detected for free from the lineage
    pre-pass counts) and still converges to the exact oracle state —
    the salted per-(salt, key) max-LSN reduce must keep the same
    global winner per key, tombstones included."""
    from pyspark.sql import functions as F

    from w3_data_etl_pipeline_spark import oracle
    from w3_data_etl_pipeline_spark.plans.laketable import LakeTable
    from w3_data_etl_pipeline_spark.schemas import SOURCE_FILES

    n = 150_000
    base = datagen.change_events(spark, n, 500, dup_every=0, content_max=48)
    hot = F.pmod(F.col("lsn"), F.lit(2)) == 0  # 50% on one key
    events = base.withColumn(
        "repo", F.when(hot, F.lit("org0/hot")).otherwise(F.col("repo"))
    ).withColumn("path", F.when(hot, F.lit("src/hot.rs")).otherwise(F.col("path")))

    t = LakeTable.create(
        spark, str(tmp_path / "t"), SOURCE_FILES, ["repo", "path"], n_buckets=8
    )
    st = t.merge(events, 0)
    assert st.applied and st.skew_prereduced, "hot-key guard never fired"

    event_rows = [r.asDict() for r in events.collect()]
    exp = oracle.expected_fingerprint(oracle.reduce_events([], event_rows))
    got = {
        (r["repo"], r["path"]): r["content_sha"]
        for r in t.state_fingerprint().collect()
    }
    assert got == exp

    # uniform batches keep the single-shuffle plan (guard stays off)
    t2 = LakeTable.create(
        spark, str(tmp_path / "t2"), SOURCE_FILES, ["repo", "path"], n_buckets=8
    )
    st2 = t2.merge(base.limit(20_000), 0)
    assert st2.applied and not st2.skew_prereduced
