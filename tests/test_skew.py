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
