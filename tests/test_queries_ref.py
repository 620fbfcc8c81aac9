"""Tests for the reference analysis-query ports in queries_ref.py.

The per-query oracle equality is checked by the driver (and
tools/compare_oracle.py); here we pin the semantics that the oracle
can't see: broadcast-join plan shape, UA pool coverage, and semi-join
row preservation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from w3_data_etl_pipeline_spark import queries_ref as qr

SF_DIR = "/root/testdata/sf0.001"


def test_region_traffic_broadcasts_dims(spark):
    df = qr.ref_region_traffic(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    rows = df.collect()
    # EUROPE has 5 nations in the TPC-H universe
    assert 0 < len(rows) <= 5
    assert all(r["n_events"] > 0 for r in rows)


def test_ua_pool_covers_all_classes(spark):
    """The synthetic UA pool must exercise bot/PC/mobile/tablet paths."""
    out = {r["device_type"] for r in qr.ua_enrich_traffic(spark, SF_DIR).collect()}
    assert "PC" in out
    assert "Mobile" in out
    assert "Tablet" in out
    bots = {
        r["browser"]
        for r in qr.ua_enrich_traffic(spark, SF_DIR).filter(F.col("is_bot")).collect()
    }
    assert "Googlebot" in bots


def test_ua_expected_lut_is_consistent(spark):
    """The import-time expected table matches a live UDF run (guards
    against the lut drifting from the kernel)."""
    import pandas as pd

    from w3_data_etl_pipeline_spark.functions.ua import classify_ua_pdf

    live = classify_ua_pdf(pd.Series(qr._UA_POOL))
    assert live.equals(qr._UA_EXPECTED)


def test_semi_join_counts_bounded_by_orders(spark):
    out = qr.semi_join_discounted_orders(spark, SF_DIR)
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    assert out.agg(F.sum("n_orders")).head()[0] <= orders.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan


def test_band_traffic_labels_are_reference_bands(spark):
    from w3_data_etl_pipeline_spark.functions.bands import TIME_RANGES

    labels = {r["time_category"] for r in qr.ref_band_traffic(spark, SF_DIR).collect()}
    assert labels <= {b[0] for b in TIME_RANGES}
