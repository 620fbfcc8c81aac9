"""Semantics tests for queries_data.py beyond the driver's oracle gate:
plan shape (codegen, no Python rows), budget invariants, and sampling
determinism. Oracle value-equality itself is covered by the driver and
tools/compare_oracle.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from w3_data_etl_pipeline_spark import queries_data as qd

SF_DIR = "/root/testdata/sf0.001"


def test_pii_redact_is_pure_codegen(spark):
    df = qd.pii_redact_docs(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "*(1)" in plan  # whole-stage codegen star on the single stage
    assert "Exchange" not in plan  # map-side only: a scrub pass must not shuffle
    rows = df.collect()
    assert all(r["n_emails"] >= 1 and r["n_ips"] >= 1 for r in rows)
    # the redacted text must contain no residual match
    red = qd.pii_redact_docs(spark, SF_DIR)
    assert (
        red.filter(F.col("redacted_sha").rlike("@")).count() == 0
    )  # sha is hex — sanity that we hashed, not echoed


def test_stratified_sample_rates(spark):
    rows = qd.stratified_sample_docs(spark, SF_DIR).collect()
    assert sum(r["n_total"] for r in rows) == 500
    by_lang: dict[str, list[int]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], [0, 0])
        by_lang[r["lang"]][0] += r["n_sampled"]
        by_lang[r["lang"]][1] += r["n_total"]
    en = by_lang["en"][0] / by_lang["en"][1]
    assert 0.10 <= en <= 0.40  # target 25%
    for lang, (s, n) in by_lang.items():
        if lang != "en":
            assert 0.40 <= s / n <= 0.80  # target 60%


def test_stratified_sample_is_deterministic(spark):
    a = {tuple(r) for r in qd.stratified_sample_docs(spark, SF_DIR).collect()}
    b = {tuple(r) for r in qd.stratified_sample_docs(spark, SF_DIR).collect()}
    assert a == b


def test_tfidf_top_terms_shape(spark):
    df = qd.tfidf_top_terms(spark, SF_DIR)
    rows = df.collect()
    per_doc: dict[int, int] = {}
    for r in rows:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + 1
        assert r["tf"] >= 1 and r["df"] >= 1
        # Spark rounds HALF_UP, python banker's — allow one ulp at 6dp
        assert abs(r["score"] - round(r["tf"] / r["df"], 6)) < 1.5e-6
    assert max(per_doc.values()) <= 3
    # the n_docs scalar must be broadcast, not shuffled
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_token_budget_never_exceeded(spark):
    rows = qd.token_budget_sample(spark, SF_DIR).collect()
    assert rows, "budget must keep at least the largest doc of some source"
    for r in rows:
        assert r["chars_kept"] <= 4000
        assert r["n_kept"] >= 1
