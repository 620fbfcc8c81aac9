"""LakeTable as a true Structured Streaming source (streaming/
source.py, Spark 4 Python DataSource API): batch-for-batch parity
with LakeTable.changes() over COW/MOR/DV lifecycles, per-version
backpressure, checkpointed kill/resume exactly-once, schema-evolution
(rename + initial-default) mapping through the executor-side DuckDB
reads, and the declared schema contract."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from w3_data_etl_pipeline_spark.plans.laketable import LakeTable
from w3_data_etl_pipeline_spark.streaming.source import LakeTableChangeSource

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


@pytest.fixture()
def reg(spark):
    spark.dataSource.register(LakeTableChangeSource)
    return spark


def _ev(spark, lo, hi, et, lsn):
    return spark.range(lo, hi).select(
        F.col("id").alias("user_id"),
        F.lit(et).alias("event_type"),
        (F.col("id") % 7).cast("double").alias("value"),
        F.lit(lsn).alias("lsn"),
        F.lit("U").alias("op"),
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _drain(spark, path, name, checkpoint=None, timeout=120, until_rows=None,
           **opts):
    """Run the source to a memory sink until it goes idle (or reaches
    ``until_rows``), then stop; returns the collected rows."""
    r = spark.readStream.format("laketable_cdf").option("path", path)
    for k, v in opts.items():
        r = r.option(k, v)
    w = r.load().writeStream.format("memory").queryName(name)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    q = w.trigger(processingTime="50 milliseconds").start()
    deadline = time.time() + timeout

    def _in_rows(p):
        return p["numInputRows"] if isinstance(p, dict) else p.numInputRows

    try:
        while time.time() < deadline:
            if until_rows is not None:
                n = spark.sql(f"select count(*) c from {name}").collect()[0]["c"]
                if n >= until_rows:
                    break
            else:
                prog = q.recentProgress
                # a COMPLETED batch that read nothing == source drained
                if prog and _in_rows(prog[-1]) == 0:
                    break
            time.sleep(0.1)
    finally:
        q.stop()
        q.awaitTermination(30)
    return _rows(spark.sql(f"select * from {name}"))


def test_single_batch_parity_cow_mor_dv(reg, spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["user_id"], n_buckets=4)
    t.merge(_ev(spark, 0, 50, "a", 1), 0)
    t.merge(_ev(spark, 25, 60, "b", 2), 1, mode="mor")
    t.delete_where("user_id >= 55", mode="dv")
    t.update_where("user_id < 5", {"value": "value + 100"}, mode="mor")
    got = _drain(spark, str(tmp_path / "t"), "cdf_parity")
    assert got == _rows(t.changes(0))
    # vs the EMPTY v0 everything nets to inserts, and keys 55-59
    # (inserted in v2, DV-deleted in v3) net out entirely
    assert {r[-1] for r in got} == {"insert"}
    assert not any(r[0] >= 55 for r in got)
    # a mid-history start sees the real update/delete kinds
    got2 = _drain(
        spark, str(tmp_path / "t"), "cdf_parity2", startingVersion=1
    )
    assert got2 == _rows(t.changes(1))
    # 25-49 flip a->b (updates), 50-54 are new (inserts); the DV
    # delete only hit v2-born keys, so no v1 key deletes here —
    # delete kinds are pinned in test_per_version_batches below
    assert {r[-1] for r in got2} == {"insert", "update"}


def test_per_version_batches_and_backpressure(reg, spark, tmp_path):
    # LIVE tailing: the stream starts on the empty v0 table and the
    # commits land while it runs. (Starting first also makes the rate
    # limit deterministic — maxVersionsPerTrigger is best-effort on
    # the very first trigger, see source.py.)
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["user_id"], n_buckets=4)
    name = "cdf_backp"
    q = (
        spark.readStream.format("laketable_cdf")
        .option("path", str(tmp_path / "t"))
        .option("maxVersionsPerTrigger", 1)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while not q.recentProgress and time.time() < deadline:
            time.sleep(0.1)  # floor known after the first trigger
        t.merge(_ev(spark, 0, 30, "a", 1), 0)
        t.merge(_ev(spark, 10, 40, "b", 2), 1)
        t.delete_where("user_id < 5")
        cur = t.current_version()
        want = []
        for v in range(0, cur):
            want.extend(_rows(t.changes(v, v + 1)))
        expected = sorted(want)
        deadline = time.time() + 120
        while time.time() < deadline:
            n = spark.sql(f"select count(*) c from {name}").collect()[0]["c"]
            if n >= len(expected):
                break
            time.sleep(0.1)
    finally:
        q.stop()
        q.awaitTermination(30)
    got = _rows(spark.sql(f"select * from {name}"))
    # one microbatch per version: the union IS the per-version feeds'
    # union (a key changed in two versions appears once per version)
    assert got == expected


def test_kill_resume_exactly_once(reg, spark, tmp_path):
    from collections import Counter

    root = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    t = LakeTable.create(spark, root, SCHEMA, ["user_id"], n_buckets=4)
    t.merge(_ev(spark, 0, 20, "a", 1), 0)

    def _run():
        q = (
            spark.readStream.format("laketable_cdf")
            .option("path", root)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="50 milliseconds")
            .start()
        )
        deadline = time.time() + 120
        try:
            while time.time() < deadline:
                prog = q.recentProgress
                if prog:
                    p = prog[-1]
                    n = p["numInputRows"] if isinstance(p, dict) else p.numInputRows
                    if n == 0:
                        break
                time.sleep(0.1)
        finally:
            q.stop()
            q.awaitTermination(30)
        return _rows(spark.read.parquet(out))

    first = _run()
    assert first == _rows(t.changes(0, 1))
    # new commits while the stream is down
    t.merge(_ev(spark, 10, 30, "b", 2), 1)
    t.delete_where("user_id < 3")
    both = _run()
    # resumed stream appended ONLY the post-checkpoint changes:
    # total multiset == first run + changes(1, current), no dup/gap
    want = Counter(first) + Counter(_rows(t.changes(1)))
    assert Counter(both) == want


def test_schema_evolution_rename_and_default(reg, spark, tmp_path):
    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root, SCHEMA, ["user_id"], n_buckets=4)
    t.merge(_ev(spark, 0, 20, "a", 1), 0)
    t.add_column("lang", "string", initial_default="und")
    t.rename_column("event_type", "etype")
    # post-evolution commit writes the new physical names
    t.merge(
        spark.range(10, 25).select(
            F.col("id").alias("user_id"),
            F.lit("b").alias("etype"),
            (F.col("id") % 7).cast("double").alias("value"),
            F.lit("en").alias("lang"),
            F.lit(2).alias("lsn"),
            F.lit("U").alias("op"),
        ),
        1,
    )
    got = _drain(spark, root, "cdf_evo")
    assert got == _rows(t.changes(0))
    # pre-evolution rows read through the rename with the default
    by_key = {r[0]: r for r in got}
    cols = [f.name for f in t.changes(0).schema.fields]
    li, ei = cols.index("lang"), cols.index("etype")
    assert by_key[0][li] == "und" and by_key[0][ei] == "a"
    assert by_key[20][li] == "en" and by_key[20][ei] == "b"


def test_declared_schema_matches_changes(reg, spark, tmp_path):
    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root, SCHEMA, ["user_id"], n_buckets=4)
    t.merge(_ev(spark, 0, 5, "a", 1), 0)
    sdf = spark.readStream.format("laketable_cdf").option("path", root).load()
    assert [f.name for f in sdf.schema.fields] == [
        f.name for f in t.changes(0).schema.fields
    ]
    assert [f.dataType for f in sdf.schema.fields[:-1]] == [
        f.dataType for f in t.changes(0).schema.fields[:-1]
    ]


def test_no_new_commits_emits_nothing(reg, spark, tmp_path):
    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root, SCHEMA, ["user_id"], n_buckets=4)
    t.merge(_ev(spark, 0, 5, "a", 1), 0)
    got = _drain(spark, root, "cdf_idle", startingVersion=t.current_version())
    assert got == []


def test_resume_with_backpressure(reg, spark, tmp_path):
    # restart with maxVersionsPerTrigger set: the reader's in-memory
    # floor starts below the checkpoint, so the rate limit must not
    # propose an end behind the checkpointed start (first trigger
    # after restart is deliberately unlimited)
    from collections import Counter

    root = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    t = LakeTable.create(spark, root, SCHEMA, ["user_id"], n_buckets=4)
    # windows are KEY-DISJOINT by construction, so the multiset below
    # is the same whether a cold start covers them in one unlimited
    # first batch (the documented best-effort caveat) or per-version
    t.merge(_ev(spark, 0, 20, "a", 1), 0)
    t.merge(_ev(spark, 20, 25, "b", 2), 1)

    def _run(expect_rows):
        q = (
            spark.readStream.format("laketable_cdf")
            .option("path", root)
            .option("maxVersionsPerTrigger", 1)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="50 milliseconds")
            .start()
        )
        deadline = time.time() + 120
        try:
            while time.time() < deadline:
                try:
                    n = spark.read.parquet(out).count()
                except Exception:
                    n = 0
                if n >= expect_rows:
                    break
                time.sleep(0.1)
        finally:
            q.stop()
            q.awaitTermination(30)
        return _rows(spark.read.parquet(out))

    want1 = len(_rows(t.changes(0, 1))) + len(_rows(t.changes(1, 2)))
    first = _run(want1)
    assert Counter(first) == Counter(
        _rows(t.changes(0, 1)) + _rows(t.changes(1, 2))
    )
    t.merge(_ev(spark, 0, 3, "c", 3), 2)
    t.delete_where("user_id = 24")
    both = _run(want1 + len(_rows(t.changes(2))))
    # restart must append exactly the post-checkpoint changes —
    # no duplicate, no gap — whatever batch sizing the cold start used
    assert Counter(both) == Counter(first) + Counter(
        _rows(t.changes(2, 3)) + _rows(t.changes(3, 4))
    )
