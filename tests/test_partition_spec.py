"""Declared partition-spec transforms (plans/laketable.py
alter_partition_spec — the Iceberg partition-transform pillar:
identity/years/months/days/hours/truncate[W], per-file partition
tuples in manifest entries, partition-granular pruning BEFORE bounds
pruning, and spec evolution as a metadata-only commit).

The load-bearing proof that pruning is partition-granular: the
out-of-window files are DELETED FROM DISK and the windowed query
still answers correctly — they were provably never opened.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from w3_data_etl_pipeline_spark.plans.laketable import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("lang", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

EPOCH = dt.datetime(2024, 3, 1)  # day index 19783


def _events(spark, ids, day_offsets, lang="py", lsn=1):
    rows = [
        (
            i,
            EPOCH + dt.timedelta(days=d, hours=i % 24),
            lang,
            float(i),
            i + lsn * 10**6,
            "U",
        )
        for i, d in zip(ids, day_offsets)
    ]
    return spark.createDataFrame(
        rows, ["event_id", "ts", "lang", "value", "lsn", "op"]
    )


def _mk_days(spark, tmp_path, name="t"):
    t = LakeTable.create(
        spark, str(tmp_path / name), SCHEMA, ["event_id"], n_buckets=4
    )
    t.alter_partition_spec(["days(ts)"])
    # 30 events over 3 distinct days
    t.merge(_events(spark, range(30), [i % 3 for i in range(30)]), 0)
    return t


def test_day_partitioned_write_records_tuples(spark, tmp_path):
    t = _mk_days(spark, tmp_path)
    snap = t.snapshot()
    days = {19783 + d for d in range(3)}
    for f in snap["files"]:
        assert f["spec"] == 1
        assert len(f["pt"]) == 1 and f["pt"][0] in days
    # one tuple per file by construction: 4 buckets x 3 days possible
    assert len(snap["files"]) <= 12


def test_window_query_never_opens_out_of_window_files(spark, tmp_path):
    t = _mk_days(spark, tmp_path)
    pred = "ts >= TIMESTAMP '2024-03-02 00:00:00' AND ts < TIMESTAMP '2024-03-03 00:00:00'"
    expect = {r["event_id"] for r in t.read().filter(pred).collect()}
    info = t.explain_skipping(pred)
    kept = t.prune_files(t.snapshot(), pred)
    assert all(f["pt"][0] == 19784 for f in kept)
    assert info["files_skipped"] >= len(t.snapshot()["files"]) - len(kept)
    # the hard proof: delete every out-of-window file; the windowed
    # read must still answer (those files are never opened)
    kept_paths = {f["path"] for f in kept}
    for f in t.snapshot()["files"]:
        if f["path"] not in kept_paths:
            os.remove(os.path.join(t.root, f["path"]))
    got = {r["event_id"] for r in t.read_where(pred).collect()}
    assert got == expect and got == {i for i in range(30) if i % 3 == 1}


def test_partition_prune_beats_unclustered_bounds(spark, tmp_path):
    """Interleaved writes leave min/max ts bounds spanning the full
    range (bounds prune nothing); the partition tuple still prunes
    exactly — the 'exact by construction vs advisory' distinction."""
    t = LakeTable.create(spark, str(tmp_path / "u"), SCHEMA, ["event_id"], n_buckets=2)
    t.merge(_events(spark, range(20), [i % 2 for i in range(20)]), 0)  # pre-spec
    v_pre = t.current_version()
    pre_files = {f["path"] for f in t.snapshot()["files"]}
    t.alter_partition_spec(["days(ts)"])
    t.merge(_events(spark, range(20, 40), [i % 2 for i in range(20, 40)]), 1)
    pred = "ts < TIMESTAMP '2024-03-01 23:59:00'"
    # the COW merge rewrote both buckets under the new spec: the live
    # files split on day boundaries and the day-1 halves prune EXACTLY
    kept = t.prune_files(t.snapshot(), pred)
    assert all(f.get("pt") for f in kept) and all(f["pt"][0] == 19783 for f in kept)
    assert len(kept) < len(t.snapshot()["files"])
    # pre-spec files (time travel): interleaved ts bounds span both
    # days, so bounds prune NOTHING — the 'exact vs advisory' contrast
    kept_old = t.prune_files(t.snapshot(v_pre), pred)
    assert {f["path"] for f in kept_old} == pre_files
    # and the windowed rows still come out identical on both versions
    assert {r["event_id"] for r in t.read_where(pred, version=v_pre).collect()} == {
        i for i in range(20) if i % 2 == 0 and i % 24 < 24
    }


def test_spec_evolution_time_travel_and_cdf(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "ev"), SCHEMA, ["event_id"], n_buckets=2)
    t.merge(_events(spark, range(10), [0] * 10), 0)
    v_pre = t.current_version()
    t.alter_partition_spec(["days(ts)"])
    t.merge(_events(spark, range(10, 20), [1] * 10, lsn=2), 1)
    # time travel BEFORE the spec change still reads (its snapshot has
    # no partition_specs default in play for those files)
    assert t.read(version=v_pre).count() == 10
    assert t.read().count() == 20
    # CDF across the spec change sees exactly the post-spec inserts
    cdf = t.changes(v_pre, t.current_version())
    assert {r["event_id"] for r in cdf.filter("_change_type = 'insert'").collect()} == set(
        range(10, 20)
    )
    # evolving back to unpartitioned is spec 0 again; new writes untupled
    t.alter_partition_spec([])
    assert int(t.snapshot()["default_spec"]) == 0
    t.merge(_events(spark, range(20, 25), [2] * 5, lsn=3), 2)
    newest = [f for f in t.snapshot()["files"] if "pt" not in f]
    assert newest
    # re-declaring the SAME fields reuses the existing spec id
    t.alter_partition_spec(["days(ts)"])
    assert int(t.snapshot()["default_spec"]) == 1


def test_rename_survives_drop_blocked(spark, tmp_path):
    t = _mk_days(spark, tmp_path, "rn")
    t.rename_column("ts", "event_ts")  # fid-keyed spec: fine
    t.merge(_events(spark, [100], [2], lsn=5).withColumnRenamed("ts", "event_ts"), 1)
    kept = t.prune_files(
        t.snapshot(), "event_ts >= TIMESTAMP '2024-03-03 00:00:00'"
    )
    assert all(f["pt"][0] == 19785 for f in kept if f.get("pt"))
    with pytest.raises(ValueError, match="partition spec"):
        t.drop_column("event_ts")
    t.alter_partition_spec([])
    t.drop_column("event_ts")  # spec gone -> drop allowed


def test_null_partition_values(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "nl"), SCHEMA, ["event_id"], n_buckets=2)
    t.alter_partition_spec(["days(ts)"])
    rows = [(1, EPOCH, "py", 1.0, 10, "U"), (2, None, "py", 2.0, 11, "U")]
    t.merge(
        spark.createDataFrame(rows, ["event_id", "ts", "lang", "value", "lsn", "op"]),
        0,
    )
    snap = t.snapshot()
    assert {f["pt"][0] for f in snap["files"]} == {19783, None}
    kept_null = t.prune_files(snap, "ts IS NULL")
    assert all(f["pt"][0] is None for f in kept_null)
    kept_day = t.prune_files(snap, "ts >= TIMESTAMP '2024-03-01 00:00:00'")
    assert all(f["pt"][0] == 19783 for f in kept_day)
    assert {r["event_id"] for r in t.read_where("ts IS NULL").collect()} == {2}


def test_transform_validation(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "va"), SCHEMA, ["event_id"], n_buckets=2)
    with pytest.raises(ValueError, match="unsupported"):
        t.alter_partition_spec(["identity(ts)"])  # use days()/hours()
    with pytest.raises(ValueError, match="unsupported"):
        t.alter_partition_spec(["truncate(value, 10)"])  # double
    with pytest.raises(ValueError, match="no such"):
        t.alter_partition_spec(["days(nope)"])
    with pytest.raises(ValueError, match="width"):
        t.alter_partition_spec(["truncate(lang)"])
    with pytest.raises(ValueError, match="unknown transform"):
        t.alter_partition_spec(["zorder(lang)"])


def test_identity_string_and_hours(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "ih"), SCHEMA, ["event_id"], n_buckets=2)
    t.alter_partition_spec(["identity(lang)", "hours(ts)"])
    t.merge(
        _events(spark, range(8), [0] * 8, lang="py").union(
            _events(spark, range(8, 16), [0] * 8, lang="rs")
        ),
        0,
    )
    snap = t.snapshot()
    langs = {f["pt"][0] for f in snap["files"]}
    assert langs == {"py", "rs"}
    kept = t.prune_files(snap, "lang = 'py'")
    assert all(f["pt"][0] == "py" for f in kept)
    # hour window prunes on the second field; event i has hour i%24
    hour0 = 19783 * 24
    kept2 = t.prune_files(
        snap, "ts < TIMESTAMP '2024-03-01 03:00:00' AND lang = 'py'"
    )
    assert all(f["pt"][0] == "py" and f["pt"][1] < hour0 + 3 for f in kept2)
    got = {
        r["event_id"]
        for r in t.read_where(
            "ts < TIMESTAMP '2024-03-01 03:00:00' AND lang = 'py'"
        ).collect()
    }
    assert got == {0, 1, 2}


def test_compaction_migrates_to_current_spec(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "cm"), SCHEMA, ["event_id"], n_buckets=2)
    t.merge(_events(spark, range(12), [i % 2 for i in range(12)]), 0)  # pre-spec
    t.alter_partition_spec(["days(ts)"])
    assert any("pt" not in f for f in t.snapshot()["files"])
    t.compact()
    snap = t.snapshot()
    assert all(f.get("pt") for f in snap["files"] if f.get("kind", "base") == "base")
    assert t.read().count() == 12


def test_sql_set_partition_spec(spark, tmp_path):
    from w3_data_etl_pipeline_spark.plans.sql import LakeCatalog

    t = LakeTable.create(spark, str(tmp_path / "sq"), SCHEMA, ["event_id"], n_buckets=2)
    cat = LakeCatalog(spark).register("pt", t)
    cat.sql("ALTER TABLE pt SET PARTITION SPEC (days(ts), identity(lang))")
    assert int(t.snapshot()["default_spec"]) == 1
    t.merge(_events(spark, range(6), [0, 0, 1, 1, 2, 2]), 0)
    assert all(len(f["pt"]) == 2 for f in t.snapshot()["files"])
    script = cat.sql("SHOW CREATE TABLE pt").collect()[0]["stmt"]
    assert "SET PARTITION SPEC (days(ts), identity(lang))" in script
    cat.sql("ALTER TABLE pt SET PARTITION SPEC NONE")
    assert int(t.snapshot()["default_spec"]) == 0


def test_truncate_string_prefix(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "tr"), SCHEMA, ["event_id"], n_buckets=2)
    t.alter_partition_spec(["truncate(lang, 2)"])
    rows = [
        (1, EPOCH, "python", 1.0, 1, "U"),
        (2, EPOCH, "pypy", 2.0, 2, "U"),
        (3, EPOCH, "rust", 3.0, 3, "U"),
    ]
    t.merge(
        spark.createDataFrame(rows, ["event_id", "ts", "lang", "value", "lsn", "op"]),
        0,
    )
    snap = t.snapshot()
    assert {f["pt"][0] for f in snap["files"]} == {"py", "ru"}
    kept = t.prune_files(snap, "lang = 'rust'")
    assert all(f["pt"][0] == "ru" for f in kept)
    kept2 = t.prune_files(snap, "lang >= 'q'")
    assert all(f["pt"][0] == "ru" for f in kept2)


def test_explain_skipping_partition_attribution(spark, tmp_path):
    """Interleaved days in every file leave bounds useless; the
    attribution field shows the tuple (not stats) did the skipping."""
    t = LakeTable.create(spark, str(tmp_path / "at"), SCHEMA, ["event_id"], n_buckets=2)
    t.alter_partition_spec(["days(ts)"])
    t.merge(_events(spark, range(24), [i % 3 for i in range(24)]), 0)
    info = t.explain_skipping(
        "ts >= TIMESTAMP '2024-03-02 00:00:00' AND ts < TIMESTAMP '2024-03-03 00:00:00'"
    )
    assert info["files_skipped"] > 0
    # per-file bounds ARE day-tight here (the write splits on days), so
    # bounds alone also prune — attribution must then report zero
    assert info["skipped_by_partition_only"] == 0
    # strip the manifest stats to simulate an unclustered/pre-stats
    # layout: now ONLY the tuple can prove exclusion
    snap = t.snapshot()
    stripped = [
        {k: v for k, v in f.items() if k not in ("cmin", "cmax", "cnull")}
        for f in snap["files"]
    ]
    v = snap["version"] + 1
    ns = dict(snap, version=v, parent=snap["version"], files=stripped,
              operation="strip-stats-test")
    t._write_snapshot(ns)
    info2 = t.explain_skipping(
        "ts >= TIMESTAMP '2024-03-02 00:00:00' AND ts < TIMESTAMP '2024-03-03 00:00:00'"
    )
    assert info2["skipped_by_partition_only"] == info2["files_skipped"] > 0


def test_files_table_and_describe_show_spec(spark, tmp_path):
    from w3_data_etl_pipeline_spark.plans.sql import LakeCatalog

    t = _mk_days(spark, tmp_path, "fd")
    f = t.files().filter("spec_id IS NOT NULL").collect()
    assert f and all(r["spec_id"] == 1 for r in f)
    import json as _json

    assert all(isinstance(_json.loads(r["partition"])[0], int) for r in f)
    cat = LakeCatalog(spark).register("fd", t)
    desc = {r["col_name"]: r["partitioning"] for r in cat.sql("DESCRIBE fd").collect()}
    assert desc["ts"] == "days"
    assert "bucket(4)" in desc["event_id"]
