"""Row lineage (Iceberg spec-v3 ``row-lineage`` analogue): every row
carries a PERMANENT ``_row_id`` assigned at its first commit and a
``_last_seq`` naming the commit that last changed it. Storage follows
the null-means-inherit rule — appends stay zero-cost, ids live in the
manifest (``first_row_id``) until a rewrite materializes them — so the
invariants here are about what each write path must preserve:

* merge (COW): an event winner REPLACES a stored row -> same _row_id,
  _last_seq advances; untouched rows bit-identical; inserts get fresh
  never-reused ids.
* DML update/delete: hit rows keep ids / retire ids; non-hit stable.
* merge_into: update keeps id + advances seq, insert fresh, copied
  rows carried unchanged.
* compact / rebucket: pure rewrites — lineage must be IDENTICAL
  before and after (they materialize inherited values).
* enable_row_lineage: lazy metadata-only backfill on an existing
  table; idempotent.
* rollback: next_row_id never regresses (ids are never re-issued).
* documented boundary: MOR merge images get fresh ids (the fast path
  never reads the target — same tradeoff as Iceberg equality deletes).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F, types as T

from w3_data_etl_pipeline_spark.plans.laketable import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)

EV_DDL = "repo string, path string, content string, lsn long, op string"


def _ev(spark, rows):
    return spark.createDataFrame(rows, EV_DDL)


def _lineage(t, version=None):
    return {
        (r.repo, r.path): (r._row_id, r._last_seq)
        for r in t.read(version=version, include_lineage=True).collect()
    }


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"], n_buckets=4,
        row_lineage=True,
    )
    t.merge(
        _ev(spark, [("r1", "a", "v1", 1, "I"), ("r1", "b", "v1", 2, "I"),
                    ("r2", "c", "v1", 3, "I")]),
        batch_id=1,
    )
    return t


def test_ids_distinct_and_updates_keep_identity(spark, table):
    base = _lineage(table)
    assert len({v[0] for v in base.values()}) == 3
    assert all(rid is not None and seq is not None for rid, seq in base.values())

    table.merge(
        _ev(spark, [("r1", "a", "v2", 10, "U"), ("r3", "d", "v1", 11, "I")]),
        batch_id=2,
    )
    after = _lineage(table)
    assert after[("r1", "a")][0] == base[("r1", "a")][0]
    assert after[("r1", "a")][1] > base[("r1", "a")][1]
    assert after[("r1", "b")] == base[("r1", "b")]
    assert after[("r2", "c")] == base[("r2", "c")]
    # fresh id for the insert, never one already handed out
    assert after[("r3", "d")][0] not in {v[0] for v in base.values()}


def test_delete_retires_id_forever(spark, table):
    base = _lineage(table)
    dead = base[("r1", "b")][0]
    table.merge(_ev(spark, [("r1", "b", None, 10, "D")]), batch_id=2)
    table.merge(_ev(spark, [("r1", "b", "back", 20, "I")]), batch_id=3)
    after = _lineage(table)
    # a re-inserted key is a NEW row: the retired id must not come back
    assert after[("r1", "b")][0] != dead
    assert after[("r1", "b")][0] not in {v[0] for v in base.values()}


def test_dml_and_pure_rewrites(spark, table):
    base = _lineage(table)
    table.update_where("repo = 'r1' AND path = 'b'", {"content": "'patched'"})
    after = _lineage(table)
    assert after[("r1", "b")][0] == base[("r1", "b")][0]
    assert after[("r1", "b")][1] > base[("r1", "b")][1]
    assert after[("r1", "a")] == base[("r1", "a")]

    table.delete_where("repo = 'r2'")
    assert ("r2", "c") not in _lineage(table)

    # compact + rebucket are lineage-neutral (they MATERIALIZE the
    # inherited values into the rewritten files)
    before = _lineage(table)
    table.compact()
    assert _lineage(table) == before
    table.rebucket(8)
    assert _lineage(table) == before


def test_merge_into_carry(spark, table):
    base = _lineage(table)
    src = spark.createDataFrame(
        [("r1", "a", "m1"), ("r9", "e", "m2")],
        "repo string, path string, content string",
    )
    t = table
    t.merge_into(
        src,
        [("update", None, {"content": "s.content"}), ("insert", None, None)],
        insert_lsn=100,
    )
    after = _lineage(t)
    assert after[("r1", "a")][0] == base[("r1", "a")][0]
    assert after[("r1", "a")][1] > base[("r1", "a")][1]
    assert after[("r1", "b")] == base[("r1", "b")]  # copied row untouched
    assert after[("r9", "e")][0] not in {v[0] for v in base.values()}
    assert len({v[0] for v in after.values()}) == 4


def test_time_travel_sees_historic_lineage(spark, table):
    base = _lineage(table)
    v1 = table.snapshot()["version"]
    table.merge(_ev(spark, [("r1", "a", "v2", 10, "U")]), batch_id=2)
    assert _lineage(table, version=v1) == base


def test_enable_on_existing_table_is_lazy_and_idempotent(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t2"), SCHEMA, ["repo", "path"], n_buckets=4
    )
    t.merge(_ev(spark, [("r1", "a", "v1", 1, "I"), ("r1", "b", "v1", 2, "I")]),
            batch_id=1)
    with pytest.raises(ValueError, match="row lineage"):
        t.read(include_lineage=True)
    v = t.enable_row_lineage()
    assert t.enable_row_lineage() == v  # idempotent, no new commit
    lin = _lineage(t)
    ids = {rid for rid, _ in lin.values()}
    assert None not in ids and len(ids) == 2  # backfill covered old files
    # the enable was metadata-only: no data file was rewritten
    snap = t.snapshot()
    assert snap["operation"] == "enable-row-lineage"
    t.merge(_ev(spark, [("r1", "a", "v2", 9, "U")]), batch_id=2)
    after = _lineage(t)
    assert after[("r1", "a")][0] == lin[("r1", "a")][0]


def test_rollback_never_reissues_ids(spark, table):
    v1 = table.snapshot()["version"]
    n1 = table.snapshot()["next_row_id"]
    table.merge(_ev(spark, [("r5", "x", "v1", 10, "I")]), batch_id=2)
    assert table.snapshot()["next_row_id"] > n1
    burned = table.snapshot()["next_row_id"]
    table.rollback(v1)
    assert table.snapshot()["next_row_id"] >= burned
    table.merge(_ev(spark, [("r6", "y", "v1", 20, "I")]), batch_id=3)
    lin = _lineage(table)
    assert lin[("r6", "y")][0] >= burned  # fresh range, nothing reused


def test_mor_images_get_fresh_ids_documented_boundary(spark, table):
    base = _lineage(table)
    table.merge(_ev(spark, [("r1", "a", "v2", 10, "U")]), batch_id=2, mode="mor")
    after = _lineage(table)
    # the MOR fast path never reads the target: the new image is a new
    # row identity; the rest of the table is untouched
    assert after[("r1", "b")] == base[("r1", "b")]
    assert after[("r1", "a")][0] != base[("r1", "a")][0]


def test_plain_read_hides_lineage_columns(spark, table):
    cols = set(table.read().columns)
    assert "_row_id" not in cols and "_last_seq" not in cols


def test_carry_adds_no_exchange_or_sort(spark):
    """The COW-merge row-lineage carry is a window over
    (_bucket, keys) — Spark must satisfy its clustering from the
    existing hashpartitioning(_bucket) exchange and its sort from the
    (bucket, keys, ...) dedup sort prefix: one extra WindowExec, ZERO
    extra Exchange/Sort (measured 1.36x COW wall at sf-bench scale is
    the window pass + materialized columns, not a new shuffle)."""
    from pyspark.sql import Window
    from w3_data_etl_pipeline_spark.plans.laketable import (
        LASTSEQ_COL,
        ROWID_COL,
    )

    df = spark.range(1000).select(
        (F.col("id") % 100).alias("k"),
        F.col("id").alias("lsn"),
        (F.col("id") % 7).alias("_src"),
        (F.col("id") % 8).cast("int").alias("_bucket"),
        (F.col("id") * 2).alias(ROWID_COL),
        F.lit(1).alias(LASTSEQ_COL),
    )
    part = df.repartition(8, "_bucket")

    def counts(carry):
        out = LakeTable._first_per_key(
            part, ["k"], [F.col("lsn").desc()], carry=carry
        )
        s = out._jdf.queryExecution().executedPlan().toString()
        return s.count("Exchange"), s.count("Sort ")

    wk = Window.partitionBy("_bucket", "k")
    old = F.max(F.when(F.col("_src") == 0, F.col(ROWID_COL))).over(wk)
    carry = {
        ROWID_COL: F.when(F.col("_src") == 1, old).otherwise(F.col(ROWID_COL))
    }
    assert counts(None) == counts(carry)


def test_change_feed_carries_row_ids(spark, table):
    """Iceberg v3 changelog-scan shape: changes(include_row_ids=True)
    names each changed row's permanent identity — updates keep it
    (COW), inserts mint one, deletes carry the retired id; preimage
    mode stamps the pre/post identity per exploded row."""
    base = _lineage(table)
    v1 = table.snapshot()["version"]
    table.merge(
        _ev(spark, [("r1", "a", "v2", 10, "U"), ("r3", "d", "v1", 11, "I"),
                    ("r2", "c", None, 12, "D")]),
        batch_id=2,
    )
    ch = {
        (r.repo, r.path): (r._change_type, r._row_id)
        for r in table.changes(v1, include_row_ids=True).collect()
    }
    assert ch[("r1", "a")] == ("update", base[("r1", "a")][0])
    assert ch[("r2", "c")] == ("delete", base[("r2", "c")][0])
    ct, rid = ch[("r3", "d")]
    assert ct == "insert" and rid not in {v[0] for v in base.values()}

    pre = {
        (r.repo, r.path, r._change_type): r._row_id
        for r in table.changes(
            v1, include_preimage=True, include_row_ids=True
        ).collect()
    }
    k = ("r1", "a")
    assert pre[k + ("update_preimage",)] == pre[k + ("update_postimage",)]

    # without lineage enabled the flag refuses (no silent NULL column)
    with pytest.raises(ValueError, match="row lineage"):
        t2 = LakeTable.create(
            spark, str(table.root) + "_nolin", SCHEMA, ["repo", "path"]
        )
        t2.changes(0, include_row_ids=True)


def test_wap_staged_publish_preserves_identity(spark, table):
    """WAP + lineage: staged file entries carry NO first_row_id — ids
    are assigned only at publish's commit choke point from the winning
    main lineage, so an abandoned stage burns nothing and a published
    COW stage keeps the carried identities (the bucket-conflict check
    guarantees the materialized carries are still current)."""
    base = _lineage(table)
    n0 = table.snapshot()["next_row_id"]

    st = table.merge(
        _ev(spark, [("r1", "a", "v2", 10, "U"), ("r7", "w", "v1", 11, "I")]),
        batch_id=2, stage_id="aud",
    )
    assert st.applied is False
    # staging assigned nothing: no snapshot, no ids burned
    assert table.snapshot()["next_row_id"] == n0
    assert all(
        "first_row_id" not in f
        for f in table._load_staged("aud")["new_files"]
    )

    table.publish("aud")
    after = _lineage(table)
    assert after[("r1", "a")][0] == base[("r1", "a")][0]  # carry survived WAP
    assert after[("r1", "b")] == base[("r1", "b")]
    assert after[("r7", "w")][0] >= n0  # fresh range minted at publish
    assert table.snapshot()["next_row_id"] > n0


def test_streaming_kill_resume_keeps_ids_unique(spark, tmp_path):
    """The north-rule streaming path over a lineage table: WAL-tail
    stream, crash, resume from the same checkpoint. MOR images
    re-identify (documented boundary), so the streaming invariants are
    id UNIQUENESS across every commit including the replayed window,
    plus monotone next_row_id."""
    import glob
    import os
    import shutil

    from w3_data_etl_pipeline_spark import datagen
    from w3_data_etl_pipeline_spark.schemas import CHANGE_EVENTS, SOURCE_FILES
    from w3_data_etl_pipeline_spark.streaming.cdc import run_stream

    events = datagen.change_events(spark, 600, 120)
    wal = tmp_path / "wal"
    os.makedirs(wal)

    def land(i, lo, hi):
        staging = str(tmp_path / f"stage{i}")
        events.filter(
            (events.lsn >= lo) & (events.lsn <= hi)
        ).coalesce(1).write.parquet(staging)
        part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        shutil.move(part, str(wal / f"seg{i}.parquet"))

    t = LakeTable.create(
        spark, str(tmp_path / "t"), SOURCE_FILES, ["repo", "path"],
        n_buckets=8, row_lineage=True,
    )
    t.overwrite(datagen.source_snapshot(spark, 80), lsn=datagen.GENESIS_LSN)
    ckpt = str(tmp_path / "ckpt")

    land(0, 1, 300)
    run_stream(spark, t, str(wal), ckpt, CHANGE_EVENTS, enrich=False,
               salt_partitions=4)
    n_mid = t.snapshot()["next_row_id"]
    land(1, 301, 600)
    run_stream(spark, t, str(wal), ckpt, CHANGE_EVENTS, enrich=False,
               salt_partitions=4)

    assert t.snapshot()["next_row_id"] > n_mid
    df = t.read(include_lineage=True)
    n = df.count()
    assert n > 0
    assert df.select("_row_id").distinct().count() == n
    assert df.filter("_row_id IS NULL OR _last_seq IS NULL").count() == 0
