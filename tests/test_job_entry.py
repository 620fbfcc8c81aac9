"""End-to-end test of the cluster launch shape: tools/submit.sh packages
the engine as a --py-files zip and spark-submits jobs/run_cdc.py (north
rule: "run via spark-submit --py-files"). Covers create-table +
bootstrap + WAL drain, then checkpoint-resume idempotency (a second
invocation over the same WAL applies nothing new).

Reference analogue: the Airflow DAG trigger this replaces
(/root/reference/src/dags/w3c.py:49-54).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess


ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _flat_wal(spark, out_dir, n_events, n_keys, segments=2):
    from w3_data_etl_pipeline_spark import datagen

    ev = datagen.change_events(spark, n_events, n_keys, content_max=256)
    os.makedirs(out_dir)
    per = n_events // segments
    for i in range(segments):
        lo = i * per + 1
        hi = (i + 1) * per if i < segments - 1 else n_events
        tmp = os.path.join(out_dir, f"_seg{i}")
        ev.filter((ev.lsn >= lo) & (ev.lsn <= hi)).coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(out_dir, f"seg{i}.parquet"))
        shutil.rmtree(tmp)


def _submit(*job_args):
    r = subprocess.run(
        [os.path.join(ROOT, "tools", "submit.sh"),
         "--master", "local[2]", "--driver-memory", "2g", "--"]
        + list(job_args),
        capture_output=True, text=True, cwd=ROOT, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    assert lines, r.stdout[-3000:]
    return json.loads(lines[-1])


def test_submit_job_drain_and_resume(spark, tmp_path):
    from w3_data_etl_pipeline_spark import datagen
    from w3_data_etl_pipeline_spark.plans.laketable import LakeTable

    n_events, n_keys = 1500, 300
    boot = str(tmp_path / "bootstrap")
    datagen.source_snapshot(spark, n_keys, content_max=256).write.parquet(boot)
    wal = str(tmp_path / "wal")
    _flat_wal(spark, wal, n_events, int(n_keys * 1.2))

    table = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    out1 = _submit("--table", table, "--events-dir", wal, "--checkpoint", ckpt,
                   "--bootstrap", boot, "--buckets", "8")
    # dup_every=97 injects exact-duplicate WAL rows; pre-dedup applied
    # events therefore exceed n_events by exactly the dup count
    assert out1["events"] == n_events + n_events // 97
    assert out1["applied"] >= 1 and out1["batches"] == out1["applied"]

    # resume over a fully-drained WAL: checkpoint says nothing new
    out2 = _submit("--table", table, "--events-dir", wal, "--checkpoint", ckpt,
                   "--bootstrap", boot, "--buckets", "8")
    assert out2["batches"] == 0 and out2["events"] == 0

    # final state is readable in-process and reflects the stream
    t = LakeTable(spark, table)
    assert t.current_version() >= 2  # bootstrap + >=1 merge commit
    assert t.read().count() > 0


def test_submit_job_audit_predicate(spark, tmp_path):
    """--audit-predicate turns the submitted stream into write-audit-
    publish: a WAL whose second segment violates the predicate drains
    with that batch rejected + dead-lettered, the table never exposes
    a violating row, and the ledger stays unburned."""
    import pyspark.sql.functions as F

    from w3_data_etl_pipeline_spark import datagen
    from w3_data_etl_pipeline_spark.plans.laketable import LakeTable

    n_events, n_keys = 600, 150
    boot = str(tmp_path / "bootstrap")
    datagen.source_snapshot(spark, n_keys, content_max=256).write.parquet(boot)

    ev = datagen.change_events(spark, n_events, n_keys, content_max=256)
    bad_half = ev.filter(ev.lsn > n_events // 2).withColumn(
        "content", F.concat(F.lit("BAD::"), F.coalesce("content", F.lit("")))
    )
    wal = str(tmp_path / "wal")
    os.makedirs(wal)
    for i, seg in enumerate([ev.filter(ev.lsn <= n_events // 2), bad_half]):
        tmp = os.path.join(wal, f"_seg{i}")
        seg.coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(wal, f"seg{i}.parquet"))
        shutil.rmtree(tmp)

    table = str(tmp_path / "lake")
    qdir = str(tmp_path / "q")
    out = _submit(
        "--table", table, "--events-dir", wal, "--checkpoint",
        str(tmp_path / "ckpt"), "--bootstrap", boot, "--buckets", "8",
        "--max-files-per-trigger", "1", "--mode", "mor",
        "--quarantine-dir", qdir,
        "--audit-predicate", "content IS NULL OR content NOT LIKE 'BAD::%'",
    )
    assert out["applied"] >= 1 and out["rejected"] >= 1
    assert os.path.isdir(os.path.join(qdir, "rejected"))
    t = LakeTable(spark, table)
    assert t.read().filter(F.col("content").startswith("BAD::")).isEmpty()
    assert t.staged_ids() == []


def test_submit_follow_cdf_derive_and_resume(spark, tmp_path):
    """jobs/follow_cdf.py via spark-submit: a derived LakeTable drains
    the upstream change feed with a key-stable filter, and a second
    identical invocation applies nothing (the downstream ledger IS the
    offset store — no checkpoint argument exists to lose)."""
    from w3_data_etl_pipeline_spark import datagen
    from w3_data_etl_pipeline_spark.plans.laketable import LakeTable
    from w3_data_etl_pipeline_spark.schemas import SOURCE_FILES

    src_root = str(tmp_path / "src")
    src = LakeTable.create(spark, src_root, SOURCE_FILES, ["repo", "path"],
                           n_buckets=8)
    ev = datagen.change_events(spark, 900, 200, content_max=128)
    src.merge(ev.filter(ev.lsn <= 450), 0)
    src.merge(ev.filter(ev.lsn > 450), 1)

    dst_root = str(tmp_path / "dst")
    args = ("jobs/follow_cdf.py", "--src", src_root, "--dst", dst_root,
            "--filter-sql", "path LIKE '%0%'", "--drain")
    out1 = _submit(*args)
    assert out1["applied_through"] == src.current_version()
    assert out1["steps"] >= 1 and out1["rows"] > 0

    dst = LakeTable(spark, dst_root)
    cols = ["repo", "path", "commit", "lang", "content"]
    want = sorted(map(tuple, src.read().filter("path LIKE '%0%'")
                      .select(*cols).collect()))
    got = sorted(map(tuple, dst.read().select(*cols).collect()))
    assert got == want

    out2 = _submit(*args)
    assert out2["steps"] == 0 and out2["rows"] == 0
