"""``LakeTable.verify`` — the lakehouse fsck (Delta FSCK / Iceberg
snapshot-validation analogue). Shallow = O(metadata) manifest-vs-disk
checks; deep = one distributed scan recomputing per-file row counts,
LSN bounds, and the key-hash bucket-membership invariant every
pruning path relies on. Corruption is injected file-by-file (on the
data file or on its manifest stats) and each check must localise it
to the right category and path."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from w3_data_etl_pipeline_spark.plans.laketable import LakeTable

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _batch(spark, lo, hi, lsn0=0):
    return spark.range(lo, hi).select(
        F.col("id").alias("user_id"),
        (F.col("id") * 1.5).alias("value"),
        (F.col("id") + lsn0).alias("lsn"),
        F.lit("U").alias("op"),
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["user_id"], n_buckets=8)
    t.merge(_batch(spark, 0, 300), 0)
    t.merge(_batch(spark, 50, 80, lsn0=1000), 1, mode="mor")  # live deltas too
    return t


def _some_file(t: LakeTable, kind=None):
    for f in t.snapshot()["files"]:
        if kind is None or f.get("kind", "base") == kind:
            return f
    raise AssertionError(f"no {kind} file")


def _patch_manifest_entry(t: LakeTable, path: str, **updates) -> LakeTable:
    """Tamper a manifest entry's recorded stats on disk (the 'manifest
    lies about the data' corruption class) and hand back a FRESH
    handle so the per-instance manifest cache re-reads it."""
    snap = t.snapshot()
    for rel in snap["manifests"].values():
        full = os.path.join(t.root, rel)
        with open(full) as f:
            entries = json.load(f)
        hit = False
        for e in entries:
            if e["path"] == path:
                e.update(updates)
                hit = True
        if hit:
            with open(full, "w") as f:
                json.dump(entries, f)
            return LakeTable(t.spark, t.root)
    raise AssertionError(f"{path} not found in any manifest")


def test_clean_table_passes_shallow_and_deep(table):
    rep = table.verify(deep=True)
    assert rep["ok"], rep
    assert rep["files"] == len(table.snapshot()["files"])
    assert rep["error_counts"] == {}
    assert rep["deep"]["ok"]
    assert rep["deep"]["files_checked"] == rep["files"]
    # deep scanned the full pre-resolution row mass (base + deltas)
    manifest_rows = sum(f["rows"] for f in table.snapshot()["files"])
    assert rep["deep"]["rows_scanned"] == manifest_rows
    json.dumps(rep)  # report is JSON-able by contract


def test_missing_file_is_localised(table):
    victim = _some_file(table)
    os.remove(os.path.join(table.root, victim["path"]))
    rep = table.verify()
    assert not rep["ok"]
    assert victim["path"] in rep["missing_files"]
    assert rep["error_counts"] == {"missing_files": 1}


def test_size_mismatch_is_localised_and_skipped_by_deep(table):
    victim = _some_file(table)
    with open(os.path.join(table.root, victim["path"]), "ab") as f:
        f.write(b"\x00")  # torn/partial write analogue
    rep = table.verify(deep=True)
    assert not rep["ok"]
    assert [m["path"] for m in rep["size_mismatches"]] == [victim["path"]]
    assert rep["size_mismatches"][0]["disk"] == victim["bytes"] + 1
    # the damaged file is excluded from the deep scan, so deep still runs
    assert rep["deep"]["files_checked"] == rep["files"] - 1


def test_deep_catches_manifest_stat_drift(table):
    """Manifest stats that no longer describe the data file (rows,
    LSN bounds) must trip the deep recompute even though every
    shallow check still passes."""
    snap = table.snapshot()
    bases = [f for f in snap["files"] if f.get("kind", "base") == "base"]
    a, b = bases[0], bases[1]
    t2 = _patch_manifest_entry(table, a["path"], rows=a["rows"] + 1)
    t2 = _patch_manifest_entry(t2, b["path"], lsn_max=b["lsn_min"] - 1 or -1,
                               lsn_min=b["lsn_min"] - 2)
    rep = t2.verify(deep=True)
    assert rep["error_counts"] == {}  # shallow is clean
    assert not rep["ok"]
    deep = rep["deep"]
    assert [m["path"] for m in deep["row_count_mismatches"]] == [a["path"]]
    assert deep["row_count_mismatches"][0]["actual"] == a["rows"]
    assert [m["path"] for m in deep["lsn_bound_violations"]] == [b["path"]]


def test_deep_catches_misbucketed_rows(table, spark):
    """Rows that hash to a DIFFERENT bucket than the file holding them
    (the invariant all key/bucket/semi pruning rests on) must be
    flagged even when the shallow checks all pass."""
    snap = table.snapshot()
    bases = sorted(
        (f for f in snap["files"] if f.get("kind", "base") == "base"),
        key=lambda f: -f["rows"],
    )
    a = bases[0]
    b = next(f for f in bases[1:] if f["bucket"] != a["bucket"])
    pa, pb = (os.path.join(table.root, f["path"]) for f in (a, b))
    # overwrite bucket B's file with rows from bucket A, count-matched
    swapped = spark.read.parquet(pa).limit(b["rows"])
    tmpdir = pb + ".swap"
    swapped.coalesce(1).write.mode("overwrite").parquet(tmpdir)
    part = next(p for p in os.listdir(tmpdir) if p.endswith(".parquet"))
    os.remove(pb)
    os.rename(os.path.join(tmpdir, part), pb)
    # swap Hadoop LocalFS's sidecar checksum too, or the read fails as
    # a torn file instead of exercising the bucket-membership check
    stale_crc = os.path.join(os.path.dirname(pb), f".{os.path.basename(pb)}.crc")
    if os.path.exists(stale_crc):
        os.remove(stale_crc)
    new_crc = os.path.join(tmpdir, f".{part}.crc")
    if os.path.exists(new_crc):
        os.rename(new_crc, stale_crc)
    # keep shallow green: record the swapped file's actual size
    t2 = _patch_manifest_entry(table, b["path"], bytes=os.path.getsize(pb))
    rep = t2.verify(deep=True)
    assert rep["error_counts"] == {}
    assert not rep["ok"]
    flagged = {m["path"]: m for m in rep["deep"]["misbucketed_files"]}
    assert b["path"] in flagged
    assert flagged[b["path"]]["row_buckets"] == [a["bucket"]]


def test_verify_historical_version_unaffected_by_later_damage(table, spark):
    """verify(version=N) audits that snapshot's OWN file set — a file
    only later snapshots reference can't fail an old version."""
    v1 = table.current_version()
    table.merge(_batch(spark, 300, 340, lsn0=2000), 2)
    victim = next(
        f for f in table.snapshot()["files"]
        if f["path"] not in {g["path"] for g in table.snapshot(v1)["files"]}
    )
    os.remove(os.path.join(table.root, victim["path"]))
    assert table.verify(version=v1)["ok"]          # old snapshot intact
    assert not table.verify()["ok"]                # current one is not


def test_fsck_cli_verdict_exit_code(table):
    def run(*args):
        return subprocess.run(
            [sys.executable, os.path.join(ROOT, "jobs", "maintain.py"),
             "--table", table.root, *args],
            capture_output=True, text=True, cwd=ROOT, timeout=420,
            env={**os.environ, "PYTHONPATH": ROOT},
        )
    r = run("fsck", "--deep")
    assert r.returncode == 0, r.stderr[-3000:]
    out = json.loads([ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1])
    assert out["ok"] and out["deep"]["ok"]
    os.remove(os.path.join(table.root, _some_file(table)["path"]))
    r = run("fsck")
    assert r.returncode == 3, (r.stdout[-2000:], r.stderr[-1500:])
