"""Iceberg metadata export contract (plans/iceberg_export.py):
spec-v2 field names validated against the vendored required-field
lists, manifest file set round-trips against files(), partition
tuples and field-id-keyed bounds survive renames, MOR-delta exports
refuse, and the documented deviations stay documented.
"""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from w3_data_etl_pipeline_spark.plans.iceberg_export import (
    REQUIRED_DATA_FILE_FIELDS,
    REQUIRED_METADATA_FIELDS,
)
from w3_data_etl_pipeline_spark.plans.laketable import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("lang", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

EPOCH = dt.datetime(2024, 3, 1)


def _mk(spark, tmp_path, days=3, spec=True):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["event_id"], n_buckets=4)
    if spec:
        t.alter_partition_spec(["days(ts)"])
    rows = [
        (i, EPOCH + dt.timedelta(days=i % days), "py", float(i), i + 10, "U")
        for i in range(30)
    ]
    t.merge(
        spark.createDataFrame(rows, ["event_id", "ts", "lang", "value", "lsn", "op"]),
        0,
    )
    return t


def test_metadata_shape_and_roundtrip(spark, tmp_path):
    t = _mk(spark, tmp_path)
    meta_path = t.export_iceberg_metadata()
    meta = json.load(open(meta_path))
    for k in REQUIRED_METADATA_FIELDS:
        assert k in meta, f"missing table-metadata field {k}"
    assert meta["format-version"] == 2
    assert meta["current-schema-id"] == meta["schemas"][0]["schema-id"]
    fields = meta["schemas"][0]["fields"]
    assert all({"id", "name", "required", "type"} <= set(f) for f in fields)
    by_name = {f["name"]: f for f in fields}
    assert by_name["event_id"]["required"] and by_name["event_id"]["type"] == "long"
    assert by_name["ts"]["type"] == "timestamptz"
    # key columns are the identifier fields (Iceberg row identity)
    assert meta["schemas"][0]["identifier-field-ids"] == [by_name["event_id"]["id"]]
    # partition spec: days(ts) under the singular metadata name
    spec = next(s for s in meta["partition-specs"] if s["spec-id"] == meta["default-spec-id"])
    assert spec["fields"][0]["transform"] == "day"
    assert spec["fields"][0]["source-id"] == by_name["ts"]["id"]
    assert spec["fields"][0]["field-id"] >= 1000

    # manifest-list -> manifest -> data files round-trips files()
    mlist = json.load(open(meta["snapshots"][0]["manifest-list"]))
    assert mlist[0]["added_files_count"] > 0
    man = json.load(open(mlist[0]["manifest_path"]))
    exported = {e["data_file"]["file_path"] for e in man["entries"]}
    live = {os.path.join(t.root, r["path"]) for r in t.files().collect()}
    assert exported == live
    for e in man["entries"]:
        for k in REQUIRED_DATA_FILE_FIELDS:
            assert k in e["data_file"], f"missing data_file field {k}"
        df = e["data_file"]
        assert df["file_format"] == "PARQUET" and df["content"] == 0
        assert df["record_count"] > 0 and df["file_size_in_bytes"] > 0
        # partition tuple keyed by the spec's partition field id
        pid = str(spec["fields"][0]["field-id"])
        assert pid in df["partition"]
        # bounds keyed by FIELD ID, value-typed
        vid = str(by_name["value"]["id"])
        assert vid in df["lower_bounds"] and vid in df["upper_bounds"]
        assert df["lower_bounds"][vid] <= df["upper_bounds"][vid]
    assert sum(e["data_file"]["record_count"] for e in man["entries"]) == 30


def test_bounds_follow_field_ids_across_rename(spark, tmp_path):
    t = _mk(spark, tmp_path, spec=False)
    vid = t.snapshot()["field_ids"]["value"]
    t.rename_column("value", "metric")
    meta = json.load(open(t.export_iceberg_metadata()))
    by_name = {f["name"]: f for f in meta["schemas"][0]["fields"]}
    assert by_name["metric"]["id"] == vid
    man = json.load(
        open(json.load(open(meta["snapshots"][0]["manifest-list"]))[0]["manifest_path"])
    )
    # files written under the OLD physical name still key their bounds
    # by the same field id the renamed column carries
    assert all(str(vid) in e["data_file"]["lower_bounds"] for e in man["entries"])


def test_mor_delta_export_refuses(spark, tmp_path):
    t = _mk(spark, tmp_path, spec=False)
    t.merge(
        spark.createDataFrame(
            [(1, EPOCH, "rs", 9.0, 99, "U")],
            ["event_id", "ts", "lang", "value", "lsn", "op"],
        ),
        1,
        mode="mor",
    )
    with pytest.raises(ValueError, match="compact"):
        t.export_iceberg_metadata()
    t.compact()
    assert os.path.exists(t.export_iceberg_metadata())


def test_export_is_versioned_and_readonly(spark, tmp_path):
    t = _mk(spark, tmp_path, spec=False)
    v1 = t.current_version()
    p1 = t.export_iceberg_metadata()
    n_files_before = len(t.snapshot()["files"])
    t.merge(
        spark.createDataFrame(
            [(99, EPOCH, "go", 1.0, 500, "U")],
            ["event_id", "ts", "lang", "value", "lsn", "op"],
        ),
        1,
    )
    p2 = t.export_iceberg_metadata()
    assert p1 != p2 and os.path.basename(p1) == f"v{v1}.metadata.json"
    # the export wrote only under _meta/iceberg — table state unchanged
    assert len(t.snapshot(v1)["files"]) == n_files_before
    # exporting a PAST version still works (time-travel export)
    assert os.path.exists(t.export_iceberg_metadata(version=v1))
