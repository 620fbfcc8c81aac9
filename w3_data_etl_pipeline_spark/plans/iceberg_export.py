"""Read-only export of a LakeTable snapshot in Apache Iceberg's
documented table-metadata layout (spec v2 field names:
https://iceberg.apache.org/spec/#table-metadata-fields).

Shrinks the swap-in risk of this engine's own snapshot protocol: the
export writes ``v<N>.metadata.json`` + a manifest list + one manifest
under ``<root>/_meta/iceberg/`` using the spec's exact field names
(``format-version``, ``table-uuid``, ``partition-specs`` with
``source-id``/``field-id``/``transform``, manifest ``data_file``
records with ``file_path``/``record_count``/``lower_bounds``...), so
a future real-Iceberg integration maps 1:1. Documented deviations,
pinned by tests/test_iceberg_export.py:

* manifest list + manifest are JSON, not Avro (no Avro writer in the
  image; the FIELD NAMES follow the Avro schemas in the spec);
* ``lower_bounds``/``upper_bounds``/``null_value_counts`` map field
  ids to JSON scalars, not single-value binary serializations;
* only the CURRENT snapshot is exported (history stays in this
  engine's own snapshot log);
* the export is untested against real Iceberg readers (none in this
  environment) — it is a format contract, not a compatibility claim.

MOR delta / DV entries have no Iceberg data-file equivalent (they are
this engine's upsert-image resolution protocol, not Iceberg equality/
position deletes), so exporting a table with pending deltas raises —
``compact()`` first.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid

# Iceberg primitive type names for Spark simpleString() types.
# timestamp -> timestamptz: the session TZ is pinned UTC, which is
# exactly Iceberg's timestamptz contract (UTC-adjusted values).
_TYPES = {
    "string": "string",
    "bigint": "long",
    "int": "int",
    "smallint": "int",
    "tinyint": "int",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamptz",
    "timestamp_ntz": "timestamp",
    "binary": "binary",
}

# transform names: this engine stores the plural Iceberg SQL-DDL forms
# (days(ts)); the metadata layer uses singular names
_TRANSFORMS = {
    "identity": "identity",
    "years": "year",
    "months": "month",
    "days": "day",
    "hours": "hour",
}

# required table-metadata fields per spec v2 — vendored here so the
# pytest can validate the export without pyiceberg in the image
REQUIRED_METADATA_FIELDS = (
    "format-version",
    "table-uuid",
    "location",
    "last-sequence-number",
    "last-updated-ms",
    "last-column-id",
    "schemas",
    "current-schema-id",
    "partition-specs",
    "default-spec-id",
    "last-partition-id",
    "sort-orders",
    "default-sort-order-id",
    "snapshots",
    "current-snapshot-id",
    "snapshot-log",
    "metadata-log",
    "properties",
)

REQUIRED_DATA_FILE_FIELDS = (
    "content",
    "file_path",
    "file_format",
    "spec_id",
    "partition",
    "record_count",
    "file_size_in_bytes",
)


def _ice_type(simple: str) -> str:
    if simple in _TYPES:
        return _TYPES[simple]
    m = re.fullmatch(r"decimal\((\d+),(\d+)\)", simple)
    if m:
        return f"decimal({m.group(1)}, {m.group(2)})"
    raise ValueError(f"no Iceberg mapping for Spark type {simple!r}")


def export_iceberg_metadata(table, version: int | None = None) -> str:
    """Write the export for ``version`` (default: current) and return
    the ``v<N>.metadata.json`` path."""
    snap = table.snapshot(version)
    bad = sorted(
        {f.get("kind", "base") for f in snap["files"]} - {"base"}
    )
    if bad:
        raise ValueError(
            f"snapshot v{snap['version']} holds {bad} entries — Iceberg "
            "data files are base-only; compact() before exporting"
        )
    schema = table.schema(snap)
    fids = dict(snap.get("field_ids") or {})
    # meta columns and pre-field-id tables: assign stable synthetic ids
    nxt = max(fids.values(), default=0) + 1
    for f in schema.fields:
        if f.name not in fids:
            fids[f.name] = nxt
            nxt += 1
    keys = set(snap["key_cols"])
    ice_schema = {
        "type": "struct",
        "schema-id": int(snap.get("schema_epoch", 0)),
        "identifier-field-ids": sorted(fids[k] for k in keys if k in fids),
        "fields": [
            {
                "id": fids[f.name],
                "name": f.name,
                "required": f.name in keys,
                "type": _ice_type(f.dataType.simpleString()),
            }
            for f in schema.fields
        ],
    }

    spec_id = int(snap.get("default_spec", 0) or 0)
    all_specs = snap.get("partition_specs") or {"0": []}
    id_names = {i: n for n, i in fids.items()}
    ice_specs, last_pid = [], 999
    for sid in sorted(all_specs, key=int):
        pf = []
        for i, fld in enumerate(all_specs[sid]):
            tr = _TRANSFORMS.get(fld["transform"])
            if tr is None and fld["transform"] == "truncate":
                tr = f"truncate[{fld['param']}]"
            pid = 1000 + 100 * int(sid) + i
            last_pid = max(last_pid, pid)
            pf.append(
                {
                    "name": f"{id_names.get(fld['fid'], fld['fid'])}_{tr.split('[')[0]}",
                    "transform": tr,
                    "source-id": fld["fid"],
                    "field-id": pid,
                }
            )
        ice_specs.append({"spec-id": int(sid), "fields": pf})

    out_dir = os.path.join(table.root, "_meta", "iceberg")
    os.makedirs(out_dir, exist_ok=True)
    ver = snap["version"]
    snap_id = ver  # deterministic: this engine's versions are ordinal

    # ---- one manifest (JSON with the spec's Avro field names) ----
    entries = []
    for f in snap["files"]:
        part = {}
        f_spec = all_specs.get(str(f.get("spec", 0))) or []
        for i, fld in enumerate(f_spec):
            if f.get("pt") is not None and i < len(f["pt"]):
                part[str(1000 + 100 * int(f.get("spec", 0)) + i)] = f["pt"][i]
        phys_epoch = int(f.get("epoch", 0))
        emap = (snap.get("name_log") or {}).get(str(phys_epoch)) or {}
        name_to_fid = {n: int(i) for i, n in emap.items()} or {
            n: i for n, i in fids.items()
        }
        bounds = lambda key: {  # noqa: E731
            str(name_to_fid[c]): v
            for c, v in (f.get(key) or {}).items()
            if c in name_to_fid
        }
        entries.append(
            {
                "status": 1,  # ADDED (single-snapshot export)
                "snapshot_id": snap_id,
                "sequence_number": ver,
                "data_file": {
                    "content": 0,
                    "file_path": os.path.join(table.root, f["path"]),
                    "file_format": "PARQUET",
                    "spec_id": int(f.get("spec", 0)),
                    "partition": part,
                    "record_count": f.get("rows"),
                    "file_size_in_bytes": f.get("bytes"),
                    "lower_bounds": bounds("cmin"),
                    "upper_bounds": bounds("cmax"),
                    "null_value_counts": bounds("cnull"),
                },
            }
        )
    man_path = os.path.join(out_dir, f"manifest-{ver}-{uuid.uuid4().hex[:8]}.json")
    with open(man_path, "w") as fh:
        json.dump({"schema": ice_schema, "entries": entries}, fh, indent=1)

    man_list = [
        {
            "manifest_path": man_path,
            "manifest_length": os.path.getsize(man_path),
            "partition_spec_id": spec_id,
            "content": 0,
            "sequence_number": ver,
            "min_sequence_number": ver,
            "added_snapshot_id": snap_id,
            "added_files_count": len(entries),
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": sum(e["data_file"]["record_count"] or 0 for e in entries),
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
        }
    ]
    list_path = os.path.join(out_dir, f"snap-{snap_id}-manifest-list.json")
    with open(list_path, "w") as fh:
        json.dump(man_list, fh, indent=1)

    now_ms = int(time.time() * 1000)
    meta = {
        "format-version": 2,
        "table-uuid": str(uuid.uuid5(uuid.NAMESPACE_URL, table.root)),
        "location": table.root,
        "last-sequence-number": ver,
        "last-updated-ms": now_ms,
        "last-column-id": max(fids.values()),
        "schemas": [ice_schema],
        "current-schema-id": ice_schema["schema-id"],
        "partition-specs": ice_specs,
        "default-spec-id": spec_id,
        "last-partition-id": last_pid,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "default-sort-order-id": 0,
        "snapshots": [
            {
                "snapshot-id": snap_id,
                "sequence-number": ver,
                "timestamp-ms": now_ms,
                "manifest-list": list_path,
                "summary": {
                    "operation": "append",
                    "engine-operation": snap.get("operation") or "unknown",
                    "total-data-files": str(len(entries)),
                },
                "schema-id": ice_schema["schema-id"],
            }
        ],
        "current-snapshot-id": snap_id,
        "snapshot-log": [{"snapshot-id": snap_id, "timestamp-ms": now_ms}],
        "metadata-log": [],
        "properties": {
            "write.format.default": "parquet",
            "bucket-layout": f"pmod(xxhash64(keys), {snap['n_buckets']})",
        },
    }
    meta_path = os.path.join(out_dir, f"v{ver}.metadata.json")
    tmp = meta_path + f".tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        json.dump(meta, fh, indent=1)
    os.replace(tmp, meta_path)
    return meta_path
