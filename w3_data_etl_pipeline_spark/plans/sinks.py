"""CDC sink contract: the interface `streaming.cdc.apply_batch`
actually depends on, made explicit so the LakeTable backend is
provably swappable (the "Iceberg-swappable" claim in laketable.py).

A sink is anything with::

    merge(events: DataFrame, batch_id: int, mode: str=...) -> MergeStats
    state_fingerprint() -> DataFrame   # (key_cols..., content_sha)

semantics: last-writer-wins per key by (lsn, commit), 'D' tombstones
delete, re-merging an applied batch_id is a no-op (exactly-once), and
two sinks fed the same batches must produce identical fingerprints.

``DictSink`` is the trivial second implementation: a driver-side dict
applying events one at a time (collect-based — test scale ONLY, it is
the contract witness, not a production path). On a real cluster the
swap target is an Iceberg/Delta `MERGE INTO` writer with the same
method surface; tests/test_sink_contract.py holds both backends to
identical results.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession

from .laketable import MergeStats


class DictSink:
    def __init__(self, spark: SparkSession, key_cols: list[str]):
        self.spark = spark
        self.key_cols = key_cols
        self.state: dict[tuple, dict] = {}
        self.applied_batches: set[int] = set()
        self.version = 0

    def load(self, rows: list[dict]) -> None:
        for r in rows:
            self.state[tuple(r[k] for k in self.key_cols)] = dict(r)

    def merge(self, events: DataFrame, batch_id: int, mode: str = "cow") -> MergeStats:
        if batch_id in self.applied_batches:
            return MergeStats(batch_id=batch_id, applied=False, version=self.version)
        rows = [r.asDict() for r in events.collect()]
        rows.sort(key=lambda e: (e["lsn"], e.get("commit") or ""))
        for e in rows:
            k = tuple(e[c] for c in self.key_cols)
            prev = self.state.get(k)
            if prev is not None and e["lsn"] < prev.get("lsn", 0):
                continue  # stale
            if e["op"] == "D":
                self.state.pop(k, None)
            else:
                self.state[k] = {c: v for c, v in e.items() if c not in ("op", "event_ts")}
        self.applied_batches.add(batch_id)
        self.version += 1
        return MergeStats(
            batch_id=batch_id, applied=True, version=self.version, deduped_rows=len(rows)
        )

    def state_fingerprint(self) -> DataFrame:
        data = [
            (*k, hashlib.sha256((v.get("content") or "").encode()).hexdigest())
            for k, v in self.state.items()
        ]
        schema = ", ".join(f"{c} string" for c in self.key_cols) + ", content_sha string"
        return self.spark.createDataFrame(data, schema)
