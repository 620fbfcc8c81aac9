"""Kafka-shaped broker double (environment-blocked integration seam).

No Kafka broker ships in this image, so this module provides a
file-backed broker exposing EXACTLY the Kafka source contract — same
output schema (``key binary, value binary, topic, partition, offset,
timestamp, timestampType``), same option surface (``startingOffsets``
earliest/latest/per-partition JSON, ``maxOffsetsPerTrigger``
backpressure), same per-partition monotonic offsets and checkpointed
resume — implemented as a PySpark 4 Python Data Source
(``spark.dataSource.register`` + ``readStream.format("kafka_shaped")``).

Swapping in real Kafka is a CONFIG change, not code:

    spark.readStream.format("kafka")            # was "kafka_shaped"
         .option("kafka.bootstrap.servers", ...) # was .option("path", ...)
         .option("subscribe", topic)
         .option("startingOffsets", "earliest")   # unchanged
         .option("maxOffsetsPerTrigger", 50000)   # unchanged
    parse_change_events(df)                       # unchanged
    run_stream_from(parsed, table, ckpt)          # unchanged

Broker layout: ``root/p=N/data.jsonl`` — one JSON record per line,
offset == line number (append-only, like a Kafka log segment). The
producer keys records by (repo, path) and hash-partitions on the key,
so per-key order is preserved within a partition — the same ordering
contract a keyed Kafka topic gives the engine.
"""

from __future__ import annotations

import json
import os
import zlib
from base64 import b64decode, b64encode
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

from ..schemas import CHANGE_EVENTS

KAFKA_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset long, timestamp timestamp, timestampType int"
)


def _part_dir(root: str, p: int) -> str:
    return os.path.join(root, f"p={p}")


def _part_log(root: str, p: int) -> str:
    return os.path.join(_part_dir(root, p), "data.jsonl")


def _list_partitions(root: str) -> list[int]:
    if not os.path.isdir(root):
        return []
    return sorted(
        int(d.split("=", 1)[1]) for d in os.listdir(root) if d.startswith("p=")
    )


def _end_offset(root: str, p: int) -> int:
    path = _part_log(root, p)
    if not os.path.exists(path):
        return 0
    with open(path, "rb") as f:
        return sum(1 for _ in f)


class BrokerProducer:
    """Append-only producer onto the broker directory. Records are
    keyed and hash-partitioned (Kafka's keyed-topic contract: all
    events of one key land in one partition, in send order)."""

    def __init__(self, root: str, n_partitions: int = 4, topic: str = "changes"):
        self.root, self.n, self.topic = root, n_partitions, topic
        for p in range(n_partitions):
            os.makedirs(_part_dir(root, p), exist_ok=True)
            open(_part_log(root, p), "a").close()

    def send(self, value: bytes, key: bytes | None = None, ts: float | None = None) -> int:
        # crc32, not hash(): Python's bytes hash is salted per process,
        # and the partitioner must be stable across producers
        p = (zlib.crc32(key) & 0x7FFFFFFF) % self.n if key is not None else 0
        rec = {
            "key": b64encode(key).decode() if key is not None else None,
            "value": b64encode(value).decode(),
            "ts": ts if ts is not None else 0.0,
        }
        with open(_part_log(self.root, p), "a") as f:
            f.write(json.dumps(rec) + "\n")
        return p

    def send_change_events(self, rows: list[dict]) -> None:
        """Change-event dicts -> JSON values keyed by (repo, path)."""
        for r in rows:
            r = dict(r)
            ts = r.get("event_ts")
            if ts is not None and not isinstance(ts, str):
                r["event_ts"] = ts.isoformat(sep=" ")
            key = f"{r['repo']}\x00{r['path']}".encode()
            self.send(json.dumps(r).encode(), key=key)

    def end_offsets(self) -> dict[str, int]:
        return {str(p): _end_offset(self.root, p) for p in range(self.n)}


class _BrokerPartition(InputPartition):
    def __init__(self, root: str, topic: str, p: int, start: int, end: int):
        self.root, self.topic, self.p, self.start, self.end = root, topic, p, start, end


class _BrokerStreamReader(DataSourceStreamReader):
    """Offset-tracked reader over the broker directory.

    ``maxOffsetsPerTrigger`` caps the total offset advance planned per
    microbatch (spread proportionally across partitions, like Kafka's
    rate limit). The cap is applied relative to the last offset this
    reader planned or committed; the first batch after a cold restart
    replays exactly the checkpointed range (Spark replans it from the
    offset log without consulting this reader)."""

    def __init__(self, options: dict):
        options = {k.lower(): v for k, v in options.items()}
        self.root = options.get("path")
        if not self.root:
            raise ValueError("kafka_shaped requires .option('path', <broker dir>)")
        self.topic = options.get("topic", "changes")
        self.starting = options.get("startingoffsets", "earliest")
        cap = options.get("maxoffsetspertrigger")
        self.cap = int(cap) if cap is not None else None
        self._last: dict[str, int] | None = None

    def _ends(self) -> dict[str, int]:
        return {
            str(p): _end_offset(self.root, p) for p in _list_partitions(self.root)
        }

    def initialOffset(self) -> dict:
        if self.starting == "earliest":
            off = {str(p): 0 for p in _list_partitions(self.root)}
        elif self.starting == "latest":
            off = self._ends()
        else:  # per-partition JSON, the Kafka shape: {"topic": {"0": 5}}
            spec = json.loads(self.starting)
            inner = spec.get(self.topic, spec)
            off = {str(k): int(v) for k, v in inner.items()}
        self._last = dict(off)
        return off

    def latestOffset(self) -> dict:
        ends = self._ends()
        base = self._last
        if base is None:
            # restarted mid-stream: Spark replays the checkpointed
            # batch itself; the first NEW batch baselines here
            base = {k: 0 for k in ends} if self.starting == "earliest" else ends
            self._last = dict(base)
        if self.cap is not None:
            lag = {k: ends[k] - base.get(k, 0) for k in ends}
            total = sum(lag.values())
            if total > self.cap:
                # proportional split, ≥0 each, exact total == cap
                planned, acc = {}, 0
                keys = sorted(ends)
                for i, k in enumerate(keys):
                    if i == len(keys) - 1:
                        take = self.cap - acc
                    else:
                        take = min(lag[k], self.cap * lag[k] // total)
                    take = max(0, min(take, lag[k]))
                    planned[k] = base.get(k, 0) + take
                    acc += take
                self._last = dict(planned)
                return planned
        self._last = dict(ends)
        return ends

    def partitions(self, start: dict, end: dict):
        # baseline the cap tracker off the real plan (covers restart,
        # where this reader never saw `start` before)
        self._last = {
            k: max(int(end.get(k, 0)), (self._last or {}).get(k, 0))
            for k in set(start) | set(end)
        }
        out = []
        for k in sorted(set(start) | set(end)):
            s, e = int(start.get(k, 0)), int(end.get(k, 0))
            if e > s:
                out.append(_BrokerPartition(self.root, self.topic, int(k), s, e))
        return out or [_BrokerPartition(self.root, self.topic, 0, 0, 0)]

    def read(self, partition: _BrokerPartition):
        path = _part_log(partition.root, partition.p)
        if not os.path.exists(path) or partition.end <= partition.start:
            return
        with open(path) as f:
            for off, line in enumerate(f):
                if off < partition.start:
                    continue
                if off >= partition.end:
                    break
                rec = json.loads(line)
                key = b64decode(rec["key"]) if rec.get("key") else None
                yield (
                    key,
                    b64decode(rec["value"]),
                    partition.topic,
                    partition.p,
                    off,
                    datetime.fromtimestamp(rec.get("ts", 0.0), tz=timezone.utc),
                    0,
                )

    def commit(self, end: dict) -> None:
        if self._last is not None:
            self._last = {
                k: max(int(v), self._last.get(k, 0)) for k, v in end.items()
            }


class KafkaShapedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kafka_shaped"

    def schema(self) -> str:
        return KAFKA_SCHEMA

    def streamReader(self, schema):
        return _BrokerStreamReader(self.options)


def register(spark: SparkSession) -> None:
    spark.dataSource.register(KafkaShapedDataSource)


def read_broker(
    spark: SparkSession,
    root: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """readStream over the broker double with the Kafka option names."""
    register(spark)
    r = (
        spark.readStream.format("kafka_shaped")
        .option("path", root)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        r = r.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    return r.load()


def parse_change_events(kafka_df: DataFrame) -> DataFrame:
    """Kafka frame -> CHANGE_EVENTS columns. Identical over real Kafka:
    the value is a JSON change event; the cast/from_json runs JVM-side
    (no Python row path)."""
    return kafka_df.select(
        F.from_json(F.col("value").cast("string"), CHANGE_EVENTS).alias("e")
    ).select("e.*")
