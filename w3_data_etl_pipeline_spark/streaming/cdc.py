"""Structured-Streaming CDC driver.

Tails a change-event source (file-based WAL segments here; the same
``foreachBatch`` body works over Kafka on a cluster), and per
microbatch: salted-repartition -> vectorized enrichment -> max-LSN
dedup -> LakeTable MERGE, all inside an exactly-once envelope:

* the streaming checkpoint (``checkpointLocation``) makes the source
  offsets replayable, and
* the LakeTable ledger makes the apply idempotent per ``batch_id``,

so a kill/resume replays at most one microbatch and the replay is a
metadata no-op — the end state is byte-identical (north rule).

Replaces the reference's weekly Airflow batch trigger
(reference src/dags/w3c.py:49-54) with incremental microbatches.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..functions.enrich import enrich_changes
from ..operators.skew import salted_repartition
from ..plans.laketable import LakeTable, MergeStats


@dataclass
class CdcRun:
    stats: list[MergeStats] = field(default_factory=list)


def apply_batch(
    table: LakeTable,
    events: DataFrame,
    batch_id: int,
    enrich: bool = True,
    salt_partitions: int | None = None,
    mode: str = "cow",
) -> MergeStats:
    """One microbatch apply. Safe to call repeatedly with the same
    batch_id (ledger no-op) — this is the foreachBatch body.

    Order: (salt ->) dedup -> enrich -> merge. Deduping FIRST means
    the Arrow enrichment UDFs only touch rows that survive — under
    hot-key skew a large fraction of the batch collapses in the
    window, and post-dedup partitions are one-row-per-key so the
    enrichment stage needs no salting at all. Salting still applies
    to any pre-dedup map work when requested.
    """
    if salt_partitions:
        events = salted_repartition(events, ["repo", "path"], "lsn", salt_partitions)
    from ..operators.dedupe import latest_by_key

    keys = table.snapshot()["key_cols"]
    order = ["lsn"] + (["commit"] if "commit" in events.columns else [])
    deduped = latest_by_key(events, keys, order)
    if enrich and "lang" in deduped.columns:
        deduped = enrich_changes(deduped)
    return table.merge(deduped, batch_id, mode=mode, assume_deduped=True)


def run_stream(
    spark: SparkSession,
    table: LakeTable,
    events_dir: str,
    checkpoint_dir: str,
    schema: T.StructType,
    max_files_per_trigger: int = 1,
    enrich: bool = True,
    salt_partitions: int | None = None,
    mode: str = "cow",
) -> CdcRun:
    """Drain all currently-available WAL segments through the engine
    (``availableNow`` trigger), then stop. Calling again after more
    segments land — or after a kill — resumes from the checkpoint.
    """
    run = CdcRun()
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )

    def _sink(df: DataFrame, batch_id: int) -> None:
        run.stats.append(
            apply_batch(
                table, df, batch_id, enrich=enrich, salt_partitions=salt_partitions, mode=mode
            )
        )

    q = (
        src.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return run
