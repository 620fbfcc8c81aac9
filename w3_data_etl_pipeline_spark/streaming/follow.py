"""Table-to-table incremental pipelines: follow one LakeTable's
change feed into another, exactly-once (the Delta streaming-source /
Iceberg incremental-read analogue for DERIVED tables).

A 100 TB lakehouse is rarely one table: the ingest target feeds
filtered/projected derivatives (per-language corpora, PII-redacted
mirrors, downstream feature tables). Recomputing a derivative per
upstream commit is O(table); following the change feed is O(changed
rows). This module packages that as a resumable follower with NO
separate checkpoint store: the downstream table's own exactly-once
ledger is the offset ledger — each applied step commits zero-based
upstream-version ids (the whole covered range, so the contiguous
prefix folds into the ledger hwm and ledger size stays O(1) over any
number of steps), the resume point is read back from the ledger, and
a crash between steps re-applies nothing
(``merge`` no-ops on a seen batch_id; ledger and data commit in the
same snapshot write, so there is no window where one moved without
the other). The downstream table must be EXCLUSIVELY follower-fed:
its ledger ids are interpreted as upstream versions, so interleaving
unrelated merges with their own batch ids would corrupt the resume
point (maintenance — compact/expire/rebucket — is fine; it never
touches the ledger).

Ordering/correctness: step [v0, v1] applies ``src.changes(v0, v1)``
(net per-key effect) with ``lsn = v1`` and op D for deletes — steps
are applied in version order and lsn grows per step, so downstream
last-writer-wins resolution replays upstream history faithfully even
across follower restarts, upstream rollbacks (the feed emits net
retractions), and MOR/COW storage changes (the feed is
storage-agnostic).

``transform`` contract: receives the change DataFrame (key columns +
upstream value columns + ``_change_type``) and must return the key
columns + the DOWNSTREAM value columns + ``_change_type``. It may
rename/derive/drop value columns freely. If it FILTERS rows, the
predicate must depend only on columns that are immutable per key
(e.g. the key itself): a value-dependent filter would drop the
delete/update that retires a previously-passed row, leaving the
derivative stale — same rule Delta documents for CDF consumers.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.laketable import LakeTable


def applied_source_version(dst: LakeTable) -> int:
    """The follower's resume point: the highest upstream version whose
    step committed into ``dst`` — read from dst's own exactly-once
    ledger, no side checkpoint. Ledger ids are ZERO-BASED upstream
    versions (id v-1 marks version v applied) and every step records
    its whole covered range, so the contiguous prefix folds into the
    ledger's hwm and ledger size stays O(1) over any number of steps.
    0 for a virgin table (upstream version 0 is the empty create)."""
    led = LakeTable._ledger_migrate(dst.snapshot()["ledger"])
    ids = [led["hwm"]] + [int(k) for k in led["extra"]]
    return max(-1, *ids) + 1


def sync_changes(
    src: LakeTable,
    dst: LakeTable,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    max_versions_per_batch: int = 8,
    until_version: int | None = None,
) -> dict:
    """One catch-up pass: apply ``src``'s change feed into ``dst`` from
    the ledger resume point up to ``until_version`` (default: src's
    current version, pinned once so a racing upstream writer can't
    turn the pass into a chase). Each step covers at most
    ``max_versions_per_batch`` upstream versions — the feed nets
    intermediate states per key, so wider steps move fewer rows but
    make coarser lineage. Returns counts; idempotent and safe to call
    concurrently (losers no-op through the ledger)."""
    keys = dst.snapshot()["key_cols"]
    cur = src.current_version() if until_version is None else until_version
    v0 = applied_source_version(dst)
    steps = 0
    skipped = 0
    rows = 0
    while v0 < cur:
        v1 = min(v0 + max_versions_per_batch, cur)
        delta = src.changes(v0, v1)
        if transform is not None:
            delta = transform(delta)
        missing = [c for c in keys if c not in delta.columns]
        if missing or "_change_type" not in delta.columns:
            raise ValueError(
                f"transform must keep key columns {keys} and _change_type; "
                f"missing {missing or ['_change_type']}"
            )
        ev = delta.select(
            *[c for c in delta.columns if c != "_change_type"],
            F.lit(v1).cast("long").alias("lsn"),
            F.when(F.col("_change_type") == "delete", F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
        )
        stats = dst.merge(
            ev,
            batch_id=v1 - 1,  # zero-based so the ledger prefix folds
            covered_batch_ids=tuple(range(v0, v1 - 1)),
        )
        if stats.applied:
            steps += 1
            rows += stats.deduped_rows or 0
        else:
            skipped += 1  # a concurrent follower won this step
        v0 = v1
    return {
        "applied_through": v0,
        "source_version": cur,
        "steps": steps,
        "skipped": skipped,
        "rows": rows,
    }


def follow_changes(
    src: LakeTable,
    dst: LakeTable,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    max_versions_per_batch: int = 8,
    poll_interval: float = 0.5,
    max_polls: int | None = None,
    stop_when_caught_up: bool = False,
) -> dict:
    """Long-running follower: repeatedly ``sync_changes`` as upstream
    commits land. ``stop_when_caught_up`` makes it a drain (tests,
    backfills); otherwise it polls until ``max_polls``. Restart-safe
    by construction — the resume point lives in dst's ledger."""
    polls = 0
    totals = {"steps": 0, "rows": 0, "applied_through": applied_source_version(dst)}
    while True:
        out = sync_changes(
            src, dst, transform=transform,
            max_versions_per_batch=max_versions_per_batch,
        )
        totals["steps"] += out["steps"]
        totals["rows"] += out["rows"]
        totals["applied_through"] = out["applied_through"]
        caught_up = out["applied_through"] >= src.current_version()
        if caught_up and stop_when_caught_up:
            return totals
        polls += 1
        if max_polls is not None and polls >= max_polls:
            return totals
        time.sleep(poll_interval)
