"""Incrementally-maintained JOIN views: a materialized storage-
partitioned join of two LakeTables, kept fresh from both sides'
change feeds at cost ∝ CHANGED BUCKETS — the two-source extension of
``streaming.follow`` (which maintains filter/project derivatives of
ONE table).

Why this shape works: the SPJ contract already requires the join keys
to cover both tables' bucket keys, so the join is KEY-ALIGNED — each
left key matches at most one right key and vice versa, and a change
to either side can only affect view rows in the SAME co-located
bucket group. A sync therefore:

1. diffs both sides' manifest pointers since the stored cursors
   (``changed_buckets`` — O(metadata), no data read),
2. recomputes the join for JUST those bucket groups with
   ``join_bucketed(buckets=...)`` (zero-shuffle, executor-local),
3. merges the recomputed rows as full images plus 'D' tombstones for
   keys that left the join (one anti-join over the view's own rows in
   those groups — also bucket-pruned, since the view shares the
   layout),
4. commits the new source cursors ATOMICALLY with the data via merge
   snapshot props — the cursors move iff the data moved, so a crash
   anywhere replays a deterministic recompute and exactly-once holds
   with NO side checkpoint (the follower-ledger idea, generalized to
   two sources).

At 100 TB: a microbatch touching k of B buckets costs one SPJ over k
bucket groups plus one merge of those groups' rows — never a
full-table join. A full refresh is only ever paid once, at view
creation (cursors start at 0, every touched bucket is "changed").

The view table must be EXCLUSIVELY view-fed (same contract as
``follow``): its ledger ids are sync sequence numbers and its
``join_view`` snapshot prop is the resume point; maintenance
(compact/expire) is fine — properties and ledger ride the parent
snapshot dict through every commit.

Documented limitation: the view pins its column NAMES at creation.
Renaming a source column afterwards changes the SPJ output name, so
the next sync would evolve the view additively (new column appears,
old stops filling) instead of renaming in place — rename the view's
own column first (`view.rename_column`) or recreate the view. Source
bucket-count changes (rebucket) that break divisibility are rejected
by the SPJ's own plan-time check, never silently wrong.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.laketable import LSN_COL, LakeTable

PROP = "join_view"  # snapshot property carrying cursors + seq


def create_join_view(
    left: LakeTable,
    right: LakeTable,
    dest_root: str,
    how: str = "inner",
    on: "list[tuple[str, str] | str] | None" = None,
    select: "list[str] | None" = None,
) -> LakeTable:
    """Create the (empty) view table for ``left ⋈ right``: schema from
    a dry SPJ plan, keyed on the left key names, bucketed at the
    COARSER of the two sources' counts so view buckets coincide with
    SPJ bucket groups (what makes vanished-key detection and future
    SPJs over the view itself bucket-pruned). Populate with
    ``sync_join_view``."""
    keys = left.snapshot()["key_cols"]
    if select is not None and not set(keys) <= set(select):
        raise ValueError(f"select must keep the view keys {keys}")
    probe = left.join_bucketed(right, on=on, how=how, select=select)
    schema = T.StructType(
        [f for f in probe.schema.fields if f.name != LSN_COL]
    )
    bc = min(left.snapshot()["n_buckets"], right.snapshot()["n_buckets"])
    view = LakeTable.create(left.spark, dest_root, schema, keys, n_buckets=bc)
    return view


def view_state(view: LakeTable) -> dict:
    """The view's resume point: source cursors + sync sequence, read
    from the view's own snapshot properties (committed atomically with
    each sync's merge — no side checkpoint)."""
    return dict(
        view.snapshot().get(PROP) or {"left": 0, "right": 0, "seq": -1}
    )


def sync_join_view(
    left: LakeTable,
    right: LakeTable,
    view: LakeTable,
    how: str = "inner",
    on: "list[tuple[str, str] | str] | None" = None,
    select: "list[str] | None" = None,
) -> dict:
    """One catch-up pass: bring ``view`` up to both sources' current
    versions. Idempotent (replaying a committed sync no-ops through
    the view's ledger) and crash-safe (cursors live in the same
    snapshot commit as the data). Returns counts; ``groups`` is the
    incrementality evidence — how many bucket groups were recomputed
    out of the view's total."""
    st = view_state(view)
    lv, rv = left.current_version(), right.current_version()
    if lv == st["left"] and rv == st["right"]:
        return {"applied": False, "groups": 0, "rows": 0, **st}
    snap = view.snapshot()
    bc = snap["n_buckets"]
    keys = snap["key_cols"]
    for name, src in (("left", left), ("right", right)):
        nb = src.snapshot()["n_buckets"]
        if nb % bc != 0:
            # a rebucket to a non-multiple of the view's group count
            # would silently mis-map changed buckets to groups —
            # refuse instead (rebucket to a multiple, or recreate the
            # view). A rebucket to a compatible multiple is safe:
            # bucket-id mod bc is preserved for every key, and the
            # rebucket commit itself touches every bucket, forcing
            # the conservative full resync.
            raise ValueError(
                f"{name} table was rebucketed to {nb}, not a multiple of "
                f"the view's {bc} groups — recreate the view or rebucket "
                "to a compatible count"
            )
    groups = sorted(
        {b % bc for b in left.changed_buckets(st["left"], lv)}
        | {b % bc for b in right.changed_buckets(st["right"], rv)}
    )
    seq = st["seq"] + 1
    props = {PROP: {"left": lv, "right": rv, "seq": seq}}
    if not groups:
        # metadata-only source commits: nothing to recompute, but the
        # cursors still advance so the next diff starts here — an
        # empty merge batch carries them (ledger + props, no files)
        stats = view.merge(_empty_events(view, snap), seq, props=props)
        return {"applied": stats.applied, "groups": 0, "rows": 0, **props[PROP]}
    # full truth for the changed groups, at the pinned source versions
    state = left.join_bucketed(
        right,
        on=on,
        how=how,
        select=select,
        buckets=groups,
        version=lv,
        other_version=rv,
    )
    fresh = state.select(
        *state.columns,
        F.lit(seq).cast("long").alias("lsn"),
        F.lit("U").alias("op"),
    )
    # keys that LEFT the join in these groups -> delete tombstones
    old_keys = _read_bucket_keys(view, snap, groups)
    gone = old_keys.join(state.select(*keys), keys, "left_anti")
    dels = gone.select(
        *keys,
        *[
            F.lit(None).cast(f.dataType).alias(f.name)
            for f in state.schema.fields
            if f.name not in keys
        ],
        F.lit(seq).cast("long").alias("lsn"),
        F.lit("D").alias("op"),
    )
    stats = view.merge(fresh.unionByName(dels), seq, props=props)
    return {
        "applied": stats.applied,
        "groups": len(groups),
        "total_groups": bc,
        "rows": stats.deduped_rows or 0,
        **props[PROP],
    }


def _empty_events(view: LakeTable, snap: dict):
    fields = [f for f in view.schema(snap).fields if f.name != LSN_COL]
    schema = T.StructType(
        fields
        + [T.StructField("lsn", T.LongType()), T.StructField("op", T.StringType())]
    )
    return view.spark.createDataFrame([], schema)


def _read_bucket_keys(view: LakeTable, snap: dict, groups: list[int]):
    """The view's current key set in the given buckets — a pruned scan
    over just those buckets' files (the view's bucket ids ARE the SPJ
    group ids by construction)."""
    gset = set(groups)
    files = [f for f in snap["files"] if f["bucket"] in gset]
    keys = snap["key_cols"]
    if not files:
        return view.spark.createDataFrame(
            [], T.StructType([view.schema(snap)[k] for k in keys])
        )
    df, has_delta = view._scan(files, snap)
    if has_delta:
        df = view._resolve(df, snap)
    return df.select(*keys)


def follow_join_view(
    left: LakeTable,
    right: LakeTable,
    view: LakeTable,
    how: str = "inner",
    on: "list[tuple[str, str] | str] | None" = None,
    select: "list[str] | None" = None,
    poll_interval: float = 0.5,
    max_polls: int | None = None,
    stop_when_caught_up: bool = False,
) -> dict:
    """Long-running view maintainer: repeatedly ``sync_join_view`` as
    either source commits. Mirrors ``follow.follow_changes`` —
    restart-safe by construction (the resume point lives in the
    view's own snapshot props), ``stop_when_caught_up`` makes it a
    drain for tests/backfills."""
    import time

    polls = 0
    totals = {"syncs": 0, "rows": 0, "groups": 0}
    while True:
        out = sync_join_view(left, right, view, how=how, on=on, select=select)
        if out["applied"]:
            totals["syncs"] += 1
            totals["rows"] += out["rows"]
            totals["groups"] += out["groups"]
        st = view_state(view)
        caught_up = (
            st["left"] >= left.current_version()
            and st["right"] >= right.current_version()
        )
        if caught_up and stop_when_caught_up:
            return {**totals, **st}
        polls += 1
        if max_polls is not None and polls >= max_polls:
            return {**totals, **st}
        time.sleep(poll_interval)
