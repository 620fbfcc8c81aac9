"""Connected components over near-duplicate pair graphs.

The dedup family (exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding near-dup) emits PAIRS; turning pairs into keep/drop
decisions needs the transitive closure — docs A~B and B~C must land
in ONE cluster with ONE representative even though (A,C) was never
emitted. This is the alternating large-star / small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14): O(log^2 n) rounds worst-case (2 shuffles per round), no
driver-side graph state, so it scales to billions of edges where a
single-machine union-find cannot.

Reference parity note: w3-data-etl-pipeline has no graph operator —
this extends its dedup story the way a training-data pipeline needs
(cited as an addition, not a port; see SURVEY.md §2 addendum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ROUNDS = 50


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    """(n_edges, order-insensitive hash) — one cheap aggregate action
    per round to detect convergence without materializing a diff."""
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).head()
    return int(row["n"]), int(row["h"])


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u}).

    Plan: symmetrize (no shuffle — union) -> groupBy u min (1 shuffle)
    -> join back on u (co-partitioned with the agg: reuses the
    exchange) -> distinct (1 shuffle)."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = sym.groupBy("u").agg(F.min("v").alias("mv")).select(
        "u", F.least("mv", "u").alias("m")
    )
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect every smaller-or-equal neighbor of u (and u itself) to
    the min of that set. Input edges are directed large->small."""
    pointing_down = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    m = pointing_down.groupBy("u").agg(F.min("v").alias("m"))
    joined = pointing_down.join(m, "u")
    to_min = joined.filter(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    self_edge = m.select(F.col("u"), F.col("m").alias("v"))
    return to_min.union(self_edge).distinct()


def connected_components(pairs: DataFrame, src: str = "id_a", dst: str = "id_b") -> DataFrame:
    """(src, dst) undirected pair graph -> (id, component) where
    component = min node id reachable from id. Every node mentioned in
    any pair appears exactly once in the output.

    Each round is bounded-shuffle DataFrame algebra; the loop runs on
    the driver but touches only O(1) metadata per round (the
    convergence fingerprint). localCheckpoint() per round truncates
    the lineage so the plan does not grow with iterations — without
    it, round k re-executes rounds 1..k-1."""
    # eager localCheckpoint BEFORE the loop: round 1 references the
    # edge list several times (symmetrize union + per-star aggregate +
    # join-back), and the caller usually hands us the raw near-dup
    # pair QUERY — without materialization the whole pair join re-runs
    # per reference (measured 21.7s vs 1.9s for the sf0.1 jaccard
    # graph). The loop's own per-round checkpoints only cover rounds
    # 2+, not the expensive source plan.
    edges = (
        pairs.select(F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev = None
    for _ in range(MAX_ROUNDS):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        fp = _fingerprint(edges)
        if fp == prev:
            break
        prev = fp
    else:
        raise RuntimeError(f"connected_components did not converge in {MAX_ROUNDS} rounds")
    # converged: every edge is (node -> component root); roots also
    # belong to their own component
    nodes = edges.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = edges.select(F.col("v").alias("id"), F.col("v").alias("component")).distinct()
    return nodes.union(roots).groupBy("id").agg(F.min("component").alias("component"))


# Max clustered-node count to broadcast in dedup_assignments. ~24B/row
# (long id + long component + overhead) puts 5M rows around 120 MB —
# comfortably under a 1 GB driver/executor broadcast budget. Above it,
# a plain shuffle join is the right plan anyway: a 30%-duplicate
# 100 TB corpus has billions of clustered nodes, and broadcasting that
# would OOM every executor.
BROADCAST_COMPONENT_LIMIT = 5_000_000


def dedup_assignments(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
    src: str = "id_a", dst: str = "id_b",
    broadcast_limit: int = BROADCAST_COMPONENT_LIMIT,
) -> DataFrame:
    """Full keep/drop table: every doc gets its cluster representative
    (min doc_id of its near-dup component; itself when un-clustered)
    and a keep flag. The component table scales with the duplicate
    count, so the join side is size-guarded: broadcast while the
    clustered-node count is under ``broadcast_limit`` (one O(metadata)
    count — the CC loop already runs an action per round), else a
    shuffle hash join on the uniform id key."""
    # eager localCheckpoint: materialize the component table ONCE so the
    # size-guard count and the join both read blocks instead of
    # re-running the final CC aggregation
    comp = connected_components(pairs, src, dst).localCheckpoint(eager=True)
    n_nodes = comp.count()
    joinable = F.broadcast(comp) if n_nodes <= broadcast_limit else comp
    out = docs.select(F.col(id_col).cast("long").alias("id")).join(
        joinable, "id", "left"
    )
    rep = F.coalesce(F.col("component"), F.col("id"))
    return out.select(
        F.col("id").alias(id_col),
        rep.alias("rep_id"),
        (rep == F.col("id")).alias("keep"),
    )
