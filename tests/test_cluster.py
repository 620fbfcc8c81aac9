"""Connected components / dedup clustering (operators/cluster.py).

Covers: multi-hop chains collapsing to one component, singleton
handling, convergence on cycles, and the keep/drop assignment table.
"""

from __future__ import annotations

from w3_data_etl_pipeline_spark.operators.cluster import (
    connected_components,
    dedup_assignments,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    rows = connected_components(df).collect()
    return {r["id"]: r["component"] for r in rows}


def test_chain_collapses_to_min(spark):
    # A-B, B-C, C-D: one component rooted at 1 even though (1,4) never appears
    comp = _cc(spark, [(1, 2), (2, 3), (3, 4)])
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1}


def test_disjoint_components(spark):
    comp = _cc(spark, [(10, 20), (30, 40), (40, 50)])
    assert comp == {10: 10, 20: 10, 30: 30, 40: 30, 50: 30}


def test_cycle_and_duplicate_edges(spark):
    comp = _cc(spark, [(1, 2), (2, 3), (3, 1), (1, 2), (2, 1)])
    assert comp == {1: 1, 2: 1, 3: 1}


def test_star_topology(spark):
    # high-degree hub: large-star's worst case
    edges = [(100, i) for i in range(1, 30)]
    comp = _cc(spark, edges)
    assert set(comp.values()) == {1}
    assert len(comp) == 30


def test_dedup_assignments_keep_flags(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    pairs = spark.createDataFrame([(2, 3), (3, 5)], "id_a long, id_b long")
    out = {
        r["doc_id"]: (r["rep_id"], r["keep"])
        for r in dedup_assignments(docs, pairs).collect()
    }
    # 2-3-5 cluster keeps 2; everyone else keeps themselves
    assert out[2] == (2, True)
    assert out[3] == (2, False)
    assert out[5] == (2, False)
    for solo in (1, 4, 6, 7):
        assert out[solo] == (solo, True)
    assert len(out) == 7
