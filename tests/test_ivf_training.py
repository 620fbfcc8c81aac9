"""Lloyd-trained IVF centroids (operators/similarity.train_centroids):
determinism, empty-cell handling, and the load-bearing claim — on a
SKEWED/CLUSTERED corpus (the realistic case) trained centroids give
materially higher probe recall than the seeded random projections at
the same (n_cells, n_probe) budget.
"""

from __future__ import annotations

import numpy as np
import pytest

from w3_data_etl_pipeline_spark.operators import similarity


def _clustered(spark, n_clusters=6, per=60, dim=32, seed=7):
    """Tight clusters around random unit centers — the distribution
    real embedding corpora have and random projections ignore."""
    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in range(n_clusters):
        pts = centers[c] + 0.12 * rng.standard_normal((per, dim))
        for p in pts:
            rows.append((vid, [float(x) for x in p], c))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    return df, centers


def _recall(df, qv, n_probe, train_iters):
    exact = {
        r["vec_id"]
        for r in similarity.cosine_topk(df, "embedding", "vec_id", qv, k=20).collect()
    }
    got = {
        r["vec_id"]
        for r in similarity.ivf_topk(
            df,
            "embedding",
            "vec_id",
            qv,
            k=20,
            n_cells=12,
            n_probe=n_probe,
            train_iters=train_iters,
        ).collect()
    }
    return len(got & exact) / max(len(exact), 1)


def test_trained_beats_random_on_clustered_corpus(spark):
    df, centers = _clustered(spark)
    df = df.cache()
    qv = [float(x) for x in centers[0] + 0.05]
    r_rand = _recall(df, qv, n_probe=2, train_iters=0)
    r_train = _recall(df, qv, n_probe=2, train_iters=3)
    assert r_train >= 0.9, (r_rand, r_train)
    assert r_train >= r_rand + 0.2, (r_rand, r_train)
    df.unpersist()


def test_training_is_deterministic(spark):
    df, _ = _clustered(spark, n_clusters=3, per=30)
    a = similarity.train_centroids(df, "embedding", 8, iters=2, seed=42)
    b = similarity.train_centroids(df, "embedding", 8, iters=2, seed=42)
    assert np.array_equal(a, b)
    c = similarity.train_centroids(df, "embedding", 8, iters=2, seed=43)
    assert not np.array_equal(a, c)


def test_empty_cells_keep_previous_centroid(spark):
    # 3 tight clusters, 16 cells: most cells receive no points; their
    # centroids must stay the (unit) seeds, not NaN out
    df, _ = _clustered(spark, n_clusters=3, per=20)
    dirs = similarity.train_centroids(df, "embedding", 16, iters=2)
    assert dirs.shape == (16, 32)
    assert not np.isnan(dirs).any()
    norms = np.linalg.norm(dirs, axis=1)
    assert np.allclose(norms, 1.0, atol=1e-6)


def test_train_iters_zero_matches_legacy(spark):
    df, centers = _clustered(spark, n_clusters=3, per=20)
    qv = [float(x) for x in centers[1]]
    legacy = similarity.ivf_topk(
        df, "embedding", "vec_id", qv, k=5, n_cells=8, n_probe=8
    ).collect()
    explicit = similarity.ivf_topk(
        df, "embedding", "vec_id", qv, k=5, n_cells=8, n_probe=8, train_iters=0
    ).collect()
    assert [tuple(r) for r in legacy] == [tuple(r) for r in explicit]
