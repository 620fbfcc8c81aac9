"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — brute-force exact top-k against one query vector:
  a single map-side pass (zip_with dot product in codegen) + a top-k
  sort. At 100 TB this is the correctness baseline / reranker.
* ``ivf_topk`` — IVF-style scale path: every vector is assigned once
  to its nearest pseudo-centroid (numpy matmul inside an Arrow
  pandas UDF — one BLAS call per batch, no per-row Python); the query
  probes only its nearest ``n_probe`` cells, so the scan touches
  n_probe/n_cells of the data. Centroids are seeded random unit
  directions (deterministic; on a real corpus the same operator takes
  k-means centroids as a broadcast matrix). The cell id is computable
  at write time and usable as a partition column, turning the probe
  into partition pruning at scale.
* ``knn_join_lsh`` near-dup pairs live in operators.dedupe
  (random-hyperplane buckets).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cosine(a: F.Column, b: F.Column) -> F.Column:
    """Cosine similarity of two double arrays (JVM-side fold)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / F.nullif(na * nb, F.lit(0.0))


def _as_double(col: F.Column) -> F.Column:
    return col.cast("array<double>")


def cosine_topk(
    df: DataFrame, vec_col: str, id_col: str, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Exact brute-force top-k by cosine to a constant query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")
    scored = df.select(
        F.col(id_col),
        F.round(cosine(_as_double(F.col(vec_col)), q), 6).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def ivf_directions(n_cells: int, dim: int, seed: int = 42) -> np.ndarray:
    """Deterministic pseudo-centroids: seeded random unit directions."""
    rng = np.random.RandomState(seed)
    d = rng.standard_normal((n_cells, dim))
    return d / np.linalg.norm(d, axis=1, keepdims=True)


def assign_cells(df: DataFrame, vec_col: str, dirs: np.ndarray, out_col: str = "_cell") -> DataFrame:
    """Nearest-centroid assignment: one Arrow batch -> one BLAS matmul."""

    @F.pandas_udf("int")
    def cell(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy())
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return pd.Series(np.argmax((m / norms) @ dirs.T, axis=1).astype("int32"))

    return df.withColumn(out_col, cell(F.col(vec_col)))


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    dim = len(query_vec)
    dirs = ivf_directions(n_cells, dim, seed)
    qv = np.asarray(query_vec, dtype=float)
    qn = qv / (np.linalg.norm(qv) or 1.0)
    probe = [int(c) for c in np.argsort(-(dirs @ qn))[:n_probe]]
    cand = assign_cells(df, vec_col, dirs).filter(F.col("_cell").isin(probe))
    q = F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")
    return (
        cand.select(
            F.col(id_col), F.round(cosine(_as_double(F.col(vec_col)), q), 6).alias("cosine")
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )
