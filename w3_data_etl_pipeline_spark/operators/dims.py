"""Star-schema dimension builders (reference operators A1-A4).

The reference builds 10 dimensions the same way: SELECT DISTINCT the
natural key from staging, attach a SERIAL surrogate id, widen with
derived attributes, snapshot to dim_* (reference
src/common_package/*_tasks.py; SURVEY.md §2.3). Here:

* ``distinct_dim`` — one hash-aggregate shuffle on the natural key.
* surrogate ids are ``row_number`` over the natural key, so they are
  DETERMINISTIC across runs (the reference's insert-order SERIALs are
  not — documented deviation, SURVEY.md §2.6.5). For huge dims where
  a global row_number would single-task, use ``surrogate_ids`` with
  ``scalable=True``: zipWithIndex-free two-level scheme
  (per-partition offsets via a tiny driver-side cumsum), still
  deterministic because the input is range-partitioned by the key.
* ``incremental_upsert`` — the reference's only true incremental
  pattern (the IP dimension anti-join, ip_tasks.py:100-107) as a
  left_anti append that preserves existing surrogate ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def distinct_dim(df: DataFrame, cols: list[str] | str) -> DataFrame:
    if isinstance(cols, str):
        cols = [cols]
    return df.select(*cols).distinct()


def surrogate_ids(
    dim: DataFrame, order_cols: list[str] | str, id_col: str = "id", scalable: bool = False
) -> DataFrame:
    if isinstance(order_cols, str):
        order_cols = [order_cols]
    if not scalable:
        # partition on a non-foldable constant (pmod(hash,1) == 0 for
        # every row; a plain lit() gets constant-folded back out): same
        # single-partition global ordering — valid only for bounded
        # dims — but DECLARED, so the "No Partition Defined" warning
        # stays meaningful everywhere else
        w = Window.partitionBy(
            F.pmod(F.xxhash64(order_cols[0]), F.lit(1))
        ).orderBy(*[F.col(c).asc_nulls_first() for c in order_cols])
        return dim.withColumn(id_col, F.row_number().over(w))
    # scale path: range-partition by key, per-partition row_number, add
    # partition offsets (tiny collect of per-partition counts)
    parts = dim.rdd.getNumPartitions()
    rp = dim.repartitionByRange(max(parts, 1), *order_cols)
    counted = rp.withColumn("_pid", F.spark_partition_id())
    sizes = {r["_pid"]: r["n"] for r in counted.groupBy("_pid").agg(F.count("*").alias("n")).collect()}
    offsets = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    omap = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w = Window.partitionBy("_pid").orderBy(*[F.col(c).asc_nulls_first() for c in order_cols])
    return (
        counted.withColumn("_rn", F.row_number().over(w))
        .withColumn(id_col, (omap[F.col("_pid")] + F.col("_rn")).cast("long"))
        .drop("_pid", "_rn")
    )


def incremental_upsert(existing: DataFrame, incoming: DataFrame, key: str | list[str]) -> DataFrame:
    """Append only unseen keys (anti-join), keeping existing rows
    byte-stable — the reference's persistent-cache dimension
    (ip_tasks.py:94-108) as a set-based op."""
    keys = [key] if isinstance(key, str) else key
    new = incoming.join(existing, keys, "left_anti")
    return existing.unionByName(new, allowMissingColumns=True)


def enrich_missing_only(df: DataFrame, marker_col: str) -> tuple[DataFrame, DataFrame]:
    """Split into (needs-enrichment, already-enriched) by NULL marker —
    the reference's NULL-only re-enrichment scan (ip_tasks.py:27-33)."""
    return df.filter(F.col(marker_col).isNull()), df.filter(F.col(marker_col).isNotNull())
