"""Hot-key skew handling.

The change stream is Zipf-skewed by (repo,path) — a few hot repos
dominate (FIXTURES.md §F2). Row-local stages (enrichment UDFs) must
NOT be partitioned by the raw key or one executor drags the stage;
``salted_repartition`` disperses same-key rows deterministically by
hashing the key together with a per-row disperser column (the LSN),
so every partition gets an even slice of the hot key. Key-global
stages (the dedup window, the merge join) keep the unsalted key —
AQE skew-join splitting covers the residual skew there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(
    df: DataFrame, keys: list[str], disperser: str, num_partitions: int
) -> DataFrame:
    # the salt needs MANY more distinct values than partitions:
    # repartition() hash-partitions the salt, and hashing only
    # num_partitions distinct values leaves some partitions empty
    # (pigeonhole through Murmur3 collisions)
    salt = F.pmod(
        F.xxhash64(*[F.col(k) for k in keys], F.col(disperser)),
        F.lit(num_partitions * 64),
    )
    return df.withColumn("_salt", salt).repartition(num_partitions, "_salt").drop("_salt")
