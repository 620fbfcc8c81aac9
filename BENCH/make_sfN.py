"""Deterministic scale-factor escalation: synthesize sfN from the
driver-generated sf0.1 tables by K-fold replication with consistent
key offsetting (foreign keys stay valid: every copy's orders point at
that copy's customers, etc). Dimension tables (region, nation) are
fixed-cardinality and copy once, like TPC-H. Document text and
embeddings are perturbed per copy (vowel rotation / epsilon shift) so
the dedup/similarity workloads scale ~linearly in data instead of
inheriting a K^2 artificial-duplicate blow-up.

No external data: everything derives from the existing testdata.

Usage: python BENCH/make_sfN.py [K] [OUT_DIR] [SRC_DIR]
       (defaults: 10  /dev/shm/sfdata/sf1  /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

VOWELS = "aeiou"


def _copies(df: DataFrame, k: int, fn) -> DataFrame:
    out = None
    for i in range(k):
        c = fn(df, i)
        out = c if out is None else out.unionByName(c)
    return out


def build(spark, src: str, out: str, k: int) -> None:
    t = lambda name: spark.read.parquet(f"{src}/{name}.parquet")  # noqa: E731

    strides = {}
    for name, col in [
        ("customer", "c_custkey"),
        ("supplier", "s_suppkey"),
        ("part", "p_partkey"),
        ("orders", "o_orderkey"),
        ("events", "event_id"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ]:
        strides[name] = t(name).agg(F.max(col)).first()[0] + 1
    strides["user"] = t("events").agg(F.max("user_id")).first()[0] + 1

    def off(i: int, name: str):
        return F.lit(i * strides[name]).cast("long")

    plans = {
        "region": (t("region"), None),  # fixed dims: single copy
        "nation": (t("nation"), None),
        "customer": (
            t("customer"),
            lambda df, i: df.withColumn("c_custkey", F.col("c_custkey") + off(i, "customer")),
        ),
        "supplier": (
            t("supplier"),
            lambda df, i: df.withColumn("s_suppkey", F.col("s_suppkey") + off(i, "supplier")),
        ),
        "part": (
            t("part"),
            lambda df, i: df.withColumn("p_partkey", F.col("p_partkey") + off(i, "part")),
        ),
        "orders": (
            t("orders"),
            lambda df, i: df.withColumn("o_orderkey", F.col("o_orderkey") + off(i, "orders"))
            .withColumn("o_custkey", F.col("o_custkey") + off(i, "customer")),
        ),
        "lineitem": (
            t("lineitem"),
            lambda df, i: df.withColumn("l_orderkey", F.col("l_orderkey") + off(i, "orders"))
            .withColumn("l_partkey", F.col("l_partkey") + off(i, "part"))
            .withColumn("l_suppkey", F.col("l_suppkey") + off(i, "supplier")),
        ),
        "events": (
            t("events"),
            lambda df, i: df.withColumn("event_id", F.col("event_id") + off(i, "events"))
            .withColumn("user_id", F.col("user_id") + F.lit(i * strides["user"]).cast("long")),
        ),
        "documents": (
            t("documents"),
            # vowel rotation: copy i is textually DISTINCT from copy 0
            # (different shingles) while in-copy near-dup structure is
            # preserved — dedup work scales linearly, not K^2
            lambda df, i: df.withColumn(
                "text",
                F.translate("text", VOWELS, VOWELS[i % 5 :] + VOWELS[: i % 5]),
            ).withColumn("doc_id", F.col("doc_id") + off(i, "documents")),
        ),
        "embeddings": (
            t("embeddings"),
            lambda df, i: df.withColumn(
                "embedding",
                F.transform(
                    "embedding", lambda x: (x + F.lit(i * 1e-3)).cast("float")
                ),
            ).withColumn("vec_id", F.col("vec_id") + off(i, "embeddings")),
        ),
    }
    os.makedirs(out, exist_ok=True)
    for name, (df, fn) in plans.items():
        scaled = df if fn is None else _copies(df, k, fn)
        parts = 1 if fn is None else min(32, k)
        scaled.repartition(parts).write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )
        print(f"{name}: {scaled.count()} rows -> {out}/{name}.parquet", flush=True)


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/dev/shm/sfdata/sf1"
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from w3_data_etl_pipeline_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("make_sfN", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    build(spark, src, out, k)
