"""Additional OLAP operator coverage: sessionization (lag + gap
cumsum), pivot, cube with grouping ids, set operations, exact
percentile. Each with a DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _money, q, t

SESSION_GAP_S = 1800


@q(
    "sessionize_events",
    f"""
    WITH o AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR date_diff('second', lag(ts) OVER w, ts) > {SESSION_GAP_S}
                  THEN 1 ELSE 0 END AS ns
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT user_id, ts,
             CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM o)
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM s GROUP BY user_id, session_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag + gap-flag cumulative sum: two window
    passes over ONE shuffle (both windows share the user_id hash
    partitioning, so Catalyst reuses the exchange)."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = e.withColumn(
        "ns", F.when(gap.isNull() | (gap > SESSION_GAP_S), 1).otherwise(0)
    )
    wc = Window.partitionBy("user_id").orderBy("ts").rowsBetween(Window.unboundedPreceding, 0)
    sess = flagged.withColumn("session_id", F.sum("ns").over(wc).cast("long"))
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@q(
    "pivot_event_counts",
    """
    SELECT CAST(hour(ts) AS BIGINT) AS hour,
           COUNT(*) FILTER (event_type = 'click') AS click,
           COUNT(*) FILTER (event_type = 'error') AS error,
           COUNT(*) FILTER (event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (event_type = 'signup') AS signup,
           COUNT(*) FILTER (event_type = 'view') AS view
    FROM events GROUP BY 1
    """,
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    out = (
        e.groupBy(F.hour("ts").cast("long").alias("hour"))
        .pivot("event_type", _EVENT_TYPES)
        .count()
    )
    return out.na.fill(0, _EVENT_TYPES)


@q(
    "cube_lineitem",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.count("*").alias("n"),
        F.sum(_money("l_quantity")).cast("double").alias("sum_qty"),
    )


@q(
    "setops_customers",
    """
    SELECT 'both' AS tag, c_custkey FROM
      (SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0
       INTERSECT
       SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0)
    UNION ALL
    SELECT 'only_even' AS tag, c_custkey FROM
      (SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0
       EXCEPT
       SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0)
    """,
)
def setops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    evens = c.filter(F.col("c_custkey") % 2 == 0).select("c_custkey")
    threes = c.filter(F.col("c_custkey") % 3 == 0).select("c_custkey")
    return evens.intersect(threes).withColumn("tag", F.lit("both")).unionByName(
        evens.exceptAll(threes).distinct().withColumn("tag", F.lit("only_even"))
    ).select("tag", "c_custkey")


@q(
    "median_order_value",
    """
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 6) AS median_price,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def median_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentile (NOT approx_percentile — the
    oracle needs bit-equality; approximate twins stay rows-only)."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("median_price"),
        F.count("*").alias("n"),
    )


@q("media_features", None)  # binary/multimodal plumbing: rows-only
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal path driven from the documents table: text bytes as
    the opaque binary payload -> mapInPandas feature extraction."""
    from .operators.multimodal import extract_features

    d = t(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("bytes"),
        F.struct(
            F.lit("synthetic/v1").alias("format"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(16000).alias("sample_rate"),
            F.lit(1000).alias("duration_ms"),
            F.lit(1).alias("n_frames"),
        ).alias("meta"),
    )
    return extract_features(media)
