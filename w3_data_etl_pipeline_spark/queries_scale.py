"""Round-2 capability queries: dedup clustering (connected
components), grouping sets, frame-based moving windows, Gopher-style
repetition signals, funnel analysis, and a JSONL round-trip — each
with a DuckDB oracle so the driver's value-hash gate covers them.

These extend the reference's analytics surface the way a
training-data pipeline needs (SURVEY.md §2 addendum); none exist in
w3-data-etl-pipeline itself.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators import dedupe
from .operators.cluster import dedup_assignments
from .queries import q, t

# ---------------------------------------------------------------------------
# near-dup clusters: pairs -> transitive closure -> keep/drop table.
# Pair generation reuses the exact ngram-Jaccard gate config (k=3,
# threshold 0.2, max_df 100) so the oracle can reuse its pairs CTE and
# stack a recursive min-reachable CTE on top (DuckDB's WITH RECURSIVE
# is the small-scale twin of the large-star/small-star rounds).
# ---------------------------------------------------------------------------

_PAIRS_CTE = r"""
    sh AS (
      SELECT doc_id AS id,
             CASE WHEN len(regexp_split_to_array(trim(lower(text)), '\s+')) >= 3
                  THEN list_distinct([
                    array_to_string(regexp_split_to_array(trim(lower(text)), '\s+')[i+1:i+3], ' ')
                    FOR i IN range(0, len(regexp_split_to_array(trim(lower(text)), '\s+')) - 2)])
                  ELSE [array_to_string(regexp_split_to_array(trim(lower(text)), '\s+'), ' ')]
             END AS s
      FROM documents),
    ex AS (SELECT id, unnest(s) AS g FROM sh),
    rare AS (SELECT g FROM ex GROUP BY g HAVING COUNT(*) <= 100),
    exf AS (SELECT id, g FROM ex JOIN rare USING (g)),
    sizes AS (SELECT id, len(s) AS n FROM sh),
    inter AS (SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS i
              FROM exf a JOIN exf b ON a.g = b.g AND a.id < b.id GROUP BY 1, 2),
    pairs AS (
      SELECT id_a, id_b
      FROM inter JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
      WHERE i / (sa.n + sb.n - i) >= 0.2)
"""


@q(
    "neardup_clusters",
    f"""
    WITH RECURSIVE {_PAIRS_CTE},
    edges AS (SELECT id_a AS s, id_b AS d FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    nodes AS (SELECT DISTINCT s AS id FROM edges),
    walk(id, comp) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT e.d, w.comp FROM walk w JOIN edges e ON e.s = w.id
    ),
    comp AS (SELECT id, MIN(comp) AS component FROM walk GROUP BY id)
    SELECT d.doc_id,
           COALESCE(c.component, d.doc_id) AS rep_id,
           (COALESCE(c.component, d.doc_id) = d.doc_id) AS keep
    FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    """,
)
def neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure of the n-gram Jaccard pair graph via
    alternating large-star/small-star (operators/cluster.py): docs A~B
    and B~C share one representative even with no (A,C) pair. Output
    is the corpus-wide keep/drop table a dedup pipeline actually
    applies."""
    d = t(spark, sf_dir, "documents")
    pairs = dedupe.ngram_jaccard_pairs(
        d, "text", "doc_id", shingle_k=3, threshold=0.2, max_df=100
    )
    return dedup_assignments(d, pairs, "doc_id")


# ---------------------------------------------------------------------------
# GROUPING SETS — the general form of the engine's cube/rollup pair;
# sentinel labels instead of GROUPING() so both engines agree on the
# output shape without NULL-vs-flag ambiguity.
# ---------------------------------------------------------------------------


@q(
    "grouping_sets_orders",
    """
    SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
           COALESCE(CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR), 'ALL') AS o_year,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, EXTRACT(year FROM o_orderdate)),
                            (o_orderpriority), (EXTRACT(year FROM o_orderdate)), ())
    """,
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (Spark expands it into one expand +
    single hash-agg shuffle — same plan family as cube/rollup, but
    with a user-chosen lattice)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("gs_orders")
    return spark.sql(
        """
        SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
               COALESCE(CAST(year(o_orderdate) AS STRING), 'ALL') AS o_year,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM gs_orders
        GROUP BY GROUPING SETS ((o_orderpriority, year(o_orderdate)),
                                (o_orderpriority), (year(o_orderdate)), ())
        """
    )


# ---------------------------------------------------------------------------
# frame-based window: 7-row moving average of daily segment revenue
# (the engine's window coverage was rank/top-k only; this exercises
# ROWS BETWEEN frames, the other half of the window operator space)
# ---------------------------------------------------------------------------


@q(
    "moving_avg_daily_revenue",
    """
    WITH daily AS (
      SELECT c_mktsegment AS segment, CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2)
    SELECT segment, day, CAST(rev AS DOUBLE) AS revenue,
           round(AVG(CAST(rev AS DOUBLE)) OVER (
             PARTITION BY segment ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7
    FROM daily
    """,
)
def moving_avg_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dim join -> one agg shuffle on (segment, day) -> one
    window shuffle on segment. The window partition key (5 segments)
    is low-cardinality but each partition is only n_days rows after
    the pre-aggregation — the agg-before-window ordering is the scale
    pattern (windowing raw orders would funnel the fact table through
    5 tasks)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    daily = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    w = Window.partitionBy("segment").orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "segment",
        "day",
        F.col("rev").cast("double").alias("revenue"),
        F.round(F.avg(F.col("rev").cast("double")).over(w), 4).alias("ma7"),
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition signals (documents are single-line, so the
# signals are word-level: duplicate-word mass + top-bigram share)
# ---------------------------------------------------------------------------


@q(
    "repetition_docs",
    r"""
    WITH base AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ws
      FROM documents),
    stats AS (
      SELECT doc_id, len(ws) AS n_words,
             round(1.0 - len(list_distinct(ws)) / len(ws), 6) AS dup_word_frac
      FROM base),
    bg AS (
      SELECT doc_id,
             unnest([array_to_string(ws[i+1:i+2], ' ')
                     FOR i IN range(0, len(ws) - 1)]) AS g
      FROM base WHERE len(ws) >= 2),
    bgc AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1, 2),
    top AS (SELECT doc_id, round(MAX(c) * 1.0 / SUM(c), 6) AS top_bigram_frac
            FROM bgc GROUP BY doc_id)
    SELECT s.doc_id, CAST(s.n_words AS BIGINT) AS n_words, s.dup_word_frac,
           COALESCE(t.top_bigram_frac, 0.0) AS top_bigram_frac
    FROM stats s LEFT JOIN top t ON s.doc_id = t.doc_id
    """,
)
def repetition_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signals a C4/Gopher-style filter needs:
    duplicate-word mass stays map-side (array HOFs, codegen); the
    top-bigram share is explode -> two hash aggs keyed by (doc_id,
    bigram) then doc_id — high-cardinality uniform keys, skew-free."""
    d = t(spark, sf_dir, "documents")
    ws = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    base = d.select("doc_id", ws.alias("ws"))
    stats = base.select(
        "doc_id",
        F.size("ws").cast("long").alias("n_words"),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct("ws")) / F.size("ws"), 6
        ).alias("dup_word_frac"),
    )
    idx = F.sequence(F.lit(0), F.size("ws") - 2)
    bigrams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice("ws", i + 1, 2)))
    bg = (
        base.filter(F.size("ws") >= 2)
        .select("doc_id", F.explode(bigrams).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.round(F.max("c") / F.sum("c"), 6).alias("top_bigram_frac"))
    )
    return stats.join(bg, "doc_id", "left").select(
        "doc_id",
        "n_words",
        "dup_word_frac",
        F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
    )


# ---------------------------------------------------------------------------
# ordered funnel: view -> click -> purchase per user (first-touch
# chain; the canonical product-analytics query over the events table)
# ---------------------------------------------------------------------------


@q(
    "funnel_counts",
    """
    WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
               WHERE event_type = 'view' GROUP BY 1),
    c AS (SELECT e.user_id, MIN(e.ts) AS t_click
          FROM events e JOIN v USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1),
    p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
          FROM events e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1)
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_view_click,
           (SELECT COUNT(*) FROM p) AS n_view_click_purchase
    """,
)
def funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered 3-step funnel. Each stage is one hash agg on
    user_id reusing the same partitioning; stage joins stay keyed by
    user_id (co-partitioned, AQE-broadcastable as the funnel
    narrows)."""
    e = t(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_view_click")))
        .crossJoin(p.agg(F.count("*").alias("n_view_click_purchase")))
    )


# ---------------------------------------------------------------------------
# benchmark decontamination: flag corpus docs sharing any word 8-gram
# with a held-out eval slice (the standard n-gram-collision
# decontamination step of an LLM training pipeline; 13 is the usual k
# but the synthetic docs are short, so k=8 keeps the test meaningful)
# ---------------------------------------------------------------------------


@q(
    "decontaminate_docs",
    r"""
    WITH ws AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w
      FROM documents),
    grams AS (
      SELECT doc_id,
             unnest(list_distinct([array_to_string(w[i+1:i+8], ' ')
                                   FOR i IN range(0, len(w) - 7)])) AS g
      FROM ws WHERE len(w) >= 8),
    eval_g AS (SELECT DISTINCT g FROM grams WHERE doc_id % 20 = 0),
    corpus AS (SELECT doc_id, g FROM grams WHERE doc_id % 20 <> 0)
    SELECT corpus.doc_id, COUNT(DISTINCT corpus.g) AS n_hits
    FROM corpus JOIN eval_g USING (g)
    GROUP BY corpus.doc_id
    """,
)
def decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus docs colliding with the eval slice on any word 8-gram.
    Eval shingle set is tiny relative to the corpus (it's an eval
    benchmark), so the collision join is a broadcast hash join on the
    shingle — corpus shingles stream map-side, no corpus shuffle until
    the per-doc count agg. At 100 TB the eval set is still MBs."""
    d = t(spark, sf_dir, "documents")
    w = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    grams = (
        d.select("doc_id", w.alias("w"))
        .filter(F.size("w") >= 8)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(0), F.size("w") - 8),
                        lambda i: F.concat_ws(" ", F.slice("w", i + 1, 8)),
                    )
                )
            ).alias("g"),
        )
    )
    eval_g = grams.filter(F.col("doc_id") % 20 == 0).select("g").distinct()
    corpus = grams.filter(F.col("doc_id") % 20 != 0)
    return (
        corpus.join(F.broadcast(eval_g), "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("n_hits"))
    )


# ---------------------------------------------------------------------------
# JSONL round-trip — the training-data export/import format. Writes
# the documents table as JSONL, reads it back with an explicit schema,
# and proves byte fidelity (escaping, unicode, nulls) via sha256
# against the original rows in the oracle.
# ---------------------------------------------------------------------------


@q(
    "jsonl_roundtrip_docs",
    """
    SELECT doc_id, sha256(text) AS content_sha, CAST(n_chars AS BIGINT) AS n_chars
    FROM documents
    """,
)
def jsonl_roundtrip_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.write.json -> spark.read.schema(...).json round-trip; the
    oracle hashes the ORIGINAL table, so any JSONL escaping loss
    flips the value hash. localCheckpoint materializes the read-back
    rows so the temp dir can be removed before returning (the driver
    collects after this function exits)."""
    d = t(spark, sf_dir, "documents")
    work = tempfile.mkdtemp(
        prefix="jsonl_rt_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    try:
        path = os.path.join(work, "docs.jsonl")
        d.select("doc_id", "text", "n_chars").write.mode("overwrite").json(path)
        back = spark.read.schema("doc_id long, text string, n_chars long").json(path)
        out = back.select(
            "doc_id",
            F.sha2("text", 256).alias("content_sha"),
            F.col("n_chars").cast("long").alias("n_chars"),
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# RANGE-interval window frame: gap-correct trailing 7-day revenue.
# ROWS BETWEEN counts rows; RANGE BETWEEN bounds the ORDER-BY VALUE,
# so calendar gaps shrink the frame instead of silently reaching
# further back — the other frame semantics the window space has.
# ---------------------------------------------------------------------------


@q(
    "range_frame_weekly_revenue",
    """
    WITH daily AS (
      SELECT c_mktsegment AS segment,
             datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS day_idx,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2)
    SELECT segment, CAST(day_idx AS BIGINT) AS day_idx,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(SUM(rev) OVER (
             PARTITION BY segment ORDER BY day_idx
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev_7d
    FROM daily
    """,
)
def range_frame_weekly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same agg-before-window scale shape as moving_avg_daily_revenue
    (broadcast dim join -> (segment, day) hash agg -> segment window),
    but with a RANGE frame over the integer day index: a day with no
    orders contributes nothing AND is not skipped over — the frame is
    the value interval [day-6, day]. Decimal sums inside the frame
    keep the hash deterministic; cast to double only at the edge."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    daily = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date"))
            .cast("long")
            .alias("day_idx"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    w = Window.partitionBy("segment").orderBy("day_idx").rangeBetween(-6, 0)
    return daily.select(
        "segment",
        "day_idx",
        F.col("rev").cast("double").alias("revenue"),
        F.sum("rev").over(w).cast("double").alias("rev_7d"),
    )


# ---------------------------------------------------------------------------
# UNPIVOT (melt): wide per-flag charge components -> long (flag,
# metric, value) rows — the inverse of pivot_event_counts.
# ---------------------------------------------------------------------------


@q(
    "unpivot_charge_components",
    """
    WITH wide AS (
      SELECT l_returnflag,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS gross,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS discount_amt,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS tax_amt
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, 'gross' AS metric, gross AS amount FROM wide
    UNION ALL
    SELECT l_returnflag, 'discount_amt', discount_amt FROM wide
    UNION ALL
    SELECT l_returnflag, 'tax_amt', tax_amt FROM wide
    """,
)
def unpivot_charge_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact-decimal hash agg to a 3-metric wide row per return
    flag, then DataFrame.unpivot (Spark's melt) to long form — the
    inverse reshaping of pivot_event_counts. The unpivot is a local
    O(rows x metrics) expansion AFTER aggregation: reshape the 3-row
    summary, never the fact table."""
    li = t(spark, sf_dir, "lineitem")
    m = F.col("l_extendedprice").cast("decimal(18,2)")
    wide = li.groupBy("l_returnflag").agg(
        F.sum(m).cast("double").alias("gross"),
        F.sum(m * F.col("l_discount").cast("decimal(18,2)")).cast("double").alias("discount_amt"),
        F.sum(m * F.col("l_tax").cast("decimal(18,2)")).cast("double").alias("tax_amt"),
    )
    return wide.unpivot(
        ["l_returnflag"], ["gross", "discount_amt", "tax_amt"], "metric", "amount"
    )
