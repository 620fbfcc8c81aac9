"""Training-data curation queries, round 2: PII redaction,
deterministic stratified sampling, TF-IDF term ranking, and per-source
token-budget selection — each with an exact DuckDB oracle so the
driver's value-hash gate covers them end to end.

These extend the reference's analytics surface (SURVEY.md §2 addendum)
toward what a 100 TB LLM-corpus pipeline runs daily; none exist in
w3-data-etl-pipeline itself, but they reuse its enrichment idiom
(reference src/common_package/transform_tasks.py: pure column
expressions over a staged table, no driver-side loops).

Determinism rules shared by every query here (so Spark and DuckDB
hash identically):
 - hashing is sha256 over utf-8 strings (both engines emit lowercase
   hex), never engine-specific hash functions;
 - sampling decisions come from the first 8 hex chars of
   sha256(doc_id) parsed as an integer — a uniform, engine-neutral
   u32 — never from rand();
 - rankings order by integer columns plus a text tiebreak, never by
   floating-point scores; floats are emitted (rounded) but not
   compared against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import q, t

# Shared regexes — kept to the common Java-regex / RE2 dialect subset
# (\b, \d, classes, bounded reps) so Spark and DuckDB match identically.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


@q(
    "pii_redact_docs",
    f"""
    WITH body AS (
      SELECT doc_id,
             text || ' contact user' || doc_id || '@example.com at 10.'
                  || (doc_id % 256) || '.0.' || (doc_id % 100) AS body
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(body, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(body, '{_IPV4_RE}')) AS n_ips,
           length(regexp_replace(regexp_replace(body, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                                 '{_IPV4_RE}', '<IP>', 'g')) AS redacted_len,
           sha256(regexp_replace(regexp_replace(body, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                                 '{_IPV4_RE}', '<IP>', 'g')) AS redacted_sha
    FROM body
    """,
)
def pii_redact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: count and redact emails + IPv4 literals per document.

    The synthetic corpus carries no organic PII, so each doc gets a
    deterministic injected contact line (same expression in the oracle)
    — the gate then proves counting AND replacement byte-for-byte via
    sha256 of the redacted text.

    Scale: pure map-side codegen (regexp_count/regexp_replace run
    JVM-side inside WholeStageCodegen); zero shuffles, zero Python.
    At 100 TB this is embarrassingly parallel and input-bandwidth
    bound, which is exactly what a scrub pass should be.
    """
    body = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com at 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."),
        (F.col("doc_id") % 100).cast("string"),
    )
    red = F.regexp_replace(F.regexp_replace(body, _EMAIL_RE, "<EMAIL>"), _IPV4_RE, "<IP>")
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_count(body, F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(body, F.lit(_IPV4_RE)).alias("n_ips"),
        F.length(red).alias("redacted_len"),
        F.sha2(red, 256).alias("redacted_sha"),
    )


@q(
    "stratified_sample_docs",
    """
    WITH d AS (
      SELECT lang, source, doc_id,
             ('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS u,
             CASE WHEN lang = 'en' THEN 25 ELSE 60 END AS pct
      FROM documents
    )
    SELECT lang, source,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN u < pct THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           CAST(COALESCE(SUM(CASE WHEN u < pct THEN doc_id END), 0) AS BIGINT)
               AS sampled_id_sum
    FROM d
    GROUP BY lang, source
    """,
)
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling: per-language keep rates
    (downweight the majority 'en' stratum, boost the rest) decided by
    a content-independent uniform hash of the document id — the
    standard trick for reproducible corpus sampling where rand() would
    make every rerun a different dataset.

    u = first 8 hex chars of sha256(doc_id) as u32, u % 100 < pct.
    The oracle recomputes the identical u, and sampled_id_sum pins the
    exact membership set, not just its size.

    Scale: one hash-agg shuffle on (lang, source); the sampling
    decision itself is map-side codegen. Changing rates never reshuffles
    data — the decision column is recomputed, files are immutable.
    """
    u = (
        F.conv(F.substring(F.sha2(F.col("doc_id").cast("string"), 256), 1, 8), 16, 10)
        .cast("long") % 100
    )
    pct = F.when(F.col("lang") == "en", F.lit(25)).otherwise(F.lit(60))
    keep = u < pct
    return (
        t(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(keep.cast("long")).alias("n_sampled"),
            F.coalesce(F.sum(F.when(keep, F.col("doc_id"))), F.lit(0)).alias("sampled_id_sum"),
        )
    )


@q(
    "tfidf_top_terms",
    r"""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                                x -> x <> '')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
    ranked AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df, n.n_docs,
             ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rk
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, df,
           ROUND(tf * 1.0 / df, 6) AS score
    FROM ranked WHERE rk <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 salient terms per document by tf over document frequency.

    Ranking is by the integer triple (tf DESC, df ASC, term ASC) — the
    float score is emitted for humans but never drives ordering, so
    Spark and DuckDB agree bit-for-bit regardless of libm. (Classic
    idf's ln(N/df) is monotone-decreasing in df, so ranking by df ASC
    IS ranking by idf DESC — same top-k, no transcendentals.)

    Scale: explode → two hash aggs (doc-term, then term) → shuffle
    join tf⋈df on term → per-doc window. The term-keyed exchanges
    partition on a high-cardinality key (vocab), the window key is
    doc_id (no global funnel). Hot stop-words skew the df agg; partial
    aggregation absorbs that map-side, and a max_df stop-list cut
    (as in operators/dedupe.shingle_pairs) is the 100 TB escape hatch.
    """
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.trim(F.lower(F.col("text"))), r"\s+"), lambda x: x != "")
        ).alias("term"),
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.countDistinct("doc_id").alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(F.col("tf") * 1.0 / F.col("df"), 6).alias("score"),
        )
    )


@q(
    "token_budget_sample",
    """
    WITH ranked AS (
      SELECT source, doc_id, n_chars,
             SUM(n_chars) OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id ASC
                                ROWS UNBOUNDED PRECEDING) AS cum_chars
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS chars_kept,
           CAST(SUM(doc_id) AS BIGINT) AS kept_id_sum
    FROM ranked
    WHERE cum_chars <= 4000
    GROUP BY source
    """,
)
def token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus budgeting: greedily keep the largest documents
    of each source until a fixed character budget is exhausted — the
    quota step every mixture-weighted training-data build runs after
    quality filtering.

    Deterministic order (n_chars DESC, doc_id ASC) + running sum +
    cut at the budget; kept_id_sum pins exact membership.

    Scale — two-phase cumulative sum (same scheme as
    operators/dims.surrogate_ids(scalable=True)): a naive
    Window.partitionBy(source) funnels a mega-source through ONE task.
    Instead the corpus is range-partitioned on the full sort key
    (source, n_chars DESC, doc_id), each range chunk computes its
    partial cumsum independently (the window key (_pid, source) splits
    a mega-source across as many tasks as it has range chunks), and a
    tiny per-(chunk, source) totals table — O(partitions) rows, itself
    windowed per source at metadata scale — broadcast-joins the
    starting offset back. Exact global cumsum, no single-task stage,
    no driver-side data. Correct for ANY range bounds because the sort
    key is a total order (doc_id is unique), so the per-source oracle
    result is partitioning-independent.
    """
    docs = t(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    return token_budget_aggregate(docs, budget=4000)


def token_budget_aggregate(docs: DataFrame, budget: int) -> DataFrame:
    """Two-phase per-source budget selection over (source, doc_id,
    n_chars) — the engine core of token_budget_sample, factored out so
    tests can drive it with synthetic skew (one mega-source)."""
    spark = docs.sparkSession
    n_parts = max(int(spark.conf.get("spark.sql.shuffle.partitions")), 1)
    ranged = docs.repartitionByRange(
        n_parts, F.col("source"), F.col("n_chars").desc(), F.col("doc_id")
    ).withColumn("_pid", F.spark_partition_id())
    w_in = (
        Window.partitionBy("_pid", "source")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    partial = ranged.withColumn("_cum_in", F.sum("n_chars").over(w_in))
    # per-(chunk, source) totals -> per-source running offsets; ranges
    # are contiguous so this is O(n_partitions + n_sources) rows
    chunk_tot = ranged.groupBy("_pid", "source").agg(F.sum("n_chars").alias("_chunk"))
    w_off = (
        Window.partitionBy("source")
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = chunk_tot.withColumn(
        "_off", F.coalesce(F.sum("_chunk").over(w_off), F.lit(0))
    ).drop("_chunk")
    return (
        partial.join(F.broadcast(offsets), ["_pid", "source"])
        .withColumn("cum_chars", F.col("_off") + F.col("_cum_in"))
        .filter(F.col("cum_chars") <= budget)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_chars").alias("chars_kept"),
            F.sum("doc_id").alias("kept_id_sum"),
        )
    )
