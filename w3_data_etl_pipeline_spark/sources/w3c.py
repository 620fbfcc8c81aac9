"""W3C extended log source: text lines -> typed staging DataFrame.

Spark-first re-expression of the reference's serial file loop +
per-line tokenizer (reference src/common_package/process_raw_data.py:
18-87): one partitioned multi-file text scan, directive-comment
filter, arity-dispatched tokenization (14-field vs 18-field layouts,
reference process_raw_data.py:69-77), malformed-arity drop, '-'
sentinel -> NULL decode (process_raw_data.py:104-106), all as
whole-stage-codegen'd expressions — no Python in the row path.

Deliberate fix vs the reference (SURVEY.md §2.6.1): in the 18-field
layout the reference reads cs-bytes into time_taken
(process_raw_data.py:75); we read the actual time-taken (last field).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# field positions: 14-field layout (process_raw_data.py:69-71)
#   date time s-ip cs-method cs-uri-stem cs-uri-query s-port cs-username
#   c-ip cs(User-Agent) sc-status sc-substatus sc-win32-status time-taken
# 18-field layout adds cs(Cookie) cs(Referer) after User-Agent and
#   sc-bytes cs-bytes before time-taken


def read_w3c_logs(spark: SparkSession, path: str) -> DataFrame:
    """path: file, dir, or glob of *.log W3C extended logs."""
    raw = spark.read.text(path, pathGlobFilter="*.log", recursiveFileLookup=True)
    return parse_w3c_lines(raw)


def _null_dash(c: F.Column) -> F.Column:
    return F.when(c == "-", F.lit(None)).otherwise(c)


def parse_w3c_lines(raw: DataFrame) -> DataFrame:
    """raw: single string column ``value`` of log lines."""
    toks = F.split(F.trim(F.col("value")), " ")
    n = F.size(toks)

    def pick(i14: int, i18: int) -> F.Column:
        return F.when(n == 14, toks[i14]).otherwise(toks[i18])

    df = (
        raw.filter(~F.col("value").startswith("#"))  # directive lines
        .filter(F.trim(F.col("value")) != "")
        .withColumn("_n", n)
        .filter((F.col("_n") == 14) | (F.col("_n") == 18))  # drop malformed arity
    )
    toks = F.split(F.trim(F.col("value")), " ")
    n = F.col("_n")
    out = df.select(
        toks[0].alias("date"),
        toks[1].alias("time"),
        toks[3].alias("http_method"),
        _null_dash(pick(4, 4)).alias("raw_file_path"),
        _null_dash(pick(9, 9)).alias("browser_string"),
        pick(8, 8).alias("ip"),
        pick(10, 12).alias("status_code"),
        F.when(n == 18, _null_dash(toks[15]).try_cast("int")).alias("sc_bytes"),
        F.when(n == 18, _null_dash(toks[16]).try_cast("int")).alias("cs_bytes"),
        # reference bug fixed: time-taken is the LAST field in both layouts
        _null_dash(F.when(n == 14, toks[13]).otherwise(toks[17])).try_cast("int").alias("time_taken"),
    )
    # deterministic surrogate log_id: stable ordering over the natural row
    # identity (the reference uses insert-order SERIAL, which is not
    # replayable — SURVEY.md §2.6.5). Two-level scheme (range-partition
    # by the ordering key, per-partition row_number + driver-side
    # offsets) — a bare Window.orderBy would funnel the whole staging
    # table through ONE task at scale.
    from ..operators.dims import surrogate_ids

    out = surrogate_ids(
        out,
        ["date", "time", "ip", "raw_file_path", "status_code", "time_taken"],
        "log_id",
        scalable=True,
    )
    return out.withColumn("log_id", F.col("log_id").cast("int")).select(
        "log_id",
        "date",
        "time",
        "http_method",
        "raw_file_path",
        "browser_string",
        "ip",
        "status_code",
        "sc_bytes",
        "cs_bytes",
        "time_taken",
    )
