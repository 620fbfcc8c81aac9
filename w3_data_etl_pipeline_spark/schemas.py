"""Engine schemas (StructTypes).

The primary-source shape comes from the driver's ``input_hint``:
an Iceberg-style table of source-code repositories with columns
``(repo, path, commit, lang, content)`` keyed by ``(repo, path)``.
The change-event shape generalizes the reference's incremental-ingest
seed (the IP-dimension anti-join/NULL-scan pattern,
reference ``src/common_package/ip_tasks.py:94-108``) into a proper
CDC stream: ops I/U/D, a strictly-increasing LSN, and an event
timestamp for watermarking.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- primary source table (BASELINE.json input_hint) -----------------------

SOURCE_FILES = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)

# --- CDC change events ------------------------------------------------------

CHANGE_EVENTS = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),  # 'I' | 'U' | 'D'
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),  # NULL for 'D'
        T.StructField("event_ts", T.TimestampType(), True),
    ]
)

# schema-evolution variant: events gain a new column mid-stream; the engine
# must propagate it additively to the target (SURVEY.md §1.3).
CHANGE_EVENTS_V2 = T.StructType(
    CHANGE_EVENTS.fields + [T.StructField("lang_confidence", T.DoubleType(), True)]
)

# --- engine side outputs ----------------------------------------------------

LINEAGE = T.StructType(
    [
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("partition_bucket", T.IntegerType(), False),
        T.StructField("min_lsn", T.LongType(), True),
        T.StructField("max_lsn", T.LongType(), True),
        T.StructField("applied_count", T.LongType(), False),
        T.StructField("snapshot_version", T.LongType(), False),
    ]
)

# --- reference staging shape (W3C log rows after parse) ---------------------
# Mirrors reference src/common_package/process_raw_data.py:121-137, with
# proper types instead of all-VARCHAR (casts happen at parse, not at query).

W3C_STAGING = T.StructType(
    [
        T.StructField("log_id", T.LongType(), False),
        T.StructField("date", T.StringType(), True),
        T.StructField("time", T.StringType(), True),
        T.StructField("http_method", T.StringType(), True),
        T.StructField("raw_file_path", T.StringType(), True),
        T.StructField("browser_string", T.StringType(), True),
        T.StructField("ip", T.StringType(), True),
        T.StructField("status_code", T.StringType(), True),
        T.StructField("sc_bytes", T.IntegerType(), True),
        T.StructField("cs_bytes", T.IntegerType(), True),
        T.StructField("time_taken", T.IntegerType(), True),
    ]
)
