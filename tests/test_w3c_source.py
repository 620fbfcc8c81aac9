"""W3C log source parser: arity dispatch, directive filter, malformed
drop, '-' NULL decode, and the 18-field time-taken FIX (we read the
real last field; the reference reads cs-bytes — SURVEY.md §2.6.1)."""

from __future__ import annotations

from pyspark.sql import Row

from w3_data_etl_pipeline_spark.sources.w3c import parse_w3c_lines

L14 = "2010-07-18 13:04:16 1.2.3.4 GET /page.htm - 80 - 9.8.7.6 Mozilla/4.0+(compatible;+MSIE+8.0) 200 0 0 394"
L18 = "2010-07-18 13:05:00 1.2.3.4 GET /img.png q=1 80 - 9.8.7.6 Moz/5.0 - - 304 0 0 6635 252 108"
LDASH = "2010-07-18 13:06:00 1.2.3.4 HEAD /x - 80 - 9.8.7.6 - 404 0 0 -"


def _parse(spark, lines):
    raw = spark.createDataFrame([Row(value=x) for x in lines])
    return parse_w3c_lines(raw).collect()


def test_layout_dispatch_and_fields(spark):
    rows = _parse(
        spark,
        [
            "#Software: Microsoft Internet Information Services 7.0",
            "#Fields: date time s-ip cs-method ...",
            L14,
            L18,
            "garbage line with seven tokens only x",
            "",
        ],
    )
    assert len(rows) == 2  # comments, malformed arity, blanks dropped
    by_path = {r["raw_file_path"]: r for r in rows}
    r14 = by_path["/page.htm"]
    assert r14["http_method"] == "GET"
    assert r14["status_code"] == "200"
    assert r14["sc_bytes"] is None and r14["cs_bytes"] is None  # absent in 14-field layout
    assert r14["time_taken"] == 394
    r18 = by_path["/img.png"]
    assert r18["status_code"] == "304"
    assert r18["sc_bytes"] == 6635 and r18["cs_bytes"] == 252
    # the fix: actual time-taken (last field), NOT cs-bytes
    assert r18["time_taken"] == 108
    assert r18["browser_string"] == "Moz/5.0"


def test_dash_sentinel_null(spark):
    rows = _parse(spark, [LDASH])
    assert rows[0]["time_taken"] is None
    assert rows[0]["browser_string"] is None


def test_log_id_deterministic(spark):
    a = _parse(spark, [L18, L14, LDASH])
    b = _parse(spark, [L14, LDASH, L18])  # different input order
    ka = {(r["log_id"], r["raw_file_path"]) for r in a}
    kb = {(r["log_id"], r["raw_file_path"]) for r in b}
    assert ka == kb  # surrogate ids replayable regardless of arrival order
