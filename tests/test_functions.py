"""Operator-kernel unit tests (SURVEY.md §5.2): band edges incl. the
documented overlap cases, path normalizer on the nasty corpus
examples, splitext edge cases, status banding, date parts, UA
struct UDF, text/token kernels."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from w3_data_etl_pipeline_spark.functions import bands, paths, status, text
from w3_data_etl_pipeline_spark.functions.datetime_parts import with_date_parts, with_time_parts
from w3_data_etl_pipeline_spark.functions.ua import enrich_user_agent


# --- latency banding (P14): overlap cases are observable semantics ---------

BAND_CASES = [
    (0, "<100ms"), (99, "<100ms"), (100, "100ms-200ms"), (199, "100ms-200ms"),
    (200, "200ms-500ms"), (499, "200ms-500ms"), (500, "500ms-1s"), (999, "500ms-1s"),
    (1000, "1s-2s"),
    (2000, "2s-5s"),       # overlap boundary: '2s-5s' listed before '1s-2s'
    (5000, "5s-10s"),      # overlap boundary: '5s-10s' listed before '2s-5s'
    (10000, "10s-30s"),
    (30000, "30s+"),       # overlap boundary: '30s+' listed before '10s-30s'
    (59999, "30s+"), (60000, "30s+"), (99999, "30s+"),
    (100000, "1min+"), (260528, "1min+"),
    (None, None),
]


def test_band_edges(spark):
    df = spark.createDataFrame([Row(v=v) for v, _ in BAND_CASES], "v int")
    got = {r["v"]: r["b"] for r in df.select("v", bands.band_label(F.col("v")).alias("b")).collect()}
    for v, expect in BAND_CASES:
        assert got[v] == expect, f"band({v})"


def test_band_case_sql_matches_spark(spark):
    import duckdb

    vals = [v for v, _ in BAND_CASES if v is not None]
    sql = f"SELECT v, {bands.band_case_sql('v')} AS b FROM (SELECT unnest({vals}) AS v)"
    duck = {r[0]: r[1] for r in duckdb.sql(sql).fetchall()}
    for v, expect in BAND_CASES:
        if v is not None:
            assert duck[v] == expect


# --- path normalizer (P3-P9) ------------------------------------------------

PATH_CASES = [
    "/robots.txt",
    "/Darwin/\"+++markerList[i][0]+++\"",
    "/images/photo.JPG?width=100&height=50",
    "/a/b/c/",
    "/NoExtensionName",
    "/dir.with.dots/file.tar.gz",
    "/weird/..txt",
    "/weird/a..txt",
    "/trailing/name.",
    "/q?only",
    "/sp ace/bad|chars.txt",
    "relative/file.md",
    "justaname",
    "/plus/file.c++",
]


def test_path_normalizer_matches_python_oracle(spark):
    df = spark.createDataFrame([Row(raw_file_path=p) for p in PATH_CASES])
    got = {
        r["raw_file_path"]: (
            r["file_path"], r["file_directory"], r["file_name"], r["file_extension"], r["file_type"]
        )
        for r in paths.normalize_path(df).collect()
    }
    for p in PATH_CASES:
        assert got[p] == paths.process_file_path_py(p), p


def test_path_reference_semantics():
    # pinned expectations for the reference's nastiest case
    fp, d, name, ext, ftype = paths.process_file_path_py('/Darwin/"+++markerList[i][0]+++"')
    assert d == "/darwin" and name == "" and ext == "" and ftype == "directory"
    fp, d, name, ext, ftype = paths.process_file_path_py("/images/photo.JPG?width=100")
    assert name == "photo.jpg" and ext == ".jpg" and ftype == "file"
    # '+' in extension -> no extension -> directory
    assert paths.process_file_path_py("/plus/file.c++")[3] == ""


# --- status (P12/P13) --------------------------------------------------------

def test_status_enrichment(spark):
    df = spark.createDataFrame(
        [Row(status_code=s) for s in ["200", "404", "500", "302", "100", "999", None]]
    )
    got = {
        r["status_code"]: (r["code_phrase"], r["code_type"])
        for r in status.enrich_status(df, spark).collect()
    }
    assert got["200"] == ("OK", "Success")
    assert got["404"] == ("Not Found", "Client Error")
    assert got["500"] == ("Internal Server Error", "Server Error")
    assert got["302"] == ("Found", "Redirection")
    assert got["100"] == ("Continue", "Informational")
    assert got["999"] == (None, "Server Error")  # unknown code: no phrase, >=500 class
    assert got[None] == (None, None)


# --- date/time parts (P10/P11) ----------------------------------------------

def test_date_parts(spark):
    df = spark.createDataFrame([Row(date="2010-07-18"), Row(date="2012-02-29"), Row(date="not-a-date")])
    got = {r["date"]: r for r in with_date_parts(df).collect()}
    r = got["2010-07-18"]
    assert (r["year"], r["month"], r["day"], r["week_day"], r["quarter"]) == (2010, 7, 18, "Sunday", 3)
    r = got["2012-02-29"]  # leap day
    assert (r["year"], r["month"], r["day"], r["week_day"], r["quarter"]) == (2012, 2, 29, "Wednesday", 1)
    r = got["not-a-date"]  # parse failure -> NULL parts (reference logs+skips)
    assert r["year"] is None and r["week_day"] is None


def test_time_parts(spark):
    df = spark.createDataFrame([Row(time="23:59:58"), Row(time="00:00:00")])
    got = {r["time"]: (r["hour"], r["minute"], r["second"]) for r in with_time_parts(df).collect()}
    assert got["23:59:58"] == (23, 59, 58)
    assert got["00:00:00"] == (0, 0, 0)


# --- UA struct UDF (P15-P18) -------------------------------------------------

def test_ua_classification(spark):
    rows = [
        Row(browser_string="Mozilla/4.0+(compatible;+MSIE+8.0;+Windows+NT+6.1;+Trident/4.0)", raw_file_path="/"),
        Row(browser_string="Mozilla/5.0+(compatible;+Googlebot/2.1;++http://www.google.com/bot.html)", raw_file_path="/x"),
        Row(browser_string="Mozilla/5.0+(Windows;+U;+Windows+NT+5.1)+Gecko/20100401+Firefox/3.6.3", raw_file_path="/y"),
        Row(browser_string="SomeAgent/1.0+MSIECrawler", raw_file_path="/z"),
        Row(browser_string="Mozilla/5.0+(iPhone;+CPU+iPhone+OS+14_0)+Mobile/15E148+Safari/604.1", raw_file_path="/m"),
        Row(browser_string="Opera/9.80+(Windows+NT+5.1)", raw_file_path="/any"),
        Row(browser_string="Mozilla/5.0", raw_file_path="/robots.txt"),
    ]
    df = spark.createDataFrame(rows)
    got = {r["raw_file_path"]: r for r in enrich_user_agent(df).collect()}
    assert got["/"]["browser"] == "IE" and got["/"]["os"] == "Windows 7"
    assert got["/"]["device_type"] == "PC" and got["/"]["is_bot"] is False
    assert got["/x"]["browser"] == "Googlebot" and got["/x"]["is_bot"] is True
    assert got["/y"]["browser"] == "Firefox" and got["/y"]["os"] == "Windows XP"
    assert got["/z"]["is_bot"] is True  # additional_bot_browsers allowlist
    assert got["/m"]["device_type"] == "Mobile" and got["/m"]["os"] == "iOS"
    assert got["/any"]["browser"] == "Opera"
    assert got["/robots.txt"]["is_bot"] is True  # path rule


def test_ua_codegen_matches_pandas_twin(spark):
    """The codegen rlike-chain classifier (the execution path) must be
    bit-identical to the pandas implementation (the oracle twin) on
    the realistic pool AND adversarial inputs: NULL, empty, junk,
    mixed case, '+'-encoding, every rule family, bot/tablet overlaps."""
    import pandas as pd

    from w3_data_etl_pipeline_spark.functions.ua import (
        classify_ua_exprs,
        classify_ua_pdf,
    )
    from w3_data_etl_pipeline_spark.queries_ref import _UA_POOL

    uas = _UA_POOL + [
        None,
        "",
        "totally unknown agent",
        "MOZILLA/5.0 (WINDOWS NT 6.2) CHROME/99.0",  # upper case
        "Mozilla/5.0 (Linux; Android 13; SM-X200) Safari/537.36",  # android tablet
        "Mozilla/5.0 (Linux; Android 13; Pixel 7) Mobile Safari/537.36",
        "Wget/1.21.3",
        "python-requests/2.31",
        "Mozilla/5.0 (compatible; bingbot/2.0; +http://www.bing.com/bingbot.htm)",
        "Mozilla/5.0 (compatible; YandexBot/3.0)",
        "Mozilla/5.0 (BlackBerry; U; BlackBerry 9900)",
        "Mozilla/5.0 (Windows Phone 10.0; Android 6.0.1)",
        "Huaweisymantecspider/1.0",
        "something wordpress pingback",
        "Mozilla/5.0+(CrOS+x86_64+14541.0.0)+Chrome/120.0",
        "Opera/9.80 (X11; Linux x86_64) Presto/2.12",
        "Mozilla/5.0 (iPod touch; CPU iPhone OS 15_0 like Mac OS X) Version/15.0 Mobile Safari/604.1",
    ]
    expected = classify_ua_pdf(pd.Series(uas))
    df = spark.createDataFrame([(i, u) for i, u in enumerate(uas)], ["i", "ua"])
    x = classify_ua_exprs(F.col("ua"))
    got = {
        r["i"]: r
        for r in df.select(
            "i", x["browser"].alias("b"), x["os"].alias("o"),
            x["device_type"].alias("d"), x["ua_is_bot"].alias("t"),
        ).collect()
    }
    for i in range(len(uas)):
        exp = expected.iloc[i]
        exp_t = None if exp.ua_is_bot is None else bool(exp.ua_is_bot)
        assert got[i]["b"] == exp.browser, (uas[i], got[i]["b"], exp.browser)
        assert got[i]["o"] == exp.os, (uas[i], got[i]["o"], exp.os)
        assert got[i]["d"] == exp.device_type, (uas[i], got[i]["d"], exp.device_type)
        assert got[i]["t"] == exp_t, (uas[i], got[i]["t"], exp_t)


# --- text kernels -------------------------------------------------------------

def test_token_counts_and_fingerprint(spark):
    df = spark.createDataFrame([Row(text="Hello, world! 42 times")])
    out = df.select(
        text.token_count_ws(F.col("text")).alias("ws"),
        text.token_count_bpe(F.col("text")).alias("bpe"),
        text.fingerprint(F.col("text")).alias("fp"),
    ).collect()[0]
    assert out["ws"] == 4
    # Hello , world ! 42 times -> 6 BPE-ish tokens
    assert out["bpe"] == 6
    import hashlib

    assert out["fp"] == hashlib.sha256(b"hello, world! 42 times").hexdigest()


def test_lang_id(spark):
    df = spark.createDataFrame(
        [Row(t="the cat and the dog of war"), Row(t="el que la los una casa"), Row(t="zzz qqq")]
    )
    got = [r["l"] for r in df.select(text.lang_id(F.col("t")).alias("l")).collect()]
    assert got == ["en", "es", "und"]


def test_quality_features(spark):
    df = spark.createDataFrame([Row(text="the quick, brown fox!")])
    r = text.quality_features(df).collect()[0]
    assert r["q_n_words"] == 4
    assert r["q_n_chars"] == 21
    assert r["q_punct_ratio"] == pytest.approx(2 / 21, abs=1e-6)
    assert r["q_stopword_ratio"] == pytest.approx(1 / 4, abs=1e-6)
