"""User-agent classification (reference operators P15-P18).

The reference parses the SAME user-agent string four separate times
(browser family, OS family, device type, bot flag — reference
src/common_package/{browser,os,device,bot}_tasks.py); here the rule
tables drive TWO parity-tested implementations: the default execution
path is pure whole-stage-codegen `rlike` when-chains
(``classify_ua_exprs`` — zero Python, no Arrow hop), and an
Arrow-vectorized pandas twin (``classify_ua_pdf``) serves as the
unit-test / oracle-LUT oracle. The classifier itself is an original
regex-table heuristic over public UA conventions (the `user_agents`
package is not installed in this image).

W3C/IIS logs encode spaces in the UA as '+'
(e.g. ``Mozilla/4.0+(compatible;+MSIE+8.0;...)``) — decoded first.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ADDITIONAL_BOT_BROWSERS = [
    # reference src/common_package/bot_tasks.py:11-16
    "Huaweisymantecspider",
    "HuaweiSymantecSpider",
    "SurveyBot",
    "MSIECrawler",
]

# ordered (pattern, family) tables — first match wins
_BROWSER_RULES: list[tuple[str, str]] = [
    (r"huaweisymantecspider", "HuaweiSymantecSpider"),
    (r"surveybot", "SurveyBot"),
    (r"msiecrawler", "MSIECrawler"),
    (r"googlebot", "Googlebot"),
    (r"bingbot|msnbot", "bingbot"),
    (r"yahoo!?\s*slurp", "Yahoo! Slurp"),
    (r"twiceler", "Twiceler"),
    (r"baiduspider", "Baiduspider"),
    (r"yandex(?:bot)?", "YandexBot"),
    (r"duckduckbot", "DuckDuckBot"),
    (r"ahrefsbot", "AhrefsBot"),
    (r"semrushbot", "SemrushBot"),
    (r"facebookexternalhit", "FacebookBot"),
    (r"opera|opr/", "Opera"),
    (r"edg(?:e|a|ios)?/", "Edge"),
    (r"firefox/", "Firefox"),
    (r"crios/", "Chrome Mobile iOS"),
    (r"chrome/", "Chrome"),
    (r"version/.*safari", "Safari"),
    (r"safari", "Safari"),
    (r"msie|trident", "IE"),
    (r"curl/", "curl"),
    (r"wget", "Wget"),
    (r"python-requests|python-urllib", "Python Requests"),
]

_GENERIC_BOT = r"bot|crawl|spider|slurp|archiver|fetch|scan|wordpress|feedburner|pingdom|monitor"

_OS_RULES: list[tuple[str, str]] = [
    (r"windows nt 10", "Windows 10"),
    (r"windows nt 6\.3", "Windows 8.1"),
    (r"windows nt 6\.2", "Windows 8"),
    (r"windows nt 6\.1", "Windows 7"),
    (r"windows nt 6\.0", "Windows Vista"),
    (r"windows nt 5\.2", "Windows XP"),
    (r"windows nt 5\.1", "Windows XP"),
    (r"windows nt 5\.0", "Windows 2000"),
    (r"windows phone", "Windows Phone"),
    (r"windows", "Windows"),
    (r"android", "Android"),
    (r"iphone|ipad|ipod|ios", "iOS"),
    (r"mac os x|macintosh", "Mac OS X"),
    (r"cros", "Chrome OS"),
    (r"linux", "Linux"),
    (r"symbian|symbos", "Symbian OS"),
    (r"blackberry", "BlackBerry OS"),
]

UA_STRUCT = T.StructType(
    [
        T.StructField("browser", T.StringType(), True),
        T.StructField("os", T.StringType(), True),
        T.StructField("device_type", T.StringType(), True),
        T.StructField("ua_is_bot", T.BooleanType(), True),
    ]
)


def _first_match(s: pd.Series, rules: list[tuple[str, str]], default: str) -> pd.Series:
    out = pd.Series(default, index=s.index, dtype="object")
    unresolved = s.notna()
    for pat, family in rules:
        hit = unresolved & s.str.contains(pat, case=False, regex=True, na=False)
        out[hit] = family
        unresolved &= ~hit
    out[s.isna()] = None
    return out


def classify_ua_pdf(ua: pd.Series) -> pd.DataFrame:
    """Classify a UA batch. UA strings are heavily repeated in real
    traffic (and in the W3C corpus), so classify each DISTINCT value
    once and broadcast back — the reference's build-the-dimension-
    from-DISTINCT trick (SURVEY.md §4.1) applied inside the Arrow
    batch. Falls through to the direct path when values are unique."""
    uniq = ua.dropna().unique()
    if 0 < len(uniq) < max(64, len(ua) // 4):
        lut = _classify_unique(pd.Series(uniq))
        out = ua.map(lut).apply(
            lambda v: v if isinstance(v, tuple) else (None, None, None, None)
        )
        return pd.DataFrame(
            out.tolist(), columns=["browser", "os", "device_type", "ua_is_bot"], index=ua.index
        )
    return _classify_unique_frame(ua)


def _classify_unique(uniq: pd.Series) -> dict:
    f = _classify_unique_frame(uniq)
    return {
        u: (f["browser"].iat[i], f["os"].iat[i], f["device_type"].iat[i], f["ua_is_bot"].iat[i])
        for i, u in enumerate(uniq)
    }


def _classify_unique_frame(ua: pd.Series) -> pd.DataFrame:
    s = ua.str.replace("+", " ", regex=False)
    browser = _first_match(s, _BROWSER_RULES, "Other")
    os_fam = _first_match(s, _OS_RULES, "Other")
    is_bot = (
        s.str.contains(_GENERIC_BOT, case=False, regex=True, na=False)
        | browser.isin(ADDITIONAL_BOT_BROWSERS)
        | browser.isin(["Googlebot", "bingbot", "Yahoo! Slurp", "Twiceler", "Baiduspider",
                        "YandexBot", "DuckDuckBot", "AhrefsBot", "SemrushBot", "FacebookBot"])
    )
    mobile = s.str.contains(r"mobile|iphone|ipod|windows phone|symbian|blackberry", case=False, na=False)
    tablet = s.str.contains(r"ipad|tablet", case=False, na=False) | (
        s.str.contains("android", case=False, na=False)
        & ~s.str.contains("mobile", case=False, na=False)
    )
    pc = s.str.contains(r"windows nt|macintosh|x11|linux|cros", case=False, na=False)
    device = pd.Series("Unknown", index=s.index, dtype="object")
    device[pc] = "PC"
    device[tablet] = "Tablet"
    device[mobile & ~tablet] = "Mobile"
    device[is_bot] = "Unknown"
    device[s.isna()] = None
    return pd.DataFrame(
        {"browser": browser, "os": os_fam, "device_type": device, "ua_is_bot": is_bot.where(s.notna(), None)}
    )


# Arrow-vectorized form of the pandas twin, kept for callers that
# need a struct UDF (no in-repo consumer since the codegen switch —
# the execution paths use classify_ua_exprs; classify_ua_pdf feeds
# the oracle LUT and parity tests)
classify_ua = F.pandas_udf(classify_ua_pdf, UA_STRUCT)


# --- pure-codegen twin -------------------------------------------------
# The rule tables above are plain first-match-wins regex chains, so the
# whole classifier is expressible as JVM `rlike` when-chains: no Arrow
# hop, no Python workers, whole-stage codegen end to end. This is the
# default execution path; the pandas implementation is kept as the
# unit-test oracle (tests assert bit-parity over the UA pool plus junk
# inputs, cf. tests/test_dims_enrich.py) and for pandas-side reuse.
# Java and Python regex agree on every construct these tables use
# (literals, alternation, (?:...), \s, \.); case-insensitivity is the
# (?i) flag instead of pandas' case=False.


def _rlike_chain(s, rules: list[tuple[str, str]], default: str):
    expr = F.lit(default)
    for pat, family in reversed(rules):
        expr = F.when(s.rlike(f"(?i){pat}"), F.lit(family)).otherwise(expr)
    return F.when(s.isNull(), F.lit(None).cast("string")).otherwise(expr)


def classify_ua_exprs(ua) -> dict:
    """browser/os/device_type/ua_is_bot as codegen Column expressions
    over a UA string column — same outputs as ``classify_ua_pdf``."""
    s = F.replace(ua, F.lit("+"), F.lit(" "))
    browser = _rlike_chain(s, _BROWSER_RULES, "Other")
    os_fam = _rlike_chain(s, _OS_RULES, "Other")
    bot_browsers = ADDITIONAL_BOT_BROWSERS + [
        "Googlebot", "bingbot", "Yahoo! Slurp", "Twiceler", "Baiduspider",
        "YandexBot", "DuckDuckBot", "AhrefsBot", "SemrushBot", "FacebookBot",
    ]
    is_bot = F.when(
        s.isNull(), F.lit(None).cast("boolean")
    ).otherwise(s.rlike(f"(?i){_GENERIC_BOT}") | browser.isin(bot_browsers))
    mobile = s.rlike(r"(?i)mobile|iphone|ipod|windows phone|symbian|blackberry")
    tablet = s.rlike(r"(?i)ipad|tablet") | (
        s.rlike(r"(?i)android") & ~s.rlike(r"(?i)mobile")
    )
    pc = s.rlike(r"(?i)windows nt|macintosh|x11|linux|cros")
    device = (
        F.when(s.isNull(), F.lit(None).cast("string"))
        .when(is_bot, F.lit("Unknown"))
        .when(mobile & ~tablet, F.lit("Mobile"))
        .when(tablet, F.lit("Tablet"))
        .when(pc, F.lit("PC"))
        .otherwise(F.lit("Unknown"))
    )
    return {"browser": browser, "os": os_fam, "device_type": device, "ua_is_bot": is_bot}


def enrich_user_agent(df: DataFrame, ua_col: str = "browser_string", path_col: str = "raw_file_path") -> DataFrame:
    """Adds browser, os, device_type, is_bot — pure whole-stage-codegen
    rlike chains (see ``classify_ua_exprs``), zero Python in the path.

    is_bot = UA-bot OR path == '/robots.txt' OR browser in the
    additional-bot allowlist (reference bot_tasks.py:58-59).
    """
    e = classify_ua_exprs(F.col(ua_col))
    return (
        df.withColumn("browser", e["browser"])
        .withColumn("os", e["os"])
        .withColumn("device_type", F.coalesce(e["device_type"], F.lit("Unknown")))
        .withColumn(
            "is_bot",
            F.coalesce(e["ua_is_bot"], F.lit(False))
            | (F.col(path_col) == "/robots.txt")
            | e["browser"].isin(ADDITIONAL_BOT_BROWSERS),
        )
    )
