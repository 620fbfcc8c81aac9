"""The reference pipeline end-to-end, Spark-first: W3C logs ->
enriched staging -> 10 dimensions -> star-schema fact, in ONE lazy
DataFrame lineage instead of 27 Airflow tasks communicating through
Postgres side effects (reference src/dags/w3c.py:57-459).

Anti-patterns eliminated (SURVEY.md §4.1): the four separate UA
parses become one Arrow struct UDF; per-row UPDATE loops become
vectorized columns; the 11 sequential fact rewrites become 10 chained
broadcast joins in a single codegen pass; the per-IP HTTP calls
become a broadcast lookup join against a deterministic local geo
provider (the external service of ip_tasks.py:67-91 is stubbed —
network is out of scope — but the join pattern is the real one).

Dim shapes match the reference DDLs:
  dim_ip(ip_id, ip, country_code, country_name, latitude, longitude)
  dim_date(date_id, date, year, month, day, week_day, quarter)
  dim_time(time_id, time, hour, minute, second)
  dim_browser(browser_id, browser)        # derived family, distinct
  dim_os(os_id, os)
  dim_device(device_id, device_type)
  dim_file(file_id, raw_file_path, file_path, file_directory,
           file_name, file_extension, file_type)
  dim_status_code(status_code_id, status_code, code_phrase,
                  code_type, code_description)
  dim_http_method(http_method_id, http_method)
  dim_time_taken(time_taken_id, time_taken, time_category,
                 min_category_time, max_category_time)
  log_fact_table(log_id, <10 surrogate ids>, is_bot)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.bands import band_struct
from .functions.datetime_parts import with_date_parts, with_time_parts
from .functions.paths import normalize_path
from .functions.status import enrich_status
from .functions.ua import enrich_user_agent
from .operators.dims import distinct_dim, surrogate_ids
from .operators.fact import build_fact
from .sources.w3c import read_w3c_logs

GEO_COUNTRIES = [
    ("GB", "United Kingdom"), ("US", "United States"), ("DE", "Germany"),
    ("FR", "France"), ("NL", "Netherlands"), ("SE", "Sweden"),
    ("CN", "China"), ("JP", "Japan"), ("AU", "Australia"), ("BR", "Brazil"),
]


def ip_to_long(c: F.Column) -> F.Column:
    """Dotted-quad IPv4 -> 32-bit integer (NULL for malformed/IPv6 —
    try_cast keeps ANSI mode from throwing on garbage input)."""
    o = F.split(c, r"\.")
    return (
        o[0].try_cast("long") * 16_777_216
        + o[1].try_cast("long") * 65_536
        + o[2].try_cast("long") * 256
        + o[3].try_cast("long")
    )


def geo_ranges(spark: SparkSession) -> DataFrame:
    """Deterministic CIDR->geo lookup table: one row per IPv4 /8 block
    with a country + centroid. Stands in for the external provider's
    database (reference ip_tasks.py:67-91 calls geolocation-db.com per
    IP over HTTP; no network here) with the REAL production join
    shape: a broadcast range join against a CIDR table — at scale a
    full GeoIP CIDR dump is a few MB, comfortably broadcastable."""
    rows = []
    for i in range(256):
        cc, cn = GEO_COUNTRIES[(i * 7 + 3) % len(GEO_COUNTRIES)]
        rows.append(
            (
                i << 24,
                ((i + 1) << 24) - 1,
                cc,
                cn,
                float(((i * 37) % 180) - 90) + 0.5,
                float(((i * 73) % 360) - 180) + 0.5,
            )
        )
    return spark.createDataFrame(
        rows,
        "lo long, hi long, country_code string, country_name string, "
        "latitude double, longitude double",
    )


def geo_lookup(ips: DataFrame) -> DataFrame:
    """Geo enrichment as a broadcast CIDR-range lookup: one row per
    distinct IP (same join-shape as the reference's per-IP enrichment,
    minus the 2-network-round-trips-per-row anti-pattern). Left join:
    unparseable IPs keep NULL geo, like a failed provider lookup."""
    ranges = geo_ranges(ips.sparkSession)
    with_long = ips.withColumn("_ipl", ip_to_long(F.col("ip")))
    joined = with_long.join(
        F.broadcast(ranges),
        (F.col("_ipl") >= F.col("lo")) & (F.col("_ipl") <= F.col("hi")),
        "left",
    )
    return joined.select(
        "ip", "country_code", "country_name", "latitude", "longitude"
    )


def build_star_schema(spark: SparkSession, log_path: str) -> dict[str, DataFrame]:
    staging = read_w3c_logs(spark, log_path)
    staging = enrich_user_agent(staging)  # + browser, os, device_type, is_bot
    staging = staging.persist()  # shared scan for 10 dim branches + fact

    def dim(df: DataFrame, order_col: str, id_col: str) -> DataFrame:
        return surrogate_ids(df, order_col, id_col)

    dim_ip = dim(geo_lookup(distinct_dim(staging, "ip")), "ip", "ip_id")
    dim_date = dim(with_date_parts(distinct_dim(staging, "date")), "date", "date_id")
    dim_time = dim(with_time_parts(distinct_dim(staging, "time")), "time", "time_id")
    dim_browser = dim(distinct_dim(staging, "browser"), "browser", "browser_id")
    dim_os = dim(distinct_dim(staging, "os"), "os", "os_id")
    dim_device = dim(distinct_dim(staging, "device_type"), "device_type", "device_id")
    dim_file = dim(
        normalize_path(distinct_dim(staging, "raw_file_path")), "raw_file_path", "file_id"
    )
    dim_status = dim(
        enrich_status(distinct_dim(staging, "status_code"), spark), "status_code", "status_code_id"
    )
    dim_method = dim(distinct_dim(staging, "http_method"), "http_method", "http_method_id")
    tt = distinct_dim(staging, "time_taken")
    tt_b = tt.withColumn("_b", band_struct(F.col("time_taken")))
    dim_tt = dim(
        tt_b.select(
            "time_taken",
            F.col("_b.time_category").alias("time_category"),
            F.col("_b.min_category_time").alias("min_category_time"),
            F.col("_b.max_category_time").alias("max_category_time"),
        ),
        "time_taken",
        "time_taken_id",
    )

    fact = build_fact(
        staging,
        {
            "date": (dim_date, "date", "date_id"),
            "time": (dim_time, "time", "time_id"),
            "http_method": (dim_method, "http_method", "http_method_id"),
            "file": (dim_file, "raw_file_path", "file_id"),
            "ip": (dim_ip, "ip", "ip_id"),
            "browser": (dim_browser, "browser", "browser_id"),
            "os": (dim_os, "os", "os_id"),
            "device": (dim_device, "device_type", "device_id"),
            "status_code": (dim_status, "status_code", "status_code_id"),
            "time_taken": (dim_tt, "time_taken", "time_taken_id"),
        },
        keep_cols=["log_id", "is_bot"],
    )
    # reference aliases <dim>_id columns; build_fact emits <name>_id already
    return {
        "staging_log_data": staging,
        "dim_ip": dim_ip,
        "dim_date": dim_date,
        "dim_time": dim_time,
        "dim_browser": dim_browser,
        "dim_os": dim_os,
        "dim_device": dim_device,
        "dim_file": dim_file,
        "dim_status_code": dim_status,
        "dim_http_method": dim_method,
        "dim_time_taken": dim_tt,
        "log_fact_table": fact,
    }


# --- the reference's 7 analysis queries (testing/test_queries.sql) ----------

def analysis_queries(star: dict[str, DataFrame]) -> dict[str, DataFrame]:
    f = star["log_fact_table"]
    q = {}
    q["gb_traffic"] = f.join(
        F.broadcast(star["dim_ip"].filter(F.col("country_code") == "GB")), "ip_id"
    )
    q["nonbot_by_year_quarter"] = (
        f.filter(~F.col("is_bot"))
        .join(F.broadcast(star["dim_date"]), "date_id")
        .groupBy("year", "quarter")
        .agg(F.count("*").alias("n"))
        .orderBy("year", "quarter")
    )
    q["nonbot_by_hour"] = (
        f.filter(~F.col("is_bot"))
        .join(F.broadcast(star["dim_time"]), "time_id")
        .groupBy("hour")
        .agg(F.count("*").alias("n"))
        .orderBy("hour")
    )
    q["nonbot_by_weekday"] = (
        f.filter(~F.col("is_bot"))
        .join(F.broadcast(star["dim_date"]), "date_id")
        .groupBy("week_day")
        .agg(F.count("*").alias("n"))
    )
    q["band_sanity"] = (
        star["dim_time_taken"]
        .filter(F.col("min_category_time") < 5000)
        .groupBy("time_category", "min_category_time", "max_category_time")
        .agg(F.count("*").alias("count"))
        .orderBy("min_category_time")
    )
    q["requests_by_band"] = (
        f.join(F.broadcast(star["dim_time_taken"].filter(F.col("min_category_time") < 5000)), "time_taken_id")
        .groupBy("time_category", "min_category_time")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("min_category_time").desc())
        .select("time_category", "n")
    )
    q["requests_by_device"] = (
        f.join(F.broadcast(star["dim_device"]), "device_id")
        .groupBy("device_type")
        .agg(F.count("*").alias("n"))
    )
    return q
