"""Date/time part derivation (reference operators P10/P11).

The reference parses '%Y-%m-%d' per row in Python and derives
year/month/day/weekday-name/quarter
(reference src/common_package/date_tasks.py:50-72) and extracts
hour/minute/second in SQL (time_tasks.py:21-31). All built-ins here;
unparseable dates -> NULL parts (same effect as the reference's
log-and-skip, date_tasks.py:74-75).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_date_parts(df: DataFrame, date_col: str = "date") -> DataFrame:
    # try_to_date: ANSI-safe NULL on malformed (the reference logs+skips)
    d = F.try_to_date(F.col(date_col))
    return (
        df.withColumn("year", F.year(d))
        .withColumn("month", F.month(d))
        .withColumn("day", F.dayofmonth(d))
        .withColumn("week_day", F.date_format(d, "EEEE"))
        .withColumn("quarter", F.quarter(d))
    )


def with_time_parts(df: DataFrame, time_col: str = "time") -> DataFrame:
    t = F.try_to_timestamp(F.concat(F.lit("1970-01-01 "), F.col(time_col)))
    return (
        df.withColumn("hour", F.hour(t))
        .withColumn("minute", F.minute(t))
        .withColumn("second", F.second(t))
    )
