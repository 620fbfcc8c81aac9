"""Latency banding (reference operator P14).

The reference classifies time-taken into 10 named ranges by scanning
an ordered list and returning the FIRST band whose [min,max] contains
the value, bounds inclusive, top band open-ended
(reference src/common_package/time_taken_tasks.py:12-23,88-97).
The list order intentionally wins over overlaps: 30000 -> '30s+'
(listed before '10s-30s'), 2000 -> '2s-5s' (listed before '1s-2s').
We replicate that observable semantics exactly with an ordered
``when`` chain — pure codegen, no shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# (label, min_ms, max_ms) in reference list order; None max = open-ended
# (verbatim semantics of reference time_taken_tasks.py:12-23)
TIME_RANGES: list[tuple[str, int, int | None]] = [
    ("1min+", 100000, None),
    ("30s+", 30000, 99999),
    ("10s-30s", 10000, 30000),
    ("5s-10s", 5000, 10000),
    ("2s-5s", 2000, 5000),
    ("1s-2s", 1000, 2000),
    ("500ms-1s", 500, 999),
    ("200ms-500ms", 200, 499),
    ("100ms-200ms", 100, 199),
    ("<100ms", 0, 99),
]


def band_struct(value: F.Column) -> F.Column:
    """Returns struct(time_category, min_category_time, max_category_time);
    NULL-in -> NULL-out (matches fact NULL-key semantics, SURVEY.md §2.6.4)."""
    expr = F.lit(None).cast("struct<time_category:string,min_category_time:int,max_category_time:int>")
    for label, lo, hi in reversed(TIME_RANGES):
        cond = (value >= lo) if hi is None else ((value >= lo) & (value <= hi))
        expr = F.when(
            cond,
            F.struct(
                F.lit(label).alias("time_category"),
                F.lit(lo).cast("int").alias("min_category_time"),
                F.lit(hi).cast("int").alias("max_category_time"),
            ),
        ).otherwise(expr)
    return expr


def band_label(value: F.Column) -> F.Column:
    return band_struct(value)["time_category"]


def _case_sql(value_expr: str, pick) -> str:
    whens = []
    for label, lo, hi in TIME_RANGES:
        cond = f"{value_expr} >= {lo}" if hi is None else f"{value_expr} BETWEEN {lo} AND {hi}"
        whens.append(f"WHEN {cond} THEN {pick(label, lo, hi)}")
    return "CASE " + " ".join(whens) + " ELSE NULL END"


def band_case_sql(value_expr: str) -> str:
    """The same banding as ANSI SQL (for DuckDB oracles)."""
    return _case_sql(value_expr, lambda label, lo, hi: f"'{label}'")


def band_min_case_sql(value_expr: str) -> str:
    return _case_sql(value_expr, lambda label, lo, hi: f"CAST({lo} AS INT)")


def band_max_case_sql(value_expr: str) -> str:
    return _case_sql(
        value_expr, lambda label, lo, hi: "CAST(NULL AS INT)" if hi is None else f"CAST({hi} AS INT)"
    )
