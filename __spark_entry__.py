"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship star-join on sf0.001; ``queries`` /
``oracle_sql`` expose every implemented operator from SURVEY.md §2
plus the training-data operators (see
w3_data_etl_pipeline_spark/queries.py and queries_text.py). Entries
whose oracle is None are approximate/engine-internal operators the
driver checks rows-only.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from w3_data_etl_pipeline_spark import queries as _q  # noqa: E402
from w3_data_etl_pipeline_spark import queries_data as _qd  # noqa: E402,F401  (registers)
from w3_data_etl_pipeline_spark import queries_olap as _qo  # noqa: E402,F401  (registers)
from w3_data_etl_pipeline_spark import queries_ref as _qr  # noqa: E402,F401  (registers)
from w3_data_etl_pipeline_spark import queries_scale as _qs  # noqa: E402,F401  (registers)
from w3_data_etl_pipeline_spark import queries_text as _qt  # noqa: E402,F401  (registers)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.star_join_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec["spark"] for name, spec in _q.REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec["oracle"]
        for name, spec in _q.REGISTRY.items()
        if spec["oracle"] is not None
    }
