"""Driver contract for the PySpark-native engine.

``entry(spark)`` runs the flagship order-flow candle query on sf0.001;
``queries()``/``oracle_sql()`` expose the declared query contract
(SURVEY.md section 2.3) backed by
``live_market_data_orderflow_analysis_big_data_project__spark.queries``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from live_market_data_orderflow_analysis_big_data_project__spark.flagship import (
    flagship_candles,
)
from live_market_data_orderflow_analysis_big_data_project__spark.queries import (
    ORACLE,
    QUERIES,
)

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_candles(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2.3."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each hash-checkable query."""
    return dict(ORACLE)
