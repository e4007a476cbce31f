"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over the engine's query registry
(``unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.plans``):
each registered QuerySpec carries the Spark callable and, where the operator
is SQL-expressible, the DuckDB oracle string.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark import (
    plans,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return plans.REGISTRY["pipeline_anomaly_e2e"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return plans.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query above."""
    return plans.oracle_sql()
