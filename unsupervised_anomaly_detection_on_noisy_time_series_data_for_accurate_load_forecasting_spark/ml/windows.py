"""Window materialization for the ML anomaly-detection layer.

Mirrors the reference's window dataset contract (SURVEY.md §1.1):
one row per (series, day) with the day's value vector and the aligned
ground-truth mask — ARRAY columns instead of .npy-per-window files
(reference: src/data_processing/process_aemo.py:146-223).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.timeseries import SID, TS


def day_windows(point_df: DataFrame, day_size: int = 24, value_col: str = "value_contam") -> DataFrame:
    """(series_id, window_start, points[], gt[], window_label) — complete days
    only (P4 NaN-window suppression analog: short days are dropped).

    One shuffle on (series, day); arrays are assembled with an order-pinned
    sort inside the aggregation, so results are partition-independent."""
    day = F.date_trunc("day", F.col(TS))
    g = (
        point_df.withColumn("_day", day)
        .groupBy(SID, "_day")
        .agg(
            F.array_sort(F.collect_list(F.struct(TS, F.col(value_col).alias("v"), "gt"))).alias("pts"),
        )
        .filter(F.size("pts") == day_size)
    )
    return g.select(
        SID,
        F.col("_day").alias("window_start"),
        F.expr("transform(pts, s -> s.v)").alias("points"),
        F.expr("transform(pts, s -> s.gt)").alias("gt"),
        F.expr("CAST(exists(pts, s -> s.gt = 1) AS INT)").alias("window_label"),
    )
