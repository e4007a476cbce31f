"""Property tests for the synthetic anomaly injectors (SURVEY §5.2 #4):
types 1/2 conserve day energy (displaced to the day-end spike), types 3/4
change exactly one point, gt marks exactly the altered points."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators import (
    anomaly as AN,
)
from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.sources.readers import (
    load_table,
)


@pytest.fixture(scope="module")
def injected(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    df = AN.inject_anomalies(AN.prepared_series(ev))
    df.cache().count()
    return df


def test_types_1_2_conserve_day_energy(injected):
    day = F.date_trunc("day", F.col("ts"))
    has23 = F.max((F.hour("ts") == 23).cast("int"))
    per_day = (
        injected.filter(F.col("atype").isin(1, 2))
        .groupBy("series_id", day.alias("day"), "atype")
        .agg(
            F.sum("value").alias("before"),
            F.sum("value_contam").alias("after"),
            has23.alias("has_h23"),
        )
        .filter(F.col("has_h23") == 1)  # energy returns at hour 23
    )
    rows = per_day.collect()
    assert rows, "no type-1/2 contaminated days found"
    for r in rows:
        assert abs(r.before - r.after) < 1e-6, (r.series_id, r.day, r.before, r.after)


def test_types_3_4_touch_single_point(injected):
    day = F.date_trunc("day", F.col("ts"))
    per_day = (
        injected.filter(F.col("atype").isin(3, 4))
        .groupBy("series_id", day.alias("day"))
        .agg(
            F.sum((F.col("value") != F.col("value_contam")).cast("int")).alias("n_changed"),
            F.sum("gt").alias("n_gt"),
        )
    )
    rows = per_day.collect()
    assert rows
    assert any(r.n_gt == 1 for r in rows)
    for r in rows:
        # ≤1 point altered; n_gt can be 0 on partial edge days whose grid
        # lacks the RNG-chosen hour, or when the point's value is 0 (fill)
        assert r.n_changed <= 1 and r.n_gt <= 1


def test_gt_covers_all_changes(injected):
    changed_unmarked = injected.filter(
        (F.col("value") != F.col("value_contam")) & (F.col("gt") == 0)
    ).count()
    assert changed_unmarked == 0


def test_clean_days_untouched(injected):
    touched = injected.filter(
        (F.col("atype") == 0) & (F.col("value") != F.col("value_contam"))
    ).count()
    assert touched == 0
