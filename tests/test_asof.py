"""As-of join operator semantics: latest-prior match, equal-ts inclusion,
NULL before first state row (the oracle parity covers the full query; these
pin the operator contract on a hand-built frame)."""

from __future__ import annotations

import datetime as dt

from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.timeseries import (
    asof_join,
)


def _ts(h):
    return dt.datetime(2024, 1, 1, h)


def test_asof_latest_prior_and_ties(spark):
    left = spark.createDataFrame(
        [("a", _ts(0), 1.0), ("a", _ts(2), 2.0), ("a", _ts(5), 3.0), ("b", _ts(3), 9.0)],
        "series_id string, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [("a", _ts(1), 10.0), ("a", _ts(2), 20.0), ("a", _ts(4), 40.0)],
        "series_id string, eff_ts timestamp, thr double",
    )
    got = {
        (r.series_id, r.ts.hour): r.thr
        for r in asof_join(
            left, right, left_ts="ts", right_ts="eff_ts", value_cols=["thr"]
        ).collect()
    }
    assert got[("a", 0)] is None  # before any state row
    assert got[("a", 2)] == 20.0  # equal-ts state row is visible (<=)
    assert got[("a", 5)] == 40.0  # latest prior, not first
    assert got[("b", 3)] is None  # key with no state rows at all


def test_asof_preserves_left_rowcount(spark):
    left = spark.createDataFrame(
        [("a", _ts(i), float(i)) for i in range(10)],
        "series_id string, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [("a", _ts(3), 1.0)], "series_id string, eff_ts timestamp, thr double"
    )
    out = asof_join(left, right, left_ts="ts", right_ts="eff_ts", value_cols=["thr"])
    assert out.count() == 10
