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


def test_asof_matches_bruteforce_on_random_frames(spark):
    # randomized cross-check: the union-and-carry plan must agree with a
    # brute-force per-row "latest right row <= ts" scan on arbitrary frames
    # (duplicate left timestamps, interleaved keys, sparse state rows)
    import random

    rnd = random.Random(7)
    for trial in range(3):
        left_rows = [
            (k, _ts(rnd.randrange(24)), float(i))
            for i, k in enumerate(rnd.choices("abc", k=40))
        ]
        right_rows = [
            (k, _ts(rnd.randrange(24)), float(100 + i))
            for i, k in enumerate(rnd.choices("abc", k=8))
        ]
        # right keys must be unique per (key, ts): keep first
        seen, rr = set(), []
        for k, t, v in right_rows:
            if (k, t) not in seen:
                seen.add((k, t))
                rr.append((k, t, v))
        left = spark.createDataFrame(
            left_rows, "series_id string, ts timestamp, value double"
        )
        right = spark.createDataFrame(
            rr, "series_id string, eff_ts timestamp, thr double"
        )
        got = {
            (r.series_id, r.ts, r.value): r.thr
            for r in asof_join(
                left, right, left_ts="ts", right_ts="eff_ts", value_cols=["thr"]
            ).collect()
        }
        for k, t, v in left_rows:
            cand = [(rt, rv) for rk, rt, rv in rr if rk == k and rt <= t]
            want = max(cand)[1] if cand else None
            assert got[(k, t, v)] == want, (trial, k, t, v, got[(k, t, v)], want)
