"""Deterministic mergeable quantile sketch: the properties the docstring
claims (operators/sketch.py).

The headline is slicing independence — the sketch STATE (and therefore
every estimate) must be a pure function of the input multiset, identical
under any partition layout and any merge tree — plus the exact-degrade
property (n ≤ k → exact quantiles) and the sampling error bound."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.sketch import (
    QSKETCH_SALT,
    bottom_k_sample,
    sketch_quantiles,
)


def _mk_df(spark, n=3000, groups=3):
    """Deterministic synthetic frame: uid-dense, skewed values."""
    return spark.range(n).select(
        (F.col("id") % groups).cast("string").alias("g"),
        F.col("id").alias("uid"),
        # piecewise value spread so quantiles differ per group
        ((F.col("id") * 37 % 1000).cast("double") / 10.0).alias("v"),
    )


def _collect_sketch(df):
    out = sketch_quantiles(df, "g", "v", ["uid"], k=64, salt=QSKETCH_SALT)
    return sorted(tuple(r) for r in out.collect())


def test_sketch_invariant_to_partition_layout(spark):
    """repartition(1) / repartition(11) / hash-by-value / descending sort —
    one canonical state, one answer."""
    df = _mk_df(spark)
    base = _collect_sketch(df)
    assert base == _collect_sketch(df.repartition(1))
    assert base == _collect_sketch(df.repartition(11))
    assert base == _collect_sketch(df.repartition(5, "v"))
    assert base == _collect_sketch(df.sort(F.desc("v")))


def test_bottom_k_merge_identity(spark):
    """B_k(A ∪ B) == B_k(B_k(A) ∪ B_k(B)) — the identity that makes any
    merge tree (and any micro-batch slicing) reach the same state. The
    split is adversarial: by value parity, so both halves fight for the
    same groups."""
    df = _mk_df(spark, n=2000)
    a = df.filter(F.col("uid") % 2 == 0)
    b = df.filter(F.col("uid") % 2 == 1)
    k = 32
    whole = bottom_k_sample(df, "g", ["uid"], k=k, salt=QSKETCH_SALT)
    merged = bottom_k_sample(
        bottom_k_sample(a, "g", ["uid"], k=k, salt=QSKETCH_SALT).unionAll(
            bottom_k_sample(b, "g", ["uid"], k=k, salt=QSKETCH_SALT)
        ),
        "g",
        ["uid"],
        k=k,
        salt=QSKETCH_SALT,
    )
    key = lambda r: (r.g, r.uid)
    assert sorted(map(key, whole.collect())) == sorted(map(key, merged.collect()))


def test_sketch_exact_when_group_fits(spark):
    """n ≤ k → the sample IS the group and the integer-rank picks are the
    exact lower-nearest quantiles."""
    import math

    df = _mk_df(spark, n=150, groups=3)  # 50 rows per group < k=64
    got = {r.g: r for r in sketch_quantiles(df, "g", "v", ["uid"], k=64).collect()}
    rows = df.collect()
    for g in ("0", "1", "2"):
        vals = sorted((r.v, r.uid) for r in rows if r.g == g)
        m = len(vals)
        assert got[g].n == m and got[g].m == m
        for pct, col in ((50, "p50"), (90, "p90"), (99, "p99")):
            assert getattr(got[g], col) == vals[(pct * (m - 1)) // 100][0]


def test_sketch_rank_error_bound(spark):
    """With n >> k the estimate's TRUE rank must sit within a few n/sqrt(k)
    of the target — the order-sample guarantee (loose 5x constant, fixed
    seed, so this is deterministic, not flaky)."""
    df = _mk_df(spark, n=9000, groups=1)
    got = sketch_quantiles(df, "g", "v", ["uid"], k=64).collect()[0]
    vals = sorted(r.v for r in df.select("v").collect())
    n = len(vals)
    tol = 5.0 * n / (64**0.5)  # ~5600/8 ≈ 703 ranks per unit constant
    import bisect

    for pct, col in ((50, "p50"), (90, "p90"), (99, "p99")):
        est = getattr(got, col)
        lo = bisect.bisect_left(vals, est)
        hi = bisect.bisect_right(vals, est)
        target = pct / 100.0 * (n - 1)
        # the whole tie-run of est must straddle within tolerance
        assert lo - tol <= target <= hi + tol, (pct, est, lo, hi, target)


def test_sketch_plan_shape(spark, sf_dir):
    """The registered query's plan must show Catalyst's map-side rank-limit
    combiner (WindowGroupLimit Partial BEFORE the exchange, Final after) so
    at most k rows per group per task ever shuffle — the O(k·tasks)
    contract — and no Python stage anywhere (the sketch is all-JVM)."""
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.plans.registry import (
        REGISTRY,
    )

    df = REGISTRY["a_quantile_sketch"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    partial = plan.find("WindowGroupLimit") != -1 and "Partial" in plan
    assert partial, "map-side rank-limit combiner missing"
    i_partial = plan.find(", Partial")
    i_exchange = plan.find("Exchange hashpartitioning")
    assert i_partial != -1 and i_exchange != -1
    # toString prints top-down: the Partial limit sits BELOW (after in
    # text) the exchange it feeds
    assert i_partial > i_exchange, "partial limit not below the exchange"
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
