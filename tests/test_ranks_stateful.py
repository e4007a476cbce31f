"""Property tests for the distributed order-statistics utility and the
exact-state streaming operator's batch-slicing invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.functions.rng import (
    rng_draw_np,
)
from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.ranks import (
    ordered_cumsum_before,
)
from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.streaming.stateful import (
    _online_flags,
)


def test_ordered_cumsum_matches_naive(spark):
    """Exact regardless of bucket boundaries: compare against a sorted naive
    prefix sum over 1000 rows with duplicated weights and skewed values."""
    rs = np.random.RandomState(0)
    vals = np.round(np.concatenate([rs.standard_normal(700), rs.standard_normal(300) * 100]), 3)
    vals = np.unique(vals)  # utility contract: unique order keys
    w = rs.randint(1, 10, len(vals))
    pdf = pd.DataFrame({"v": vals, "w": w.astype("int64")})
    df = spark.createDataFrame(pdf)
    out = ordered_cumsum_before(df, "v", "w").toPandas().sort_values("v")
    naive = np.concatenate([[0], np.cumsum(pdf.sort_values("v")["w"].to_numpy())[:-1]])
    assert np.array_equal(out["_cum_before"].to_numpy(), naive)


def test_ordered_cumsum_few_buckets(spark):
    """Degenerate case: fewer distinct values than buckets."""
    df = spark.createDataFrame(pd.DataFrame({"v": [1.0, 2.0, 3.0], "w": [5, 7, 9]}))
    out = {r["v"]: r["_cum_before"] for r in ordered_cumsum_before(df, "v", "w").collect()}
    assert out == {1.0: 0, 2.0: 5, 3.0: 12}


@given(
    keys=st.lists(
        st.tuples(st.integers(-(2**40), 2**40), st.integers(-(2**40), 2**40)),
        min_size=1,
        max_size=50,
    ),
    salt=st.integers(min_value=0, max_value=1000),
)
@settings(max_examples=100, deadline=None)
def test_rng_np_matches_python_model(keys, salt):
    """The vectorized numpy mirror equals the scalar Python model draw-for-
    draw — including NEGATIVE keys (the pmod-guard contract)."""

    def model(ks, s):
        from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.functions.rng import (
            A,
            M,
        )

        acc = s
        for k in ks:
            acc = (acc * 31 + ((k % M) + M) % M) % M
        acc ^= acc >> 16
        acc = (acc * A) % M
        acc ^= acc >> 13
        acc = (acc * A) % M
        acc ^= acc >> 16
        return acc % M

    a = np.array([k[0] for k in keys], dtype=np.int64)
    b = np.array([k[1] for k in keys], dtype=np.int64)
    vec = rng_draw_np([a, b], salt=salt)
    for i, (x, y) in enumerate(keys):
        assert int(vec[i]) == model((x, y), salt)


class _FakeState:
    """Minimal GroupState stand-in for driving _online_flags directly."""

    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)
        self.exists = True


def _run_sliced(values, slices):
    """Feed the same event sequence through the state machine in the given
    micro-batch slicing; return (flagged event_ids, final state)."""
    state = _FakeState()
    out = []
    start = 0
    eids = np.arange(len(values))
    for size in slices:
        chunk = pd.DataFrame(
            {"event_id": eids[start : start + size], "value": values[start : start + size]}
        )
        start += size
        for pdf in _online_flags((7,), iter([chunk]), state):
            out.extend(zip(pdf["event_id"], pdf["z"], pdf["n_seen"]))
    return out, state._v


@pytest.mark.parametrize(
    "slices",
    [[100], [1, 99], [40, 40, 20], [33, 33, 33, 1], [50, 1, 49]],
)
def test_stateful_flags_invariant_to_batch_slicing(slices):
    """The exact-integer-moment spec's headline property: ANY micro-batch
    slicing produces identical flags, z values, and final state."""
    rs = np.random.RandomState(3)
    values = rs.standard_normal(100) * 10 + 50
    values[60] = 500.0  # guaranteed outlier after warm-up
    ref_out, ref_state = _run_sliced(values, [100])
    out, st_ = _run_sliced(values, slices)
    assert out == ref_out
    assert st_ == ref_state
    assert any(eid == 60 for eid, _, _ in ref_out), "the planted outlier must flag"


def test_stateful_bigint_fallback_matches_fast_path():
    """The arbitrary-precision path (the branch taken when int64 prefixes
    could overflow) computes the exact same statistics as the int64 fast
    path — here replicated step-for-step and compared to the operator."""
    import unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.streaming.stateful as S

    rs = np.random.RandomState(4)
    values = rs.standard_normal(80) + 5
    ref_out, _ = _run_sliced(values, [80])  # operator, fast path
    # the fallback's object-int recurrence, verbatim:
    q = np.floor(values * 1000.0 + 0.5).astype(np.int64)
    acc1, acc2 = 0, 0
    s1f = np.empty(80)
    s2f = np.empty(80)
    for i in range(80):
        s1f[i], s2f[i] = float(acc1), float(acc2)
        acc1 += int(q[i])
        acc2 += int(q[i]) ** 2
    n_prev = np.arange(80, dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        mean = s1f / n_prev
        var = (s2f - s1f * s1f / n_prev) / (n_prev - 1.0)
        z = (q.astype(np.float64) - mean) / np.sqrt(var)
    flag = (np.arange(80) >= S.WARMUP) & (var > 0) & (np.abs(z) > S.Z_THRESHOLD)
    manual = list(zip(np.arange(80)[flag], z[flag], np.arange(80)[flag]))
    assert [(int(a), float(b), int(c)) for a, b, c in manual] == [
        (int(a), float(b), int(c)) for a, b, c in ref_out
    ]


def test_stateful_overflow_regime_exact():
    """|q| > ~3.03e9 makes q*q wrap in int64: the guard must be computed from
    Python-int |q|.max() (never an int64 square) and the fallback must square
    Python ints. Values ~4e6 → q ~4e9 → q² ≈ 1.6e19 > 2^63."""
    import unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.streaming.stateful as S

    rs = np.random.RandomState(11)
    n = 60
    values = 4.0e6 + rs.standard_normal(n) * 100.0
    values[45] = 4.2e6  # outlier on the quantized lattice
    q = np.floor(values * 1000.0 + 0.5).astype(np.int64)
    assert int(np.abs(q).max()) ** 2 > 2**63, "test must be in the wrap regime"

    out, final_state = _run_sliced(values, [20, 20, 20])

    # Exact Python-int replica of the spec
    acc1, acc2 = 0, 0
    s1f, s2f = np.empty(n), np.empty(n)
    for i in range(n):
        s1f[i], s2f[i] = float(acc1), float(acc2)
        acc1 += int(q[i])
        acc2 += int(q[i]) ** 2
    n_prev = np.arange(n, dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        mean = s1f / n_prev
        var = (s2f - s1f * s1f / n_prev) / (n_prev - 1.0)
        z = (q.astype(np.float64) - mean) / np.sqrt(var)
    flag = (np.arange(n) >= S.WARMUP) & (var > 0) & (np.abs(z) > S.Z_THRESHOLD)

    assert final_state == (n, str(acc1), str(acc2))
    assert acc2 > 2**63, "exact Σq² must exceed int64 — proves no wrap survived"
    expect = [(int(i), float(z[i]), int(i)) for i in np.arange(n)[flag]]
    assert [(int(a), float(b), int(c)) for a, b, c in out] == expect
    assert len(expect) > 0, "the planted outlier must flag"
