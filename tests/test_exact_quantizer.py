"""The tie-free quantizer (functions/exact.py) must agree across Spark,
DuckDB, and the Python model on ALL doubles — including the adversarial
dyadic midpoints (e.g. 0.0078125 = 2⁻⁷ sits exactly on a 1e-6 decimal
midpoint) where a naive decimal cast diverges between engines
(Spark HALF_UP vs DuckDB half-even)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.functions.exact import (
    dec_sql,
    dsum,
    dsum_sql,
)

# dyadic decimal midpoints + regular values + negatives + tiny/large
ADVERSARIAL = [
    0.0078125,  # 2^-7: exactly on the .0000078125 → …8125e-6 midpoint family
    0.0000005,  # nearest double to 5e-7 (not exact — must round consistently)
    0.5078125,
    -0.0078125,
    0.53125,
    1.0000005,
    123.4567895,
    -42.9999995,
    0.0,
    1e-7,
    99999.0078125,
]


def _py_q(x: float) -> float:
    """The Python model of the quantizer: floor(x·1e6 + 0.5) exact-int / 1e6."""
    return math.floor(x * 1e6 + 0.5) / 1e6


def test_adversarial_values_agree_spark_duck_python(spark):
    df = spark.createDataFrame(pd.DataFrame({"x": ADVERSARIAL}))
    s = {r["x"]: r["s"] for r in df.groupBy("x").agg(dsum("x").alias("s")).collect()}
    con = duckdb.connect()
    for x in ADVERSARIAL:
        d = con.execute(f"SELECT {dsum_sql('x')} AS s FROM (SELECT {x!r}::DOUBLE AS x)").fetchone()[0]
        assert s[x] == d == _py_q(x), f"{x!r}: spark={s[x]!r} duck={d!r} py={_py_q(x)!r}"


@given(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False))
@settings(max_examples=300, deadline=None)
def test_duck_matches_python_model(x):
    con = duckdb.connect()
    d = con.execute(f"SELECT CAST({dec_sql('x')} AS DOUBLE) FROM (SELECT {x!r}::DOUBLE AS x)").fetchone()[0]
    assert d == pytest.approx(_py_q(x), abs=0) or d == _py_q(x)


def test_spark_batch_matches_python_model(spark):
    import numpy as np

    rs = np.random.RandomState(0)
    xs = np.concatenate(
        [
            rs.standard_normal(200) * 1000,
            # dyadic ladder: k/2^n values that often hit decimal midpoints
            np.array([k / 2**n for n in range(1, 20) for k in (1, 3, 5, 7)]),
        ]
    )
    df = spark.createDataFrame(pd.DataFrame({"i": range(len(xs)), "x": xs}))
    got = {r["i"]: r["s"] for r in df.groupBy("i", "x").agg(dsum("x").alias("s")).collect()}
    for i, x in enumerate(xs):
        assert got[i] == _py_q(float(x)), f"{x!r}: spark={got[i]!r} py={_py_q(float(x))!r}"
