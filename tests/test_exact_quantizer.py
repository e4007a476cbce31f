"""The tie-free quantizer (functions/exact.py) must agree across Spark,
DuckDB, and the Python model on ALL doubles — including the adversarial
dyadic midpoints (e.g. 0.0078125 = 2⁻⁷ sits exactly on a 1e-6 decimal
midpoint) where a naive decimal cast diverges between engines
(Spark HALF_UP vs DuckDB half-even).

Round 12's hypothesis run falsified the *literal-embedding* leg of the
doctrine: the quantizer kernel is engine-exact, but DuckDB's bare-literal
parser is not correctly rounded — it reads ``-360288.51238950004`` one ulp
off (…d545 vs Python/Java's …d546), handing the kernel a different x. Every
float that crosses into SQL text therefore routes through ``lit_double()``,
which verifies each emitted literal parses back to identical bits in DuckDB
(and is correct-by-spec in Spark/Java). These tests pin the counterexample
and property-test both the kernel and the literal emitter.
"""

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
    lit_double,
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
    # r12 hypothesis counterexample: DuckDB's bare-literal parser reads this
    # repr one ulp off — the reason every oracle float literal now goes
    # through lit_double().
    -360288.51238950004,
]


def _py_q(x: float) -> float:
    """The Python model of the quantizer: floor(x·1e6 + 0.5) exact-int / 1e6."""
    return math.floor(x * 1e6 + 0.5) / 1e6


def test_adversarial_values_agree_spark_duck_python(spark):
    df = spark.createDataFrame(pd.DataFrame({"x": ADVERSARIAL}))
    s = {r["x"]: r["s"] for r in df.groupBy("x").agg(dsum("x").alias("s")).collect()}
    con = duckdb.connect()
    for x in ADVERSARIAL:
        d = con.execute(
            f"SELECT {dsum_sql('x')} AS s FROM (SELECT {lit_double(x)} AS x)"
        ).fetchone()[0]
        assert s[x] == d == _py_q(x), f"{x!r}: spark={s[x]!r} duck={d!r} py={_py_q(x)!r}"


def test_raw_repr_literal_is_unsafe_in_duckdb():
    """Documents WHY lit_double exists: the pinned value's repr, embedded
    bare, parses to the wrong neighbor in DuckDB but lit_double's emission
    does not. If DuckDB ever fixes its parser this still passes (the
    assertion is on lit_double, the repr check is informational)."""
    x = -360288.51238950004
    con = duckdb.connect()
    via_lit = con.execute(f"SELECT {lit_double(x)}").fetchone()[0]
    assert via_lit == x
    via_repr = con.execute(f"SELECT {x!r}::DOUBLE").fetchone()[0]
    if via_repr != x:  # the live bug, as of duckdb in this environment
        assert abs(via_repr - x) <= abs(x) * 1e-15  # one-ulp class, not garbage


@given(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False))
@settings(max_examples=1000, deadline=None)
def test_duck_matches_python_model(x):
    # input embedded via lit_double — {x!r} is NOT safe (see ADVERSARIAL):
    # the quantizer kernel is engine-exact, but DuckDB's literal parser can
    # hand it a one-ulp-different x.
    con = duckdb.connect()
    d = con.execute(
        f"SELECT CAST({dec_sql('x')} AS DOUBLE) FROM (SELECT {lit_double(x)} AS x)"
    ).fetchone()[0]
    assert d == pytest.approx(_py_q(x), abs=0) or d == _py_q(x)


@given(st.floats(allow_nan=False, allow_infinity=False))
@settings(max_examples=1000, deadline=None)
def test_lit_double_bit_exact_in_duckdb(x):
    con = duckdb.connect()
    got = con.execute(f"SELECT {lit_double(x)}").fetchone()[0]
    assert got == x


def test_lit_double_pinned_and_extremes_both_engines(spark):
    """The r12 counterexample plus denormals / max-magnitude doubles
    round-trip bit-exactly through BOTH engines' parse of the emitted
    text (one Spark job for all values)."""
    vals = [
        -360288.51238950004,
        5e-324,
        -5e-324,
        1.7976931348623157e308,
        -1.7976931348623157e308,
        2.2250738585072014e-308,
        0.1,
        -0.0,
        0.0078125,
        123456789.12345679,
    ]
    con = duckdb.connect()
    for x in vals:
        lit = lit_double(x)
        assert con.execute(f"SELECT {lit}").fetchone()[0] == x, lit
    got = spark.sql(
        "SELECT " + ", ".join(f"{lit_double(x)} AS c{i}" for i, x in enumerate(vals))
    ).collect()[0]
    for i, x in enumerate(vals):
        assert got[f"c{i}"] == x, (x, lit_double(x), got[f"c{i}"])


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
