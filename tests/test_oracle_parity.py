"""Oracle parity at sf0.001 for every registered query — the same comparison
the driver's correctness gate performs at sf0.01 (row count + columns +
order-insensitive values, floats bit-exact-or-1e-9)."""

from __future__ import annotations

import math

import pytest

import __spark_entry__ as entry_mod


from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.plans import (
    REGISTRY,
)

# Oracles are resolved lazily INSIDE the test (callable oracles train numpy
# mirror models — far too expensive to run at collection time).
_NAMES = list(entry_mod.queries())


@pytest.mark.parametrize("name", _NAMES, ids=_NAMES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    fn = REGISTRY[name].spark
    oracle = REGISTRY[name].oracle
    if callable(oracle):
        oracle = oracle()
    df = fn(spark, sf_dir)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]
    if oracle is None:
        assert len(spark_rows) >= 0  # rows-only contract: just has to run
        return
    res = duck.execute(oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows), f"{len(spark_rows)} vs {len(duck_rows)} rows"

    def norm(rows, cols):
        order = [cols.index(c) for c in sorted(cols)]
        out = []
        for r in rows:
            out.append(tuple(r[i] for i in order))
        return sorted(out, key=lambda r: tuple(str(c) for c in r))

    for i, (sr, dr) in enumerate(zip(norm(spark_rows, spark_cols), norm(duck_rows, duck_cols))):
        for a, b, c in zip(sr, dr, sorted(spark_cols)):
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                assert abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b)), f"{name} row {i} col {c}: {a} vs {b}"
            else:
                assert a == b, f"{name} row {i} col {c}: {a!r} vs {b!r}"


def test_holt_winters_matches_python_replica(spark, sf_dir):
    """The fixed-point HW fold is integer-exact: a direct Python replay of
    the recurrence over the same quantized series must agree bit-for-bit."""
    import math

    from pyspark.sql import functions as F

    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.forecast import (
        holt_winters_fixed_point,
    )
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.operators.timeseries import (
        hourly_series,
    )
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.sources.readers import (
        load_table,
    )

    hourly = hourly_series(load_table(spark, sf_dir, "events"))
    got = {
        r.series_id: (r.level_q, r.trend_q, r.forecast_q, r.n_points)
        for r in holt_winters_fixed_point(hourly, period=24).collect()
    }

    pts = (
        hourly.select("series_id", "ts", "value")
        .orderBy("series_id", "ts")
        .collect()
    )
    series: dict[str, list[float]] = {}
    for r in pts:
        series.setdefault(r.series_id, []).append(r.value)

    def fd(a, d):
        # pmod-reduced floor division (Python % is already nonneg for d > 0)
        return (a - (a % d)) // d

    m = 24
    expected = {}
    for sid, vals in series.items():
        if len(vals) <= m:
            continue
        qs = [math.floor(v * 1e6 + 0.5) for v in vals]
        l = fd(sum(qs[:m]), m)
        b = 0
        s = [v - l for v in qs[:m]]
        t = m
        for x in qs[m:]:
            slot = t % m
            sm = s[slot]
            l_new = fd(2 * (x - sm) + 8 * (l + b), 10)
            b_new = fd((l_new - l) + 9 * b, 10)
            s[slot] = fd(3 * (x - l_new) + 7 * sm, 10)
            l, b, t = l_new, b_new, t + 1
        expected[sid] = (l, b, l + b + s[t % m], len(vals))
    assert got == expected
