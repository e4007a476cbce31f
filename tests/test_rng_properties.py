"""Property tests for the deterministic hash-counter RNG (SURVEY §2 F8):
the Python model, the Spark Column expression, and the DuckDB SQL mirror are
one spec — equal draw-for-draw on arbitrary keys."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.functions.rng import (
    A,
    M,
    rng_draw,
    rng_draw_sql,
)


def model_draw(keys, salt=0):
    acc = salt
    for k in keys:
        acc = (acc * 31 + (k % M)) % M
    acc ^= acc >> 16
    acc = (acc * A) % M
    acc ^= acc >> 13
    acc = (acc * A) % M
    acc ^= acc >> 16
    return acc % M


keys_st = st.tuples(
    st.integers(min_value=0, max_value=2**40), st.integers(min_value=0, max_value=2**40)
)


@given(keys=keys_st, salt=st.integers(min_value=0, max_value=1000))
@settings(max_examples=200, deadline=None)
def test_duckdb_mirror_matches_model(keys, salt):
    con = duckdb.connect()
    sql = rng_draw_sql(str(keys[0]), str(keys[1]), salt=salt)
    got = con.execute(f"SELECT {sql}").fetchone()[0]
    assert got == model_draw(keys, salt)


def test_spark_matches_model_batch(spark):
    import random

    random.seed(7)
    rows = [(random.randint(0, 2**40), random.randint(0, 2**40)) for _ in range(300)]
    df = spark.createDataFrame(rows, "k1 long, k2 long")
    got = {
        (r.k1, r.k2): r.d
        for r in df.withColumn("d", rng_draw(F.col("k1"), F.col("k2"), salt=13)).collect()
    }
    for k1, k2 in rows:
        assert got[(k1, k2)] == model_draw((k1, k2), 13)


def test_uniformity_of_low_bits(spark):
    # draws over a contiguous key grid should spread across quartiles
    rows = [(s, d) for s in range(50) for d in range(19000, 19100)]
    df = spark.createDataFrame(rows, "k1 long, k2 long")
    u = df.withColumn("u", rng_draw(F.col("k1"), F.col("k2"), salt=7) / F.lit(float(M)))
    q = u.agg(
        F.avg("u").alias("mean"),
        F.sum((F.col("u") < 0.25).cast("int")).alias("q1"),
        F.sum((F.col("u") >= 0.75).cast("int")).alias("q4"),
    ).collect()[0]
    n = len(rows)
    assert 0.45 < q.mean < 0.55
    assert 0.2 * n < q.q1 < 0.3 * n
    assert 0.2 * n < q.q4 < 0.3 * n
