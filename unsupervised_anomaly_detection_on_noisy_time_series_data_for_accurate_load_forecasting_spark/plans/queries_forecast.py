"""Forecasting + feature query specs (SURVEY.md §2: M22, A12, W3, A3, A11)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import davg_sql, dec_sql, dsum_sql, lit_double, qround_sql
from ..operators import anomaly as AN
from ..operators import forecast as FC
from ..operators import timeseries as TSO
from ..sources.readers import load_table
from .queries_timeseries import FILLED_CTE, HOURLY_CTE
from .registry import register


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@register(
    "m22_forecast_windows",
    oracle=f"""
    WITH {HOURLY_CTE},
    w AS (
      SELECT series_id, value,
             TIMESTAMP '1970-01-01 00:00:00'
               + ((CAST(epoch(ts) AS BIGINT) // 172800) * 172800) * INTERVAL 1 SECOND
               AS window_start,
             CAST((CAST(epoch(ts) AS BIGINT) % 172800) // 3600 AS INTEGER) AS h_off
      FROM hourly
    )
    SELECT series_id, window_start, count(*) AS n_points,
           {dsum_sql('CASE WHEN h_off < 24 THEN value END')} AS sum_input,
           {dsum_sql('CASE WHEN h_off >= 24 THEN value END')} AS sum_target
    FROM w GROUP BY 1, 2
    """,
    tags=("M22", "W1"),
    doc="Tumbling 48 h forecast windows with input/target split at hour 24.",
)
def m22_forecast_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = TSO.hourly_series(_events(spark, sf_dir))
    return FC.forecast_windows(hourly, n_in=24, n_out=24)


@register(
    "a12_seasonal_naive_metrics",
    oracle=f"""
    WITH {FILLED_CTE},
    t AS (
      SELECT series_id, ts, value, lag(value, 168) OVER w AS f,
             row_number() OVER w AS rn,
             count(*) OVER (PARTITION BY series_id) AS cnt
      FROM filled WINDOW w AS (PARTITION BY series_id ORDER BY ts)
    ),
    u AS (SELECT * FROM t WHERE rn > floor(0.8 * cnt / 24) * 24 AND f IS NOT NULL)
    SELECT series_id, count(*) AS n_eval,
           {dsum_sql('abs(f - value)')} / CAST(count(*) AS DOUBLE) AS mae,
           {dsum_sql('(f - value) * (f - value)')} / CAST(count(*) AS DOUBLE) AS mse,
           sqrt({dsum_sql('(f - value) * (f - value)')} / CAST(count(*) AS DOUBLE)) AS rmse,
           {dsum_sql("CASE WHEN abs(f) + abs(value) > 0 THEN 2.0 * abs(f - value) / (abs(f) + abs(value)) ELSE 0.0 END")}
             / CAST(count(*) AS DOUBLE) AS smape,
           1.0 - ({dsum_sql('(f - value) * (f - value)')}
                  / NULLIF({dsum_sql('value * value')}
                           - {dsum_sql('value')} * {dsum_sql('value')} / CAST(count(*) AS DOUBLE), 0.0)) AS r2
    FROM u GROUP BY series_id
    """,
    tags=("A12", "M20", "M22", "W2"),
    doc="Full regression metric suite (MAE/MSE/RMSE/sMAPE/R²) for the seasonal-naive forecaster on the test split.",
)
def a12_seasonal_naive_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    series = AN.prepared_series(_events(spark, sf_dir))
    return FC.seasonal_naive_metrics(series, lag_hours=168, ratio=0.8)


@register(
    "w3_ewma",
    oracle=f"""
    WITH {HOURLY_CTE},
    arr AS (SELECT series_id, list(value ORDER BY ts) AS vals FROM hourly GROUP BY 1),
    q AS (
      SELECT series_id,
             list_transform(vals, v -> CAST(round(v * 1000000) AS BIGINT)) AS qs,
             len(vals) AS n
      FROM arr
    )
    SELECT series_id,
           list_reduce(qs, (acc, x) -> (2 * x + 8 * acc) // 10) AS ewma_q,
           CAST(list_reduce(qs, (acc, x) -> (2 * x + 8 * acc) // 10) AS DOUBLE) / 1000000.0 AS ewma,
           CAST(n AS INTEGER) AS n_points
    FROM q
    """,
    tags=("W3", "M7"),
    doc="Fixed-point EWMA fold (α=0.2 on a 1e-6 lattice) — bit-exact recurrence.",
)
def w3_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = TSO.hourly_series(_events(spark, sf_dir))
    return FC.ewma_fixed_point(hourly)


@register(
    "a3_patch_std",
    oracle=f"""
    WITH {HOURLY_CTE}
    SELECT series_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(floor(extract(hour FROM ts) / 8) AS INTEGER) AS patch_idx,
           count(*) AS n_points,
           sqrt(greatest(({dsum_sql('value * value')} - {dsum_sql('value')} * {dsum_sql('value')}
                 / CAST(count(value) AS DOUBLE)) / CAST(count(value) AS DOUBLE), 0.0)) AS patch_std
    FROM hourly GROUP BY 1, 2, 3
    """,
    tags=("A3", "M7"),
    doc="Population std per non-overlapping 8-hour patch (channel feature).",
)
def a3_patch_std(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = TSO.hourly_series(_events(spark, sf_dir))
    return FC.patch_std(hourly, patch_size=8)


@register(
    "a11_auroc",
    oracle="""
    WITH t AS (
      SELECT value AS score, CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS label
      FROM events
    ),
    r AS (
      SELECT *, rank() OVER (ORDER BY score) AS rk,
             count(*) OVER (PARTITION BY score) AS c
      FROM t
    ),
    m AS (SELECT *, rk + (c - 1) / 2.0 AS midrank FROM r)
    SELECT (sum(CASE WHEN label = 1 THEN midrank ELSE 0.0 END)
            - CAST(sum(label) AS DOUBLE) * (CAST(sum(label) AS DOUBLE) + 1) / 2)
           / (CAST(sum(label) AS DOUBLE) * CAST(sum(1 - label) AS DOUBLE)) AS auroc,
           CAST(sum(label) AS BIGINT) AS n_pos,
           CAST(sum(1 - label) AS BIGINT) AS n_neg
    FROM m
    """,
    tags=("A11", "M24"),
    doc="Exact tie-corrected AUROC via Mann-Whitney midranks.",
)
def a11_auroc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    scored = ev.select(
        F.col("value").alias("score"),
        (F.col("event_type") == "error").cast("int").alias("label"),
    )
    return FC.auroc(scored, "score", "label")



def _hw_duck_fd(e: str, d: int) -> str:
    return f"((({e}) - ((({e}) % {d} + {d}) % {d})) // {d})"


def _hw_oracle() -> str:
    """Recursive-CTE replay of the fixed-point Holt-Winters recurrence (same
    pattern as the packing oracle: DuckDB steps the fold itself, one row per
    (series, step), so the triple smoothing is hash-verified end to end)."""
    m = 24
    fd = _hw_duck_fd
    l0 = fd(f"CAST(list_sum(qs[1:{m}]) AS BIGINT)", m)
    sm = f"s[(t % {m}) + 1]"
    x = "qs[t + 1]"
    l_new = fd(f"2 * ({x} - {sm}) + 8 * (l + b)", 10)
    b_new = fd(f"({l_new}) - l + 9 * b", 10)
    s_new = fd(f"3 * ({x} - ({l_new})) + 7 * {sm}", 10)
    return f"""
    WITH RECURSIVE {{HOURLY}},
    arr AS (
      SELECT series_id,
             list(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) ORDER BY ts) AS qs
      FROM hourly GROUP BY 1
    ),
    base AS (SELECT series_id, qs, len(qs) AS n FROM arr WHERE len(qs) > {m}),
    step AS (
      SELECT series_id, qs, n,
             {l0} AS l, CAST(0 AS BIGINT) AS b,
             list_transform(qs[1:{m}], v -> v - ({l0})) AS s,
             {m} AS t
      FROM base
      UNION ALL
      SELECT series_id, qs, n,
             {l_new}, {b_new},
             list_transform(s, (v, i) -> CASE WHEN i = (t % {m}) + 1
                                              THEN {s_new} ELSE v END),
             t + 1
      FROM step WHERE t < n
    )
    SELECT series_id, l AS level_q, b AS trend_q,
           l + b + s[(t % {m}) + 1] AS forecast_q,
           CAST(l AS DOUBLE) / 1000000.0 AS level,
           CAST(l + b + s[(t % {m}) + 1] AS DOUBLE) / 1000000.0 AS forecast,
           CAST(n AS BIGINT) AS n_points
    FROM step WHERE t = n
    """.replace("{HOURLY}", HOURLY_CTE)


@register(
    "w_holt_winters",
    oracle=_hw_oracle,
    tags=("W3", "M20", "M22"),
    doc="Additive Holt-Winters (level/trend/seasonal, period 24) on the "
    "1e-6 fixed-point lattice: every smoothing step an exact rational "
    "update with pmod-reduced floor division, bit-exact in any engine. "
    "One aggregate-HOF fold per series (per-series parallel); the oracle "
    "replays the recurrence with a recursive CTE.",
)
def w_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = TSO.hourly_series(_events(spark, sf_dir))
    return FC.holt_winters_fixed_point(hourly, period=24)


def _ets_oracle() -> str:
    """Recursive-CTE replay of the damped-trend ETS recurrence (the
    Holt-Winters oracle pattern minus the seasonal list state)."""
    fd = _hw_duck_fd
    x = "qs[t + 1]"
    pb = fd("9 * b", 10)
    l_new = fd(f"2 * ({x}) + 8 * (l + ({pb}))", 10)
    b_new = fd(f"(({l_new}) - l) + 9 * ({pb})", 10)
    return f"""
    WITH RECURSIVE {{HOURLY}},
    arr AS (
      SELECT series_id,
             list(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) ORDER BY ts) AS qs
      FROM hourly GROUP BY 1
    ),
    base AS (SELECT series_id, qs, len(qs) AS n FROM arr WHERE len(qs) > 2),
    step AS (
      SELECT series_id, qs, n, qs[2] AS l, qs[2] - qs[1] AS b, 2 AS t
      FROM base
      UNION ALL
      SELECT series_id, qs, n, {l_new}, {b_new}, t + 1
      FROM step WHERE t < n
    )
    SELECT series_id, l AS level_q, b AS trend_q,
           l + ({pb}) AS forecast1_q,
           l + 9 * b AS forecast_inf_q,
           CAST(l AS DOUBLE) / 1000000.0 AS level,
           CAST(l + ({pb}) AS DOUBLE) / 1000000.0 AS forecast1,
           CAST(n AS BIGINT) AS n_points
    FROM step WHERE t = n
    """.replace("{HOURLY}", HOURLY_CTE)


@register(
    "w_ets_damped",
    oracle=_ets_oracle,
    tags=("W3", "M20", "A12"),
    doc="Damped-trend exponential smoothing ETS(A,Ad,N), φ=0.9 α=0.2 β=0.1 "
    "on the 1e-6 fixed-point lattice — the forecaster practitioners reach "
    "for first on load data when a transient ramp must not extrapolate "
    "linearly (next to w_holt_winters, which carries the seasonal state "
    "instead). Every smoothing step is an exact rational update with "
    "pmod-reduced floor division, so the fold is bit-exact in any engine; "
    "the damped asymptote uses φ/(1−φ) = 9 exactly (integer, no float "
    "pow). One aggregate-HOF fold per series; oracle replays the "
    "recurrence with a recursive CTE.",
)
def w_ets_damped(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = TSO.hourly_series(_events(spark, sf_dir))
    return FC.ets_damped_fixed_point(hourly)



def _cusum_oracle() -> str:
    """Recursive-CTE replay of the integer CUSUM fold (same discipline as
    the Holt-Winters oracle)."""
    fd = _hw_duck_fd
    mean_q = fd("CAST(list_sum(qs) AS BIGINT)", "len(qs)")
    return f"""
    WITH RECURSIVE {{HOURLY}},
    arr AS (
      SELECT series_id,
             list(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) ORDER BY ts) AS qs
      FROM hourly GROUP BY 1
    ),
    base AS (
      SELECT series_id, qs, len(qs) AS n,
             {mean_q} AS mean_q,
             (500 * greatest(abs({mean_q}), 1000)) // 1000 AS kq,
             4 * greatest(abs({mean_q}), 1000) AS hq
      FROM arr WHERE len(qs) > 1
    ),
    step AS (
      SELECT series_id, n, qs, mean_q, kq, hq, 0 AS t,
             CAST(0 AS BIGINT) AS sp, CAST(0 AS BIGINT) AS sn,
             CAST(0 AS BIGINT) AS ap, CAST(0 AS BIGINT) AS an
      FROM base
      UNION ALL
      SELECT series_id, n, qs, mean_q, kq, hq, t + 1,
             greatest(CAST(0 AS BIGINT), sp + (qs[t + 1] - mean_q) - kq),
             greatest(CAST(0 AS BIGINT), sn - (qs[t + 1] - mean_q) - kq),
             ap + CASE WHEN greatest(CAST(0 AS BIGINT), sp + (qs[t + 1] - mean_q) - kq) > hq THEN 1 ELSE 0 END,
             an + CASE WHEN greatest(CAST(0 AS BIGINT), sn - (qs[t + 1] - mean_q) - kq) > hq THEN 1 ELSE 0 END
      FROM step WHERE t < n
    )
    SELECT series_id, sp AS cusum_pos_q, sn AS cusum_neg_q,
           ap AS n_pos_alarms, an AS n_neg_alarms, CAST(n AS BIGINT) AS n_points
    FROM step WHERE t = n
    """.replace("{HOURLY}", HOURLY_CTE)


@register(
    "w_cusum_flags",
    oracle=_cusum_oracle,
    tags=("W6", "M14"),
    doc="One-sided CUSUM drift detection per series on the 1e-6 lattice: "
    "integer-exact sequential fold (allowance and threshold scaled by the "
    "series' exact integer mean), alarm counts both directions. Same "
    "aggregate-HOF shape as the EWMA/Holt-Winters recurrences; oracle "
    "replays via recursive CTE.",
)
def w_cusum_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = TSO.hourly_series(_events(spark, sf_dir))
    return FC.cusum_flags_fixed_point(hourly)


@register(
    "a_lag_autocorr",
    oracle=f"""
    WITH {HOURLY_CTE},
    p AS (
      SELECT series_id, value AS x, lag(value, 24) OVER w AS y
      FROM hourly WINDOW w AS (PARTITION BY series_id ORDER BY ts)
    ),
    u AS (SELECT * FROM p WHERE y IS NOT NULL)
    SELECT series_id, count(*) AS n_pairs,
           ({dsum_sql('x * y')} - {dsum_sql('x')} * {dsum_sql('y')} / CAST(count(*) AS DOUBLE))
           / NULLIF(sqrt(greatest({dsum_sql('x * x')} - {dsum_sql('x')} * {dsum_sql('x')} / CAST(count(*) AS DOUBLE), 0.0))
                    * sqrt(greatest({dsum_sql('y * y')} - {dsum_sql('y')} * {dsum_sql('y')} / CAST(count(*) AS DOUBLE), 0.0)), 0.0)
             AS acf24
    FROM u GROUP BY series_id
    """,
    tags=("A12", "W2", "A3"),
    doc="Daily-seasonality strength: Pearson autocorrelation at lag 24h per "
    "series from decimal-exact moments (one lag window + one agg — the "
    "diagnostic a forecasting pipeline runs before choosing seasonal "
    "models).",
)
def a_lag_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.exact import dsum

    hourly = TSO.hourly_series(_events(spark, sf_dir))
    ow = W.partitionBy("series_id").orderBy("ts")
    p = hourly.select(
        "series_id",
        F.col("value").alias("x"),
        F.lag("value", 24).over(ow).alias("y"),
    ).filter(F.col("y").isNotNull())
    n = F.count(F.lit(1)).cast("double")
    sx, sy = dsum("x"), dsum("y")
    sxx, syy, sxy = dsum(F.col("x") * F.col("x")), dsum(F.col("y") * F.col("y")), dsum(
        F.col("x") * F.col("y")
    )
    cov = sxy - sx * sy / n
    vx = F.sqrt(F.greatest(sxx - sx * sx / n, F.lit(0.0)))
    vy = F.sqrt(F.greatest(syy - sy * sy / n, F.lit(0.0)))
    return p.groupBy("series_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.try_divide(cov, F.nullif(vx * vy, F.lit(0.0))).alias("acf24"),
    )


@register(
    "f_funnel_conversion",
    oracle="""
    WITH f AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT
      count(*) AS n_users,
      CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
      CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
      CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view AND t_purchase > t_click
               THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
    FROM f
    """,
    tags=("A10", "U5"),
    doc="Ordered funnel (view -> click -> purchase): first-touch timestamps "
    "per stage via conditional min — ONE aggregation, no joins, no window "
    "over event history; the funnel ordering is pure column comparison "
    "(NULL-safe: a missing stage fails the > test).",
)
def f_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    f = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    has_view = F.col("t_view").isNotNull()
    vc = has_view & (F.col("t_click") > F.col("t_view"))
    full = vc & (F.col("t_purchase") > F.col("t_click"))
    return f.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(has_view.cast("int")).cast("bigint").alias("n_view"),
        F.sum(vc.cast("int")).cast("bigint").alias("n_view_click"),
        F.sum(full.cast("int")).cast("bigint").alias("n_full_funnel"),
    )


_FDIV_TSUM = "((tsum - ((tsum % tn + tn) % tn)) // tn)"
_FDIV_SSUM = "((ssum - ((ssum % sn + sn) % sn)) // sn)"


@register(
    "w_seasonal_decompose",
    oracle=f"""
    WITH {HOURLY_CTE},
    qd AS (
      SELECT series_id, ts, CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS q
      FROM hourly
    ),
    t AS (
      SELECT series_id, ts, q,
             sum(q) OVER w AS tsum, count(q) OVER w AS tn
      FROM qd
      WINDOW w AS (PARTITION BY series_id ORDER BY ts
                   ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
    ),
    de AS (
      SELECT series_id, CAST(extract(hour FROM ts) AS INTEGER) AS hod,
             q - {_FDIV_TSUM} AS detr
      FROM t WHERE tn = 25
    ),
    s AS (
      SELECT series_id, hod, detr,
             sum(detr) OVER (PARTITION BY series_id, hod) AS ssum,
             count(*) OVER (PARTITION BY series_id, hod) AS sn
      FROM de
    ),
    r AS (SELECT series_id, hod, sn, {_FDIV_SSUM} AS seas_q,
                 abs(detr - {_FDIV_SSUM}) AS resid_abs
          FROM s)
    SELECT series_id, hod,
           CAST(count(*) AS BIGINT) AS n_hours,
           CAST(max(seas_q) AS DOUBLE) / 1000000.0 AS seasonal,
           CAST((sum(resid_abs) - ((sum(resid_abs) % count(*) + count(*)) % count(*)))
                // count(*) AS DOUBLE) / 1000000.0 AS resid_abs_mean
    FROM r GROUP BY 1, 2
    """,
    tags=("M7", "W3", "A3"),
    doc="Additive seasonal decomposition (STL-lite) per series on the 1e-6 "
    "integer lattice: trend = centered 25-row moving average, seasonal = "
    "per hour-of-day mean of the detrended values, residual quality as "
    "mean |resid| - the load-forecasting EDA primitive behind hour-of-day "
    "feature engineering. Every divide is a negatives-safe exact floor "
    "division, so the whole decomposition is integer arithmetic - "
    "bit-exact across engines and partitionings; edge rows with clipped "
    "windows are excluded from the fit (standard treatment). One rows-"
    "frame window scan + one reused (series, hod) exchange; no collect, "
    "no UDF.",
)
def w_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = TSO.hourly_series(_events(spark, sf_dir))
    return FC.seasonal_decompose(hourly)


@register(
    "w_rolling_median",
    oracle=f"""
    WITH {HOURLY_CTE},
    qd AS (
      SELECT series_id, ts, CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS q
      FROM hourly
    ),
    m AS (
      SELECT series_id, list(q) OVER w AS arr
      FROM qd
      WINDOW w AS (PARTITION BY series_id ORDER BY ts
                   ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
    ),
    f AS (SELECT series_id, list_sort(arr)[13] AS med FROM m WHERE len(arr) = 25)
    SELECT series_id,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(sum(med) AS BIGINT) AS med_sum_q,
           CAST(min(med) AS DOUBLE) / 1000000.0 AS med_min,
           CAST(max(med) AS DOUBLE) / 1000000.0 AS med_max
    FROM f GROUP BY 1
    """,
    tags=("W4", "M7", "P4"),
    doc="Centered 25-row rolling-median filter per series - the robust "
    "denoiser for noisy load series (a median filter rejects injected "
    "point anomalies where a moving average smears them): exact median "
    "of each full window on the 1e-6 integer lattice (odd window, the "
    "median IS an element - no midpoint float). One window scan, sliding "
    "state bounded by the window width; the compact output (count, exact "
    "integer sum of all medians, min/max) is sensitive to every single "
    "median value.",
)
def w_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = TSO.hourly_series(_events(spark, sf_dir))
    return FC.rolling_median(hourly)


_BT_CUTS = ["2024-01-15 00:00:00", "2024-01-20 00:00:00", "2024-01-25 00:00:00"]


@register(
    "a_backtest_rolling",
    oracle=f"""
    WITH {FILLED_CTE},
    lagged AS (
      SELECT series_id, ts, value,
             lag(value, 168) OVER (PARTITION BY series_id ORDER BY ts) AS f
      FROM filled
    ),
    cuts(cutoff) AS (VALUES {", ".join(f"(TIMESTAMP '{c}')" for c in _BT_CUTS)}),
    j AS (
      SELECT cutoff, f, value FROM lagged CROSS JOIN cuts
      WHERE f IS NOT NULL AND ts > cutoff AND ts <= cutoff + INTERVAL 24 HOUR
    )
    SELECT cutoff, CAST(count(*) AS BIGINT) AS n_eval,
           {dsum_sql('abs(f - value)')} / CAST(count(*) AS DOUBLE) AS mae,
           sqrt({dsum_sql('(f - value) * (f - value)')} / CAST(count(*) AS DOUBLE)) AS rmse
    FROM j GROUP BY cutoff
    """,
    tags=("A12", "M22", "W2"),
    doc="Rolling-origin backtest (three origins, 24 h horizon, pooled "
    "across series) of the seasonal-naive forecaster - the leakage-safe "
    "evaluation protocol: each origin scores only the day after itself "
    "and the week-lag predictor only sees pre-origin data. One per-series "
    "lag window on the skinny regular series, broadcast cutoff dim, "
    "combinable decimal-exact metric rollup.",
)
def a_backtest_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    series = AN.prepared_series(_events(spark, sf_dir))
    return FC.rolling_backtest(series, _BT_CUTS)


@register(
    "a_seasonal_strength",
    oracle=f"""
    WITH {HOURLY_CTE},
    qd AS (
      SELECT series_id, ts, CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS q
      FROM hourly
    ),
    t AS (
      SELECT series_id, ts, q,
             sum(q) OVER w AS tsum, count(q) OVER w AS tn
      FROM qd
      WINDOW w AS (PARTITION BY series_id ORDER BY ts
                   ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
    ),
    de AS (
      SELECT series_id, CAST(extract(hour FROM ts) AS INTEGER) AS hod,
             q - {_FDIV_TSUM} AS detr
      FROM t WHERE tn = 25
    ),
    s AS (
      SELECT series_id, detr,
             sum(detr) OVER (PARTITION BY series_id, hod) AS ssum,
             count(*) OVER (PARTITION BY series_id, hod) AS sn
      FROM de
    ),
    r AS (
      SELECT series_id,
             CAST(detr AS DOUBLE) / 1000000.0 AS detr_d,
             CAST(detr - {_FDIV_SSUM} AS DOUBLE) / 1000000.0 AS resid_d
      FROM s
    ),
    agg AS (
      SELECT series_id, CAST(count(*) AS BIGINT) AS n_points,
             {dsum_sql('detr_d * detr_d')} AS dss,
             {dsum_sql('resid_d * resid_d')} AS rss
      FROM r GROUP BY 1
    )
    SELECT series_id, n_points,
           floor(coalesce(greatest(0.0, 1.0 - rss / nullif(dss, 0.0)), 0.0)
                 * 1000000000.0 + 0.5) / 1000000000.0 AS strength
    FROM agg
    """,
    tags=("M7", "A3", "A12"),
    doc="Seasonality-strength diagnostic per series (Hyndman's FS: "
    "max(0, 1 - Var_resid/Var_detrended) on the decomposition "
    "components) - the ranking that decides which series deserve "
    "hour-of-day features. Components come off the shared integer-"
    "lattice decomposition; squares route through the decimal-exact sum; "
    "the ratio is pure IEEE arithmetic.",
)
def a_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = TSO.hourly_series(_events(spark, sf_dir))
    return FC.seasonal_strength(hourly)


@register(
    "w_changepoint",
    oracle=f"""
    WITH {HOURLY_CTE},
    q AS (
      SELECT series_id, ts,
             CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS qv,
             row_number() OVER (PARTITION BY series_id ORDER BY ts) AS t
      FROM hourly
    ),
    pre AS (
      SELECT series_id, ts, t,
             sum(qv) OVER (PARTITION BY series_id ORDER BY t
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS st
      FROM q
    ),
    tot AS (SELECT series_id, max(t) AS n, sum(qv) AS sn FROM q GROUP BY 1),
    g AS (
      SELECT p.series_id, p.ts, p.t, tot.n, tot.sn, p.st,
             CAST(tot.n * p.st - p.t * tot.sn AS DOUBLE)
               * CAST(tot.n * p.st - p.t * tot.sn AS DOUBLE)
               / CAST(p.t * (tot.n - p.t) AS DOUBLE) AS gs
      FROM pre p JOIN tot ON p.series_id = tot.series_id
      WHERE p.t < tot.n
    ),
    best AS (
      SELECT *, row_number() OVER (PARTITION BY series_id ORDER BY gs DESC, t ASC) AS rn
      FROM g
    )
    SELECT series_id, ts AS cp_ts, CAST(t AS BIGINT) AS cp_t, CAST(n AS BIGINT) AS n,
           {qround_sql('CAST(st AS DOUBLE) / (CAST(t AS DOUBLE) * 1000000.0)', 6)} AS mean_left,
           {qround_sql('CAST(sn - st AS DOUBLE) / (CAST(n - t AS DOUBLE) * 1000000.0)', 6)} AS mean_right,
           {qround_sql('gs / (CAST(n AS DOUBLE) * 1e12)', 6)} AS stat
    FROM best WHERE rn = 1
    """,
    tags=("W6", "A4", "M14"),
    doc="Single-changepoint detection per series (the binary-segmentation "
    "kernel): the split t maximizing the scaled between-mean contrast "
    "(n*S_t - t*S_n)^2 / (t(n-t)) over 1e-6-lattice prefix sums - exact "
    "integer inner term, so the argmax (ties to smallest t) is cross-"
    "engine deterministic; the reported statistic t(n-t)/n * (mean_L - "
    "mean_R)^2 is one IEEE normalization of the exact term. One per-series "
    "prefix window + one totals join + one per-series rank window - no "
    "per-split recomputation, O(n) per series.",
)
def w_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = TSO.hourly_series(_events(spark, sf_dir))
    return changepoint_stats(hourly)


def changepoint_stats(hourly: DataFrame) -> DataFrame:
    """Core of w_changepoint over any (series_id, ts, value) frame —
    factored so the negative-value regression test can drive it with a
    synthetic series (the DuckDB oracle mirrors the same formula, so the
    sweep alone can't distinguish sum(qv) from max(st))."""
    from pyspark.sql import Window as W

    from ..functions.exact import qround

    ow = W.partitionBy("series_id").orderBy("ts")
    q = hourly.select(
        "series_id",
        "ts",
        F.expr("CAST(floor(value * 1000000.0D + 0.5D) AS BIGINT)").alias("qv"),
        F.row_number().over(ow).alias("t"),
    )
    pre = q.withColumn(
        "st",
        F.sum("qv").over(
            W.partitionBy("series_id").orderBy("t").rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    # S_n must be sum(qv), NOT max(st): the running prefix only peaks at
    # the final row when every quantized value is non-negative, and noisy
    # or anomaly-injected load series can dip below zero
    tot = pre.groupBy("series_id").agg(F.max("t").alias("n"), F.sum("qv").alias("sn"))
    d = (F.col("n") * F.col("st") - F.col("t") * F.col("sn")).cast("double")
    g = (
        pre.join(tot.hint("shuffle_hash"), "series_id")
        .filter(F.col("t") < F.col("n"))
        .withColumn("gs", d * d / (F.col("t") * (F.col("n") - F.col("t"))).cast("double"))
    )
    rw = W.partitionBy("series_id").orderBy(F.col("gs").desc(), F.col("t").asc())
    return (
        g.withColumn("rn", F.row_number().over(rw))
        .filter(F.col("rn") == 1)
        .select(
            "series_id",
            F.col("ts").alias("cp_ts"),
            F.col("t").cast("bigint").alias("cp_t"),
            F.col("n").cast("bigint").alias("n"),
            qround(F.col("st").cast("double") / (F.col("t").cast("double") * 1e6), 6).alias("mean_left"),
            qround(
                (F.col("sn") - F.col("st")).cast("double")
                / ((F.col("n") - F.col("t")).cast("double") * 1e6),
                6,
            ).alias("mean_right"),
            qround(F.col("gs") / (F.col("n").cast("double") * 1e12), 6).alias("stat"),
        )
    )


@register(
    "w_load_duration_curve",
    oracle=f"""
    WITH {HOURLY_CTE},
    r AS (
      SELECT series_id, value,
             row_number() OVER (PARTITION BY series_id ORDER BY value DESC, ts ASC) AS rn,
             count(*) OVER (PARTITION BY series_id) AS n
      FROM hourly
    )
    SELECT series_id, CAST(max(n) AS BIGINT) AS n_hours,
           max(CASE WHEN rn = 1 THEN value END) AS peak,
           max(CASE WHEN rn = (n - 1) // 10 + 1 THEN value END) AS v10,
           max(CASE WHEN rn = (n - 1) // 2 + 1 THEN value END) AS v50,
           max(CASE WHEN rn = (9 * (n - 1)) // 10 + 1 THEN value END) AS v90,
           {qround_sql(f"{davg_sql('value')} / max(CASE WHEN rn = 1 THEN value END)", 9)} AS load_factor
    FROM r GROUP BY series_id
    """,
    tags=("A1", "A6", "O1"),
    doc="Load-duration curve per series - THE classic power-industry view "
    "of a load signal (the reference's own domain): demand sorted "
    "descending against duration, read at the 10/50/90% duration points, "
    "plus the peak and the load factor (mean/peak - the capacity-"
    "utilization number a utility quotes). Duration points are MEMBER "
    "selections at integer `div` positions (no interpolation, so the "
    "values are exact doubles in both engines); the sort window partitions "
    "by series, never globally; load factor = decimal-exact mean over one "
    "IEEE divide by the peak.",
)
def w_load_duration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.exact import davg, qround

    hourly = TSO.hourly_series(_events(spark, sf_dir))
    w = W.partitionBy("series_id").orderBy(F.col("value").desc(), F.col("ts").asc())
    cw = W.partitionBy("series_id")
    r = hourly.select(
        "series_id",
        "value",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.count(F.lit(1)).over(cw).cast("bigint").alias("n"),
    )
    # integer `div` positions — float division then cast diverges at exact
    # integer quotients (the (n+1)/2 median pitfall)
    p10 = F.expr("(n - 1) div 10") + 1
    p50 = F.expr("(n - 1) div 2") + 1
    p90 = F.expr("(9 * (n - 1)) div 10") + 1
    return (
        r.withColumn("_p10", p10)
        .withColumn("_p50", p50)
        .withColumn("_p90", p90)
        .groupBy("series_id")
        .agg(
            F.max("n").cast("bigint").alias("n_hours"),
            F.max(F.when(F.col("rn") == 1, F.col("value"))).alias("peak"),
            F.max(F.when(F.col("rn") == F.col("_p10"), F.col("value"))).alias("v10"),
            F.max(F.when(F.col("rn") == F.col("_p50"), F.col("value"))).alias("v50"),
            F.max(F.when(F.col("rn") == F.col("_p90"), F.col("value"))).alias("v90"),
            qround(
                davg("value") / F.max(F.when(F.col("rn") == 1, F.col("value"))), 9
            ).alias("load_factor"),
        )
    )


@register(
    "w_peak_coincidence",
    oracle=f"""
    WITH {HOURLY_CTE},
    sys AS (
      SELECT ts, {dsum_sql('value')} AS sys_load FROM hourly GROUP BY 1
    ),
    pk AS (SELECT ts AS peak_ts FROM sys ORDER BY sys_load DESC, ts ASC LIMIT 1)
    SELECT h.series_id,
           max(h.value) AS own_peak,
           max(CASE WHEN h.ts = pk.peak_ts THEN h.value END) AS at_system_peak,
           {qround_sql("max(CASE WHEN h.ts = pk.peak_ts THEN h.value END) / max(h.value)", 9)} AS coincidence
    FROM hourly h, pk
    GROUP BY 1
    HAVING max(CASE WHEN h.ts = pk.peak_ts THEN h.value END) IS NOT NULL
    """,
    tags=("A1", "A5", "J1"),
    doc="Peak-coincidence factor per series (the power-industry companion "
    "to the load-duration curve): the system peak hour is the argmax of "
    "the decimal-exact summed load (ties to the earliest hour, a "
    "TakeOrdered-1), and each series reports its demand at that hour over "
    "its own peak - the number that says whether a customer drives system "
    "peak. One combinable system aggregate + a broadcast 1-row peak hour + "
    "one per-series aggregate; series without a reading at the peak hour "
    "are excluded (no imputation inside a measurement query).",
)
def w_peak_coincidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.exact import dsum, qround

    hourly = TSO.hourly_series(_events(spark, sf_dir))
    sys = hourly.groupBy("ts").agg(dsum("value").alias("sys_load"))
    pk = (
        sys.orderBy(F.col("sys_load").desc(), F.col("ts").asc())
        .limit(1)
        .select(F.col("ts").alias("peak_ts"))
    )
    at_pk = F.max(F.when(F.col("ts") == F.col("peak_ts"), F.col("value")))
    return (
        hourly.crossJoin(F.broadcast(pk))
        .groupBy("series_id")
        .agg(
            F.max("value").alias("own_peak"),
            at_pk.alias("at_system_peak"),
            qround(at_pk / F.max("value"), 9).alias("coincidence"),
        )
        .filter(F.col("at_system_peak").isNotNull())
    )


@register(
    "a_pinball_loss",
    oracle=f"""
    WITH {FILLED_CTE},
    p AS (
      SELECT series_id, value AS y, lag(value, 168) OVER w AS yhat
      FROM filled WINDOW w AS (PARTITION BY series_id ORDER BY ts)
    ),
    u AS (SELECT * FROM p WHERE yhat IS NOT NULL),
    t AS (
      SELECT series_id, tau,
             {qround_sql("CASE WHEN y >= yhat THEN tau * (y - yhat) ELSE (1.0 - tau) * (yhat - y) END", 9)} AS pl
      FROM u, (SELECT unnest(CAST([0.1, 0.5, 0.9] AS DOUBLE[])) AS tau)
    )
    SELECT series_id, tau, CAST(count(*) AS BIGINT) AS n,
           {qround_sql(f"{dsum_sql('pl')} / count(*)", 9)} AS mean_pinball
    FROM t GROUP BY 1, 2
    """,
    tags=("A12", "W2", "M24"),
    doc="Pinball (quantile) loss of the weekly seasonal-naive forecast at "
    "tau = 0.1/0.5/0.9 - the evaluation a probabilistic load forecaster is "
    "scored with (tau = 0.5 is half the MAE; the asymmetric taus say "
    "whether the naive under- or over-shoots), over the regularized gap-"
    "filled series (raw hourly is too short for the weekly lag at small "
    "SF). One lag window per series, "
    "a 3-row tau explode, per-term 1e-9 quantization before the decimal-"
    "exact mean - order-independent.",
)
def a_pinball_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.exact import dsum, qround
    from .shared import prepared_df

    hourly = prepared_df(spark, sf_dir)
    ow = W.partitionBy("series_id").orderBy("ts")
    u = (
        hourly.select(
            "series_id",
            F.col("value").alias("y"),
            F.lag("value", 168).over(ow).alias("yhat"),
        )
        .filter(F.col("yhat").isNotNull())
    )
    taus = F.explode(F.array(*[F.lit(t) for t in (0.1, 0.5, 0.9)])).alias("tau")
    pl = qround(
        F.when(
            F.col("y") >= F.col("yhat"), F.col("tau") * (F.col("y") - F.col("yhat"))
        ).otherwise((F.lit(1.0) - F.col("tau")) * (F.col("yhat") - F.col("y"))),
        9,
    )
    return (
        u.select("series_id", "y", "yhat", taus)
        .withColumn("pl", pl)
        .groupBy("series_id", "tau")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            qround(dsum("pl") / F.count(F.lit(1)), 9).alias("mean_pinball"),
        )
    )


@register(
    "w_ramp_rates",
    oracle=f"""
    WITH {FILLED_CTE},
    d AS (
      SELECT series_id, ts,
             value - lag(value) OVER (PARTITION BY series_id ORDER BY ts) AS ramp
      FROM filled
    ),
    u AS (SELECT * FROM d WHERE ramp IS NOT NULL),
    g AS (
      SELECT series_id, CAST(count(*) AS BIGINT) AS n_ramps,
             max(ramp) AS max_up, min(ramp) AS max_down,
             {qround_sql(davg_sql('abs(ramp)'), 9)} AS mean_abs_ramp
      FROM u GROUP BY 1
    ),
    r AS (
      SELECT series_id, abs(ramp) AS ar,
             row_number() OVER (PARTITION BY series_id ORDER BY abs(ramp) DESC, ts ASC) AS rn,
             count(*) OVER (PARTITION BY series_id) AS n
      FROM u
    )
    SELECT g.series_id, g.n_ramps, g.max_up, g.max_down, g.mean_abs_ramp,
           r.ar AS p95_abs_ramp
    FROM g JOIN r ON g.series_id = r.series_id AND r.rn = (r.n - 1) // 20 + 1
    """,
    tags=("W2", "A4", "O1"),
    doc="Ramp-rate distribution per series - the grid-operator view of load "
    "volatility (how fast demand climbs or falls hour to hour, the number "
    "that sizes spinning reserve): max up-ramp, max down-ramp, decimal-"
    "exact mean |ramp|, and the 95th-percentile |ramp| as a MEMBER "
    "selection at the integer `div` duration position (ties broken by ts - "
    "no interpolation, exact doubles in both engines). Over the regularized "
    "gap-filled series so every delta spans exactly one hour. One lag "
    "window + one agg + one rank window, all partitioned by series.",
)
def w_ramp_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.exact import davg, qround
    from .shared import prepared_df

    hourly = prepared_df(spark, sf_dir)
    ow = W.partitionBy("series_id").orderBy("ts")
    u = (
        hourly.select(
            "series_id",
            "ts",
            (F.col("value") - F.lag("value", 1).over(ow)).alias("ramp"),
        )
        .filter(F.col("ramp").isNotNull())
    )
    g = u.groupBy("series_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ramps"),
        F.max("ramp").alias("max_up"),
        F.min("ramp").alias("max_down"),
        qround(davg(F.abs(F.col("ramp"))), 9).alias("mean_abs_ramp"),
    )
    rw = W.partitionBy("series_id").orderBy(F.abs(F.col("ramp")).desc(), F.col("ts").asc())
    cw = W.partitionBy("series_id")
    p95 = (
        u.withColumn("rn", F.row_number().over(rw))
        .withColumn("n", F.count(F.lit(1)).over(cw))
        .filter(F.col("rn") == F.expr("(n - 1) div 20 + 1"))
        .select("series_id", F.abs(F.col("ramp")).alias("p95_abs_ramp"))
    )
    return g.join(p95, "series_id")


@register(
    "w_weekday_profile_divergence",
    oracle=f"""
    WITH {HOURLY_CTE},
    h AS (
      SELECT series_id, CAST(extract(hour FROM ts) AS INTEGER) AS hh,
             extract(dow FROM ts) IN (0, 6) AS wkend, value
      FROM hourly
    ),
    prof AS (
      SELECT series_id, hh, wkend, {davg_sql('value')} AS mv
      FROM h GROUP BY 1, 2, 3
    ),
    piv AS (
      SELECT series_id, hh,
             max(CASE WHEN wkend THEN mv END) AS we,
             max(CASE WHEN NOT wkend THEN mv END) AS wd
      FROM prof GROUP BY 1, 2
    ),
    ok AS (SELECT * FROM piv WHERE wd IS NOT NULL AND we IS NOT NULL),
    gap AS (
      SELECT series_id, CAST(count(*) AS BIGINT) AS n_hours,
             {qround_sql(f"{dsum_sql('abs(wd - we)')} / count(*)", 9)} AS mean_abs_gap
      FROM ok GROUP BY 1
    ),
    mx AS (SELECT series_id, max(wd) AS mwd, max(we) AS mwe FROM ok GROUP BY 1),
    pk AS (
      SELECT o.series_id,
             CAST(min(CASE WHEN o.wd = m.mwd THEN o.hh END) AS INTEGER) AS wd_peak_hour,
             CAST(min(CASE WHEN o.we = m.mwe THEN o.hh END) AS INTEGER) AS we_peak_hour
      FROM ok o JOIN mx m ON o.series_id = m.series_id GROUP BY 1
    )
    SELECT g.series_id, g.n_hours, g.mean_abs_gap, p.wd_peak_hour, p.we_peak_hour
    FROM gap g JOIN pk p ON g.series_id = p.series_id
    """,
    tags=("F4", "A2", "W8"),
    doc="Weekday-vs-weekend hour-of-day profile divergence per series - the "
    "calendar structure a load forecaster must model (the reference's "
    "holiday/calendar filters exist because weekday and weekend shapes "
    "differ): decimal-exact mean per (hour, weekend) cell, L1 gap averaged "
    "over the hours present in BOTH regimes (each |wd-we| term quantized "
    "before the exact decimal sum - order-independent), and each regime's "
    "peak hour (argmax, ties to the earliest hour, via an explicit max-"
    "join, not engine-dependent min_by). Three map-combinable aggs keyed "
    "by series - no global state.",
)
def w_weekday_profile_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.exact import davg, dsum, qround

    hourly = TSO.hourly_series(_events(spark, sf_dir))
    h = hourly.select(
        "series_id",
        F.hour("ts").alias("hh"),
        F.dayofweek("ts").isin(1, 7).alias("wkend"),
        "value",
    )
    prof = h.groupBy("series_id", "hh", "wkend").agg(davg("value").alias("mv"))
    piv = prof.groupBy("series_id", "hh").agg(
        F.max(F.when(F.col("wkend"), F.col("mv"))).alias("we"),
        F.max(F.when(~F.col("wkend"), F.col("mv"))).alias("wd"),
    )
    ok = piv.filter(F.col("wd").isNotNull() & F.col("we").isNotNull())
    gap = ok.groupBy("series_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        qround(
            dsum(F.abs(F.col("wd") - F.col("we"))) / F.count(F.lit(1)), 9
        ).alias("mean_abs_gap"),
    )
    mx = ok.groupBy("series_id").agg(
        F.max("wd").alias("mwd"), F.max("we").alias("mwe")
    )
    pk = (
        ok.join(mx.hint("shuffle_hash"), "series_id")
        .groupBy("series_id")
        .agg(
            F.min(F.when(F.col("wd") == F.col("mwd"), F.col("hh")))
            .cast("int")
            .alias("wd_peak_hour"),
            F.min(F.when(F.col("we") == F.col("mwe"), F.col("hh")))
            .cast("int")
            .alias("we_peak_hour"),
        )
    )
    return gap.join(pk, "series_id")


@register(
    "w_daily_peak_hour_hist",
    oracle=f"""
    WITH {HOURLY_CTE},
    d AS (
      SELECT series_id, ts, value,
             row_number() OVER (PARTITION BY series_id, date_trunc('day', ts)
                                ORDER BY value DESC, ts ASC) AS rn
      FROM hourly
    )
    SELECT series_id, CAST(extract(hour FROM ts) AS INTEGER) AS peak_hour,
           CAST(count(*) AS BIGINT) AS n_days
    FROM d WHERE rn = 1 GROUP BY 1, 2
    """,
    tags=("O2", "W4", "F4"),
    doc="When does each series peak? Histogram of the daily peak hour per "
    "series - the demand-charge / time-of-use question (a morning-peaking "
    "feeder and an evening-peaking one need different tariffs and "
    "different forecast features). Daily argmax as a rank-1 window keyed "
    "by (series, day) - ties to the earliest hour, deterministic in both "
    "engines - then one map-combinable count. Never a global window; "
    "window key cardinality is series x days, the natural partitioning.",
)
def w_daily_peak_hour_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    hourly = TSO.hourly_series(_events(spark, sf_dir))
    dw = W.partitionBy("series_id", F.date_trunc("day", F.col("ts"))).orderBy(
        F.col("value").desc(), F.col("ts").asc()
    )
    return (
        hourly.withColumn("rn", F.row_number().over(dw))
        .filter(F.col("rn") == 1)
        .groupBy("series_id", F.hour("ts").cast("int").alias("peak_hour"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    )


@register(
    "w_ljung_box",
    oracle=f"""
    WITH {HOURLY_CTE},
    mu AS (SELECT series_id, {davg_sql('value')} AS m FROM hourly GROUP BY 1),
    lagged AS (
      SELECT h.series_id, h.value AS x, mu.m,
             lag(h.value, 1) OVER w AS x1, lag(h.value, 2) OVER w AS x2,
             lag(h.value, 3) OVER w AS x3, lag(h.value, 4) OVER w AS x4,
             lag(h.value, 5) OVER w AS x5
      FROM hourly h JOIN mu ON h.series_id = mu.series_id
      WINDOW w AS (PARTITION BY h.series_id ORDER BY h.ts)
    ),
    agg AS (
      SELECT series_id, CAST(count(*) AS BIGINT) AS n,
             {dsum_sql('(x - m) * (x - m)')} AS den,
             {dsum_sql('CASE WHEN x1 IS NOT NULL THEN (x - m) * (x1 - m) ELSE 0.0 END')} AS c1,
             {dsum_sql('CASE WHEN x2 IS NOT NULL THEN (x - m) * (x2 - m) ELSE 0.0 END')} AS c2,
             {dsum_sql('CASE WHEN x3 IS NOT NULL THEN (x - m) * (x3 - m) ELSE 0.0 END')} AS c3,
             {dsum_sql('CASE WHEN x4 IS NOT NULL THEN (x - m) * (x4 - m) ELSE 0.0 END')} AS c4,
             {dsum_sql('CASE WHEN x5 IS NOT NULL THEN (x - m) * (x5 - m) ELSE 0.0 END')} AS c5
      FROM lagged GROUP BY 1
    ),
    rho AS (
      SELECT series_id, n,
             c1 / den AS r1, c2 / den AS r2, c3 / den AS r3,
             c4 / den AS r4, c5 / den AS r5
      FROM agg WHERE den > 0.0 AND n > 5
    )
    SELECT series_id, n,
           {qround_sql('r1', 9)} AS rho1, {qround_sql('r2', 9)} AS rho2,
           {qround_sql('r3', 9)} AS rho3, {qround_sql('r4', 9)} AS rho4,
           {qround_sql('r5', 9)} AS rho5,
           {qround_sql("CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0) * (r1 * r1 / (CAST(n AS DOUBLE) - 1.0) + r2 * r2 / (CAST(n AS DOUBLE) - 2.0) + r3 * r3 / (CAST(n AS DOUBLE) - 3.0) + r4 * r4 / (CAST(n AS DOUBLE) - 4.0) + r5 * r5 / (CAST(n AS DOUBLE) - 5.0))", 6)} AS q_stat,
           ({qround_sql("CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0) * (r1 * r1 / (CAST(n AS DOUBLE) - 1.0) + r2 * r2 / (CAST(n AS DOUBLE) - 2.0) + r3 * r3 / (CAST(n AS DOUBLE) - 3.0) + r4 * r4 / (CAST(n AS DOUBLE) - 4.0) + r5 * r5 / (CAST(n AS DOUBLE) - 5.0))", 6)} > 11.0705) AS reject_white_noise
    FROM rho
    """,
    tags=("A12", "W2", "A4"),
    doc="Ljung-Box portmanteau test (h=5) per series - the white-noise "
    "diagnostic a forecaster runs on its RESIDUALS (and the reference's "
    "noisy-series setting runs on the raw signal to prove structure "
    "exists): Q = n(n+2) * sum_k rho_k^2/(n-k) against the chi-square(5) "
    "95% point. Exactness: the mean and every autocovariance sum are "
    "decimal-exact; each rho_k is ONE double divide; Q's 5-term sum is a "
    "FIXED left-associated expression written identically in both engines "
    "(never a grouped sum over k, whose accumulation order differs). One "
    "mean join, one 5-lag window pass, one combinable agg - all keyed by "
    "series.",
)
def w_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.exact import davg, dsum, qround

    hourly = TSO.hourly_series(_events(spark, sf_dir))
    mu = hourly.groupBy("series_id").agg(davg("value").alias("m"))
    ow = W.partitionBy("series_id").orderBy("ts")
    lagged = hourly.join(mu.hint("shuffle_hash"), "series_id").select(
        "series_id",
        F.col("value").alias("x"),
        "m",
        *[F.lag("value", k).over(ow).alias(f"x{k}") for k in range(1, 6)],
    )

    def cterm(k: int):
        xk = F.col(f"x{k}")
        return dsum(
            F.when(xk.isNotNull(), (F.col("x") - F.col("m")) * (xk - F.col("m"))).otherwise(0.0)
        ).alias(f"c{k}")

    agg = lagged.groupBy("series_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum((F.col("x") - F.col("m")) * (F.col("x") - F.col("m"))).alias("den"),
        *[cterm(k) for k in range(1, 6)],
    )
    rho = agg.filter((F.col("den") > 0.0) & (F.col("n") > 5)).select(
        "series_id",
        "n",
        *[(F.col(f"c{k}") / F.col("den")).alias(f"r{k}") for k in range(1, 6)],
    )
    nd = F.col("n").cast("double")
    q = nd * (nd + 2.0) * (
        F.col("r1") * F.col("r1") / (nd - 1.0)
        + F.col("r2") * F.col("r2") / (nd - 2.0)
        + F.col("r3") * F.col("r3") / (nd - 3.0)
        + F.col("r4") * F.col("r4") / (nd - 4.0)
        + F.col("r5") * F.col("r5") / (nd - 5.0)
    )
    return rho.select(
        "series_id",
        "n",
        *[qround(F.col(f"r{k}"), 9).alias(f"rho{k}") for k in range(1, 6)],
        qround(q, 6).alias("q_stat"),
        (qround(q, 6) > 11.0705).alias("reject_white_noise"),
    )


def _dft_tables() -> tuple[list[tuple[int, float, float]], list[tuple[int, float, float]]]:
    """Literal (phase, cos, sin) tables for the 24 h and 168 h DFT bins,
    generated ONCE in Python so the Spark plan and the DuckDB oracle embed
    the SAME IEEE doubles — no cross-engine libm trig ever executes."""
    import math

    def tab(period: int) -> list[tuple[int, float, float]]:
        return [
            (p, math.cos(2.0 * math.pi * p / period), math.sin(2.0 * math.pi * p / period))
            for p in range(period)
        ]

    return tab(24), tab(168)


_PH24, _PH168 = _dft_tables()
# lit_double, not {c!r}: DuckDB's bare-literal parser is not correctly
# rounded (functions/exact.py), and a one-ulp trig-table skew breaks the
# shared-constant doctrine these queries rest on.
_PH24_SQL = ", ".join(
    f"({p}, {lit_double(c)}, {lit_double(s)})" for p, c, s in _PH24
)
_PH168_SQL = ", ".join(
    f"({p}, {lit_double(c)}, {lit_double(s)})" for p, c, s in _PH168
)


@register(
    "w_dft_power",
    oracle=f"""
    WITH {HOURLY_CTE},
    ph24(p, c, s) AS (VALUES {_PH24_SQL}),
    ph168(p, c, s) AS (VALUES {_PH168_SQL}),
    mu AS (SELECT series_id, {davg_sql('value')} AS m,
                  CAST(count(*) AS BIGINT) AS n
           FROM hourly GROUP BY 1),
    t AS (
      SELECT h.series_id, h.value - mu.m AS dv, mu.n,
             CAST((CAST(epoch(h.ts) AS BIGINT) // 3600) % 24 AS INTEGER) AS p24,
             CAST((CAST(epoch(h.ts) AS BIGINT) // 3600) % 168 AS INTEGER) AS p168
      FROM hourly h JOIN mu ON h.series_id = mu.series_id
    ),
    agg AS (
      SELECT series_id, any_value(n) AS n,
             {dsum_sql('t.dv * a.c')} AS c24, {dsum_sql('t.dv * a.s')} AS s24,
             {dsum_sql('t.dv * b.c')} AS c168, {dsum_sql('t.dv * b.s')} AS s168
      FROM t JOIN ph24 a ON t.p24 = a.p JOIN ph168 b ON t.p168 = b.p
      GROUP BY 1
    )
    SELECT series_id, n,
           {qround_sql('2.0 * sqrt(c24 * c24 + s24 * s24) / CAST(n AS DOUBLE)', 9)} AS amp24,
           {qround_sql('2.0 * sqrt(c168 * c168 + s168 * s168) / CAST(n AS DOUBLE)', 9)} AS amp168,
           CAST(CASE WHEN {qround_sql('2.0 * sqrt(c24 * c24 + s24 * s24) / CAST(n AS DOUBLE)', 9)}
                       >= {qround_sql('2.0 * sqrt(c168 * c168 + s168 * s168) / CAST(n AS DOUBLE)', 9)}
                     THEN 24 ELSE 168 END AS INTEGER) AS dominant_period
    FROM agg
    """,
    tags=("M7", "A3", "F7"),
    doc="Single-bin DFT (Goertzel) amplitude at the daily and weekly "
    "periods per series - the spectral twin of a_seasonal_strength (which "
    "load shape dominates: the diurnal cycle or the work-week cycle?). "
    "Cross-engine trig is the landmine here: JVM StrictMath and DuckDB "
    "libm may differ by an ulp, so NEITHER engine ever calls cos/sin - "
    "the 24- and 168-entry (phase, cos, sin) tables are generated once in "
    "Python and embedded as IDENTICAL double literals in both plans "
    "(Spark: constant-folded array lookups, fully map-only after the mean "
    "join; oracle: two VALUES-table joins). Products route through the "
    "decimal-exact sum; amplitude 2*|X_k|/n is one fixed IEEE expression. "
    "100 TB shape: one mean agg + one combinable 4-moment agg per series.",
)
def w_dft_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.exact import davg, dsum, qround

    hourly = TSO.hourly_series(_events(spark, sf_dir))
    mu = hourly.groupBy("series_id").agg(
        davg("value").alias("m"), F.count(F.lit(1)).cast("bigint").alias("n")
    )
    c24a = F.array(*[F.lit(c) for _, c, _ in _PH24])
    s24a = F.array(*[F.lit(s) for _, _, s in _PH24])
    c168a = F.array(*[F.lit(c) for _, c, _ in _PH168])
    s168a = F.array(*[F.lit(s) for _, _, s in _PH168])
    # F.floor, not a bare bigint cast: CAST truncates toward zero while the
    # oracle's // floor-divides — they diverge for negative (pre-1970) epochs.
    hr = F.floor(F.unix_timestamp("ts") / F.lit(3600))
    p24 = F.pmod(hr, F.lit(24)).cast("int")
    p168 = F.pmod(hr, F.lit(168)).cast("int")
    t = hourly.join(mu.hint("shuffle_hash"), "series_id").select(
        "series_id",
        "n",
        (F.col("value") - F.col("m")).alias("dv"),
        F.element_at(c24a, p24 + 1).alias("c24v"),
        F.element_at(s24a, p24 + 1).alias("s24v"),
        F.element_at(c168a, p168 + 1).alias("c168v"),
        F.element_at(s168a, p168 + 1).alias("s168v"),
    )
    agg = t.groupBy("series_id").agg(
        F.first("n").alias("n"),
        dsum(F.col("dv") * F.col("c24v")).alias("c24"),
        dsum(F.col("dv") * F.col("s24v")).alias("s24"),
        dsum(F.col("dv") * F.col("c168v")).alias("c168"),
        dsum(F.col("dv") * F.col("s168v")).alias("s168"),
    )
    nd = F.col("n").cast("double")
    amp24 = qround(
        2.0 * F.sqrt(F.col("c24") * F.col("c24") + F.col("s24") * F.col("s24")) / nd, 9
    )
    amp168 = qround(
        2.0 * F.sqrt(F.col("c168") * F.col("c168") + F.col("s168") * F.col("s168")) / nd,
        9,
    )
    return agg.select(
        "series_id",
        "n",
        amp24.alias("amp24"),
        amp168.alias("amp168"),
        F.when(amp24 >= amp168, F.lit(24))
        .otherwise(F.lit(168))
        .cast("int")
        .alias("dominant_period"),
    )


_SPK_HARMONICS = 6  # daily fundamental + 5 overtones (12h, 8h, 6h, 4.8h, 4h)

# Shared share/argmax arithmetic, emitted as ONE expression text evaluated
# by both engines on identically-named c_k/s_k columns — the w_dft_power
# doctrine extended: not just the trig constants but every downstream IEEE
# op is textually identical, so association order can't drift.
_SPK_POW = {k: f"(c{k} * c{k} + s{k} * s{k})" for k in range(1, _SPK_HARMONICS + 1)}
_SPK_TOTAL = _SPK_POW[1]
for _k in range(2, _SPK_HARMONICS + 1):
    _SPK_TOTAL = f"({_SPK_TOTAL} + {_SPK_POW[_k]})"
_SPK_MAX = f"greatest({', '.join(_SPK_POW.values())})"
_SPK_ARGMAX = (
    "CASE "
    + " ".join(
        f"WHEN {_SPK_POW[k]} = {_SPK_MAX} THEN {k}"
        for k in range(1, _SPK_HARMONICS + 1)
    )
    + " END"
)
_SPK_SHARE = f"CASE WHEN {_SPK_TOTAL} = 0.0 THEN NULL ELSE {_SPK_MAX} / {_SPK_TOTAL} END"


def _spectral_peak_oracle() -> str:
    moments = ",\n             ".join(
        f"{dsum_sql(f't.dv * h{k}.c')} AS c{k}, {dsum_sql(f't.dv * h{k}.s')} AS s{k}"
        for k in range(1, _SPK_HARMONICS + 1)
    )
    joins = " ".join(
        f"JOIN ph24 h{k} ON (t.p24 * {k}) % 24 = h{k}.p"
        for k in range(1, _SPK_HARMONICS + 1)
    )
    return f"""
    WITH {HOURLY_CTE},
    ph24(p, c, s) AS (VALUES {_PH24_SQL}),
    mu AS (SELECT series_id, {davg_sql('value')} AS m,
                  CAST(count(*) AS BIGINT) AS n
           FROM hourly GROUP BY 1),
    t AS (
      SELECT h.series_id, h.value - mu.m AS dv, mu.n,
             CAST((CAST(epoch(h.ts) AS BIGINT) // 3600) % 24 AS INTEGER) AS p24
      FROM hourly h JOIN mu ON h.series_id = mu.series_id
    ),
    agg AS (
      SELECT series_id, any_value(n) AS n,
             {moments}
      FROM t {joins}
      GROUP BY 1
    )
    SELECT series_id, n,
           CAST({_SPK_ARGMAX} AS INTEGER) AS peak_harmonic,
           {qround_sql(_SPK_SHARE, 9)} AS peak_share
    FROM agg
    """


@register(
    "w_spectral_peak_share",
    oracle=_spectral_peak_oracle,
    tags=("M7", "A3", "F7"),
    doc=f"Spectral peak share over the first {_SPK_HARMONICS} harmonics of "
    "the daily cycle per series - how concentrated the load spectrum is "
    "(a pure diurnal profile puts ~all its line power in one bin; a "
    "two-shift industrial profile splits it). Reuses w_dft_power's "
    "no-libm doctrine with ZERO new trig constants: cos(2*pi*k*p/24) is "
    "the SAME 24-entry literal table indexed at (k*p) mod 24, so every "
    "harmonic's Goertzel moments come from one constant-folded array. "
    "Share, argmax (ties to the lowest harmonic), and the zero-power "
    "guard are ONE expression text evaluated by both engines on the "
    "decimal-exact moments. 100 TB shape: one mean agg + one combinable "
    f"{2 * _SPK_HARMONICS}-moment agg per series, map-only in between.",
)
def w_spectral_peak_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.exact import davg, dsum
    from ..operators import timeseries as TSO

    hourly = TSO.hourly_series(_events(spark, sf_dir))
    mu = hourly.groupBy("series_id").agg(
        davg("value").alias("m"), F.count(F.lit(1)).cast("bigint").alias("n")
    )
    c24a = F.array(*[F.lit(c) for _, c, _ in _PH24])
    s24a = F.array(*[F.lit(s) for _, _, s in _PH24])
    # F.floor, not a bare bigint cast: CAST truncates toward zero while the
    # oracle's // floor-divides — they diverge for negative (pre-1970) epochs.
    hr = F.floor(F.unix_timestamp("ts") / F.lit(3600))
    p24 = F.pmod(hr, F.lit(24)).cast("int")
    proj = [
        c
        for k in range(1, _SPK_HARMONICS + 1)
        for c in (
            F.element_at(c24a, F.pmod(p24 * k, F.lit(24)) + 1).alias(f"cv{k}"),
            F.element_at(s24a, F.pmod(p24 * k, F.lit(24)) + 1).alias(f"sv{k}"),
        )
    ]
    t = hourly.join(mu.hint("shuffle_hash"), "series_id").select(
        "series_id", "n", (F.col("value") - F.col("m")).alias("dv"), *proj
    )
    agg = t.groupBy("series_id").agg(
        F.first("n").alias("n"),
        *[
            a
            for k in range(1, _SPK_HARMONICS + 1)
            for a in (
                dsum(F.col("dv") * F.col(f"cv{k}")).alias(f"c{k}"),
                dsum(F.col("dv") * F.col(f"sv{k}")).alias(f"s{k}"),
            )
        ],
    )
    from ..functions.exact import qround

    return agg.select(
        "series_id",
        "n",
        F.expr(_SPK_ARGMAX).cast("int").alias("peak_harmonic"),
        qround(F.expr(_SPK_SHARE), 9).alias("peak_share"),
    )


_TS_LAGS = (24, 48, 72, 96, 120, 144, 168)


@register(
    "w_theil_sen",
    oracle=f"""
    WITH {FILLED_CTE},
    lagged AS (
      SELECT series_id, value,
             {', '.join(f'lag(value, {k}) OVER w AS x{k}' for k in _TS_LAGS)}
      FROM filled WINDOW w AS (PARTITION BY series_id ORDER BY ts)
    ),
    slopes AS (
      {' UNION ALL '.join(
          f"SELECT series_id, CAST(floor((value - x{k}) / {float(k)} * 1000000.0 + 0.5) AS BIGINT) AS qs "
          f"FROM lagged WHERE x{k} IS NOT NULL"
          for k in _TS_LAGS
      )}
    ),
    g AS (SELECT series_id, list_sort(list(qs)) AS arr FROM slopes GROUP BY 1)
    SELECT series_id, CAST(len(arr) AS BIGINT) AS n_slopes,
           CAST(arr[CAST((len(arr) + 1) // 2 AS INTEGER)] AS DOUBLE) / 1000000.0
             AS ts_slope
    FROM g
    """,
    tags=("W2", "A1", "F7"),
    doc="Theil-Sen robust trend estimate per series - the median of "
    "pairwise slopes, immune to the spikes/level-shifts the anomaly "
    "injectors plant (an OLS trend is dragged by one outlier; the median "
    "slope has a 29% breakdown point). The full O(n^2) pair set is "
    "cluster-hostile, so this is the BOUNDED-lag variant (the standard "
    "streaming compromise): slopes only at the 7 day-multiple lags "
    "24..168 h over the gap-filled grid, giving <= 7n pairs and day-scale "
    "trend sensitivity without weekday-cycle aliasing (every lag is a "
    "whole number of days). Exactness: slopes quantize to the 1e-6 "
    "lattice BEFORE the sort (the mad_outliers doctrine), the median is "
    "the lower median - one spec, no interpolation. One 7-lag window "
    "pass + one bounded per-series collect.",
)
def w_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from .shared import prepared_df

    hourly = prepared_df(spark, sf_dir)
    ow = W.partitionBy("series_id").orderBy("ts")
    lagged = hourly.select(
        "series_id",
        "value",
        *[F.lag("value", k).over(ow).alias(f"x{k}") for k in _TS_LAGS],
    )
    stack_expr = "stack({n}, {args}) AS (k, xk)".format(
        n=len(_TS_LAGS),
        args=", ".join(f"{float(k)}D, x{k}" for k in _TS_LAGS),
    )
    slopes = (
        lagged.select("series_id", "value", F.expr(stack_expr))
        .filter(F.col("xk").isNotNull())
        .select(
            "series_id",
            F.floor((F.col("value") - F.col("xk")) / F.col("k") * 1e6 + F.lit(0.5))
            .cast("bigint")
            .alias("qs"),
        )
    )
    g = slopes.groupBy("series_id").agg(
        F.sort_array(F.collect_list("qs")).alias("arr")
    )
    med = "element_at(arr, cast((size(arr) + 1) div 2 as int))"
    return g.select(
        "series_id",
        F.size("arr").cast("bigint").alias("n_slopes"),
        (F.expr(med).cast("double") / F.lit(1e6)).alias("ts_slope"),
    )


@register(
    "w_system_corr",
    oracle=f"""
    WITH {FILLED_CTE},
    sys AS (SELECT ts, {dsum_sql('value')} AS sysv FROM filled GROUP BY 1),
    t AS (
      SELECT f.series_id, f.value AS x, sys.sysv AS y
      FROM filled f JOIN sys ON f.ts = sys.ts
    ),
    agg AS (
      SELECT series_id, CAST(count(*) AS BIGINT) AS n_hours,
             {dsum_sql('x')} AS sx, {dsum_sql('y')} AS sy,
             {dsum_sql('x * y')} AS sxy,
             {dsum_sql('x * x')} AS sxx, {dsum_sql('y * y')} AS syy
      FROM t GROUP BY 1
    )
    SELECT series_id, n_hours,
           {qround_sql('(CAST(n_hours AS DOUBLE) * sxy - sx * sy) / nullif(sqrt((CAST(n_hours AS DOUBLE) * sxx - sx * sx) * (CAST(n_hours AS DOUBLE) * syy - sy * sy)), 0.0)', 9)} AS corr_system,
           {qround_sql('(CAST(n_hours AS DOUBLE) * sxy - sx * sy) / nullif(CAST(n_hours AS DOUBLE) * syy - sy * sy, 0.0)', 9)} AS beta_system
    FROM agg
    """,
    tags=("A4", "J1", "A12"),
    doc="Per-series correlation and regression beta against TOTAL system "
    "load on the gap-filled hourly grid - the coincidence question behind "
    "w_peak_coincidence made continuous (which feeders move WITH the "
    "system and therefore drive capacity cost, vs counter-cyclical loads "
    "that provide free diversity). The system series is one combinable "
    "per-hour sum (grid cardinality = hours, tiny vs rows), joined back "
    "shuffle-hash on ts; Pearson r and OLS beta come from five decimal-"
    "exact moments per series with the final arithmetic a fixed IEEE "
    "expression. No window, no driver state, two shuffles total.",
)
def w_system_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.exact import dsum, qround
    from .shared import prepared_df

    hourly = prepared_df(spark, sf_dir)
    sysd = hourly.groupBy("ts").agg(dsum("value").alias("sysv"))
    t = hourly.join(sysd.hint("shuffle_hash"), "ts").select(
        "series_id", F.col("value").alias("x"), F.col("sysv").alias("y")
    )
    agg = t.groupBy("series_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        dsum("x").alias("sx"),
        dsum("y").alias("sy"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n_hours").cast("double")
    num = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = nd * F.col("syy") - F.col("sy") * F.col("sy")
    # Constant series make denx (or deny) exactly 0.0; ANSI double division
    # raises DIVIDE_BY_ZERO where DuckDB would emit inf/NaN. try_divide over
    # a nullif'd denominator yields NULL in both engines identically.
    return agg.select(
        "series_id",
        "n_hours",
        qround(
            F.try_divide(num, F.nullif(F.sqrt(denx * deny), F.lit(0.0))), 9
        ).alias("corr_system"),
        qround(F.try_divide(num, F.nullif(deny, F.lit(0.0))), 9).alias("beta_system"),
    )


@register(
    "a_forecast_combo",
    oracle=f"""
    WITH {FILLED_CTE},
    t AS (
      SELECT series_id, ts, value,
             lag(value, 168) OVER w AS f1, lag(value, 24) OVER w AS f2,
             row_number() OVER w AS rn,
             count(*) OVER (PARTITION BY series_id) AS cnt
      FROM filled WINDOW w AS (PARTITION BY series_id ORDER BY ts)
    ),
    u AS (
      SELECT *, (rn <= floor(0.8 * cnt / 24) * 24) AS is_train
      FROM t WHERE f1 IS NOT NULL AND f2 IS NOT NULL
    ),
    wts AS (
      SELECT series_id,
             coalesce({davg_sql('CASE WHEN is_train THEN abs(f2 - value) END')}
               / nullif({davg_sql('CASE WHEN is_train THEN abs(f1 - value) END')}
                        + {davg_sql('CASE WHEN is_train THEN abs(f2 - value) END')}, 0.0),
               0.5) AS w1
      FROM u GROUP BY 1
    )
    SELECT u.series_id, CAST(count(*) AS BIGINT) AS n_eval,
           {qround_sql('any_value(wts.w1)', 9)} AS w_sn,
           {qround_sql(davg_sql('abs(f1 - value)'), 9)} AS mae_sn,
           {qround_sql(davg_sql('abs(f2 - value)'), 9)} AS mae_n24,
           {qround_sql(davg_sql('abs(wts.w1 * f1 + (1.0 - wts.w1) * f2 - value)'), 9)} AS mae_combo
    FROM u JOIN wts ON u.series_id = wts.series_id
    WHERE NOT u.is_train
    GROUP BY 1
    """,
    tags=("A12", "M20", "M24", "W2"),
    doc="Bates-Granger forecast combination: blend the seasonal-naive "
    "(lag-168) and daily-naive (lag-24) forecasters with inverse-MAE "
    "weights fitted on the train split, evaluate all three on the test "
    "split - the classic result that a simple convex combination beats "
    "its components when their errors decorrelate, and the cheapest "
    "accuracy win a forecast deployment ships. Weight w1 = mae2 / (mae1 "
    "+ mae2) from decimal-exact train MAEs (singular series fall back to "
    "0.5 identically in both engines); the blend and test MAEs are fixed "
    "IEEE expressions over per-term-quantized sums. Same 80% train "
    "convention as a12_seasonal_naive_metrics. Two window passes + two "
    "combinable aggs, all keyed by series.",
)
def a_forecast_combo(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.exact import davg, qround
    from .shared import prepared_df

    hourly = prepared_df(spark, sf_dir)
    ow = W.partitionBy("series_id").orderBy("ts")
    cw = W.partitionBy("series_id")
    t = hourly.select(
        "series_id",
        "value",
        F.lag("value", 168).over(ow).alias("f1"),
        F.lag("value", 24).over(ow).alias("f2"),
        F.row_number().over(ow).alias("rn"),
        F.count(F.lit(1)).over(cw).alias("cnt"),
    )
    u = t.filter(F.col("f1").isNotNull() & F.col("f2").isNotNull()).withColumn(
        "is_train",
        F.col("rn") <= F.floor(F.lit(0.8) * F.col("cnt") / F.lit(24)) * F.lit(24),
    )
    tr1 = davg(F.when(F.col("is_train"), F.abs(F.col("f1") - F.col("value"))))
    tr2 = davg(F.when(F.col("is_train"), F.abs(F.col("f2") - F.col("value"))))
    wts = u.groupBy("series_id").agg(
        F.coalesce(
            F.try_divide(tr2, F.nullif(tr1 + tr2, F.lit(0.0))), F.lit(0.5)
        ).alias("w1")
    )
    te = u.filter(~F.col("is_train")).join(wts.hint("shuffle_hash"), "series_id")
    combo = F.col("w1") * F.col("f1") + (F.lit(1.0) - F.col("w1")) * F.col("f2")
    return te.groupBy("series_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval"),
        qround(F.first("w1"), 9).alias("w_sn"),
        qround(davg(F.abs(F.col("f1") - F.col("value"))), 9).alias("mae_sn"),
        qround(davg(F.abs(F.col("f2") - F.col("value"))), 9).alias("mae_n24"),
        qround(davg(F.abs(combo - F.col("value"))), 9).alias("mae_combo"),
    )


def _acf_pacf_oracle() -> str:
    """Mirror of the unrolled Durbin-Levinson recursion. Every arithmetic
    step is written in the SAME textual order as the Spark columns (left-
    associated sums, one nullif-guarded division per level), so the float
    sequences are bit-identical."""
    rho = f"""
    WITH {HOURLY_CTE},
    mu AS (SELECT series_id, {davg_sql('value')} AS m FROM hourly GROUP BY 1),
    lagged AS (
      SELECT h.series_id, h.value AS x, mu.m,
             lag(h.value, 1) OVER w AS x1, lag(h.value, 2) OVER w AS x2,
             lag(h.value, 3) OVER w AS x3, lag(h.value, 4) OVER w AS x4,
             lag(h.value, 5) OVER w AS x5
      FROM hourly h JOIN mu ON h.series_id = mu.series_id
      WINDOW w AS (PARTITION BY h.series_id ORDER BY h.ts)
    ),
    agg AS (
      SELECT series_id, CAST(count(*) AS BIGINT) AS n,
             {dsum_sql('(x - m) * (x - m)')} AS den,
             {dsum_sql('CASE WHEN x1 IS NOT NULL THEN (x - m) * (x1 - m) ELSE 0.0 END')} AS c1,
             {dsum_sql('CASE WHEN x2 IS NOT NULL THEN (x - m) * (x2 - m) ELSE 0.0 END')} AS c2,
             {dsum_sql('CASE WHEN x3 IS NOT NULL THEN (x - m) * (x3 - m) ELSE 0.0 END')} AS c3,
             {dsum_sql('CASE WHEN x4 IS NOT NULL THEN (x - m) * (x4 - m) ELSE 0.0 END')} AS c4,
             {dsum_sql('CASE WHEN x5 IS NOT NULL THEN (x - m) * (x5 - m) ELSE 0.0 END')} AS c5
      FROM lagged GROUP BY 1
    ),
    rho AS (
      SELECT series_id, n,
             c1 / den AS r1, c2 / den AS r2, c3 / den AS r3,
             c4 / den AS r4, c5 / den AS r5
      FROM agg WHERE den > 0.0 AND n > 5
    )"""
    return f"""{rho},
    l2 AS (
      SELECT *, r1 AS p11,
             (r2 - r1 * r1) / nullif(1.0 - r1 * r1, 0.0) AS p22
      FROM rho
    ),
    l2b AS (SELECT *, p11 - p22 * p11 AS p21 FROM l2),
    l3 AS (
      SELECT *,
             (r3 - (p21 * r2 + p22 * r1)) / nullif(1.0 - (p21 * r1 + p22 * r2), 0.0) AS p33
      FROM l2b
    ),
    l3b AS (SELECT *, p21 - p33 * p22 AS p31, p22 - p33 * p21 AS p32 FROM l3),
    l4 AS (
      SELECT *,
             (r4 - (p31 * r3 + p32 * r2 + p33 * r1))
               / nullif(1.0 - (p31 * r1 + p32 * r2 + p33 * r3), 0.0) AS p44
      FROM l3b
    ),
    l4b AS (
      SELECT *, p31 - p44 * p33 AS p41, p32 - p44 * p32 AS p42,
             p33 - p44 * p31 AS p43
      FROM l4
    ),
    l5 AS (
      SELECT *,
             (r5 - (p41 * r4 + p42 * r3 + p43 * r2 + p44 * r1))
               / nullif(1.0 - (p41 * r1 + p42 * r2 + p43 * r3 + p44 * r4), 0.0) AS p55
      FROM l4b
    )
    SELECT series_id, n,
           {qround_sql('r1', 9)} AS acf1, {qround_sql('r2', 9)} AS acf2,
           {qround_sql('r3', 9)} AS acf3, {qround_sql('r4', 9)} AS acf4,
           {qround_sql('r5', 9)} AS acf5,
           {qround_sql('p11', 9)} AS pacf1, {qround_sql('p22', 9)} AS pacf2,
           {qround_sql('p33', 9)} AS pacf3, {qround_sql('p44', 9)} AS pacf4,
           {qround_sql('p55', 9)} AS pacf5
    FROM l5
    """


@register(
    "w_acf_pacf",
    oracle=_acf_pacf_oracle,
    tags=("A12", "W2", "M7"),
    doc="ACF + PACF at lags 1-5 per series via the unrolled Durbin-Levinson "
    "recursion - the Box-Jenkins order-selection diagnostic (an AR(p) "
    "cuts the PACF off after lag p, an MA(q) cuts the ACF; w_ljung_box "
    "says WHETHER structure exists, this says WHICH model shape). The "
    "autocovariances ride the same decimal-exact 5-lag window pass as the "
    "Ljung-Box query; each D-L level is a FIXED left-associated IEEE "
    "expression with one nullif-guarded division, written textually "
    "identically in both engines (a grouped float sum over j would be "
    "order-divergent; the unrolled form is not). Map-only after the one "
    "mean join + one combinable agg.",
)
def w_acf_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.exact import davg, dsum, qround

    hourly = TSO.hourly_series(_events(spark, sf_dir))
    mu = hourly.groupBy("series_id").agg(davg("value").alias("m"))
    ow = W.partitionBy("series_id").orderBy("ts")
    lagged = hourly.join(mu.hint("shuffle_hash"), "series_id").select(
        "series_id",
        F.col("value").alias("x"),
        "m",
        *[F.lag("value", k).over(ow).alias(f"x{k}") for k in range(1, 6)],
    )

    def cterm(k: int):
        xk = F.col(f"x{k}")
        return dsum(
            F.when(xk.isNotNull(), (F.col("x") - F.col("m")) * (xk - F.col("m"))).otherwise(0.0)
        ).alias(f"c{k}")

    agg = lagged.groupBy("series_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum((F.col("x") - F.col("m")) * (F.col("x") - F.col("m"))).alias("den"),
        *[cterm(k) for k in range(1, 6)],
    )
    rho = agg.filter((F.col("den") > 0.0) & (F.col("n") > 5)).select(
        "series_id",
        "n",
        *[(F.col(f"c{k}") / F.col("den")).alias(f"r{k}") for k in range(1, 6)],
    )
    r = {k: F.col(f"r{k}") for k in range(1, 6)}
    p11 = r[1]
    d = rho.withColumn("p11", p11).withColumn(
        "p22",
        (r[2] - F.col("p11") * r[1]) / F.nullif(F.lit(1.0) - F.col("p11") * r[1], F.lit(0.0)),
    )
    d = d.withColumn("p21", F.col("p11") - F.col("p22") * F.col("p11"))
    d = d.withColumn(
        "p33",
        (r[3] - (F.col("p21") * r[2] + F.col("p22") * r[1]))
        / F.nullif(F.lit(1.0) - (F.col("p21") * r[1] + F.col("p22") * r[2]), F.lit(0.0)),
    )
    d = d.withColumn("p31", F.col("p21") - F.col("p33") * F.col("p22")).withColumn(
        "p32", F.col("p22") - F.col("p33") * F.col("p21")
    )
    d = d.withColumn(
        "p44",
        (r[4] - (F.col("p31") * r[3] + F.col("p32") * r[2] + F.col("p33") * r[1]))
        / F.nullif(
            F.lit(1.0)
            - (F.col("p31") * r[1] + F.col("p32") * r[2] + F.col("p33") * r[3]),
            F.lit(0.0),
        ),
    )
    d = (
        d.withColumn("p41", F.col("p31") - F.col("p44") * F.col("p33"))
        .withColumn("p42", F.col("p32") - F.col("p44") * F.col("p32"))
        .withColumn("p43", F.col("p33") - F.col("p44") * F.col("p31"))
    )
    d = d.withColumn(
        "p55",
        (
            r[5]
            - (
                F.col("p41") * r[4]
                + F.col("p42") * r[3]
                + F.col("p43") * r[2]
                + F.col("p44") * r[1]
            )
        )
        / F.nullif(
            F.lit(1.0)
            - (
                F.col("p41") * r[1]
                + F.col("p42") * r[2]
                + F.col("p43") * r[3]
                + F.col("p44") * r[4]
            ),
            F.lit(0.0),
        ),
    )
    return d.select(
        "series_id",
        "n",
        *[qround(F.col(f"r{k}"), 9).alias(f"acf{k}") for k in range(1, 6)],
        qround(F.col("p11"), 9).alias("pacf1"),
        qround(F.col("p22"), 9).alias("pacf2"),
        qround(F.col("p33"), 9).alias("pacf3"),
        qround(F.col("p44"), 9).alias("pacf4"),
        qround(F.col("p55"), 9).alias("pacf5"),
    )


@register(
    "w_kpss_stat",
    oracle=f"""
    WITH {HOURLY_CTE},
    q AS (
      SELECT series_id, ts, CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS qv
      FROM hourly
    ),
    w AS (
      SELECT series_id, qv,
             row_number() OVER pw AS t,
             sum(qv) OVER (PARTITION BY series_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS cs,
             sum(qv) OVER (PARTITION BY series_id) AS totq,
             count(*) OVER (PARTITION BY series_id) AS n
      FROM q WINDOW pw AS (PARTITION BY series_id ORDER BY ts)
    ),
    d AS (
      SELECT series_id, n,
             CAST(cs AS DOUBLE) / 1000000.0
               - CAST(t AS DOUBLE) * (CAST(totq AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)) AS sdev,
             CAST(qv AS DOUBLE) / 1000000.0
               - CAST(totq AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0) AS edev
      FROM w
    ),
    agg AS (
      SELECT series_id, CAST(any_value(n) AS BIGINT) AS n_points,
             {dsum_sql('sdev * sdev')} AS ss2, {dsum_sql('edev * edev')} AS se2
      FROM d GROUP BY 1
    )
    SELECT series_id, n_points,
           {qround_sql('ss2 / nullif(CAST(n_points AS DOUBLE) * se2, 0.0)', 9)} AS kpss_eta,
           ({qround_sql('ss2 / nullif(CAST(n_points AS DOUBLE) * se2, 0.0)', 9)} <= 0.463)
             AS level_stationary
    FROM agg
    """,
    tags=("A12", "W6", "A4"),
    doc="KPSS level-stationarity statistic per series (Kwiatkowski et al. "
    "1992, lag-0 long-run variance): eta = sum(S_t^2) / (n^2 * s^2) with "
    "S_t the cumulative demeaned partial sum - the diagnostic a forecaster "
    "runs BEFORE differencing (eta above the 5% critical value 0.463 "
    "rejects level stationarity; complements w_acf_pacf, which picks the "
    "order AFTER that decision). Exactness: the partial sums accumulate "
    "QUANTIZED BIGINTs (a float window-cumsum would be association-"
    "ordered differently by DuckDB's segment tree vs Spark's running "
    "fold), and every derived per-row double is one fixed IEEE expression "
    "over exact integers; eta's final divide is nullif-guarded for "
    "constant series identically in both engines. One window pass + one "
    "combinable two-moment agg.",
)
def w_kpss_stat(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.exact import dsum, qround

    hourly = TSO.hourly_series(_events(spark, sf_dir))
    q = hourly.select(
        "series_id",
        "ts",
        F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5)).cast("bigint").alias("qv"),
    )
    ow = W.partitionBy("series_id").orderBy("ts")
    pw = W.partitionBy("series_id")
    w = q.select(
        "series_id",
        "qv",
        F.row_number().over(ow).alias("t"),
        F.sum("qv").over(ow.rowsBetween(W.unboundedPreceding, 0)).alias("cs"),
        F.sum("qv").over(pw).alias("totq"),
        F.count(F.lit(1)).over(pw).alias("n"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("totq").cast("double") / (nd * F.lit(1000000.0))
    d = w.select(
        "series_id",
        "n",
        (F.col("cs").cast("double") / F.lit(1000000.0) - F.col("t").cast("double") * mean).alias("sdev"),
        (F.col("qv").cast("double") / F.lit(1000000.0) - mean).alias("edev"),
    )
    agg = d.groupBy("series_id").agg(
        F.first("n").cast("bigint").alias("n_points"),
        dsum(F.col("sdev") * F.col("sdev")).alias("ss2"),
        dsum(F.col("edev") * F.col("edev")).alias("se2"),
    )
    eta = qround(
        F.col("ss2") / F.nullif(F.col("n_points").cast("double") * F.col("se2"), F.lit(0.0)),
        9,
    )
    return agg.select(
        "series_id", "n_points", eta.alias("kpss_eta"), (eta <= F.lit(0.463)).alias("level_stationary")
    )


@register(
    "w_perm_census",
    oracle=f"""
    WITH {HOURLY_CTE},
    t AS (
      SELECT series_id, value AS x1,
             lead(value, 1) OVER w AS x2, lead(value, 2) OVER w AS x3
      FROM hourly WINDOW w AS (PARTITION BY series_id ORDER BY ts)
    ),
    u AS (
      SELECT series_id,
             4 * CASE WHEN x2 > x1 THEN 1 ELSE 0 END
               + 2 * CASE WHEN x3 > x2 THEN 1 ELSE 0 END
               + CASE WHEN x3 > x1 THEN 1 ELSE 0 END AS pattern_code
      FROM t WHERE x3 IS NOT NULL
    )
    SELECT series_id, CAST(pattern_code AS INTEGER) AS pattern_code,
           CAST(count(*) AS BIGINT) AS n,
           {qround_sql('CAST(count(*) AS DOUBLE) / CAST(sum(count(*)) OVER (PARTITION BY series_id) AS DOUBLE)', 9)} AS share
    FROM u GROUP BY 1, 2
    """,
    tags=("A4", "W2", "M7"),
    doc="Ordinal-pattern census (the counting core of permutation entropy, "
    "Bandt-Pompe 2002, order 3): per series, classify every consecutive "
    "value triple by its strict-inequality pattern (3 comparison bits -> "
    "8 codes; a monotone ramp concentrates on one code, noise spreads "
    "over all) and emit per-pattern counts and shares. Integer "
    "comparisons only - no entropy log ever crosses engines; downstream "
    "can take -sum(p*log p) on the shares. Two lead windows + one "
    "combinable count + one tiny share window over the 8-row-per-series "
    "group frame.",
)
def w_perm_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.exact import qround

    hourly = TSO.hourly_series(_events(spark, sf_dir))
    ow = W.partitionBy("series_id").orderBy("ts")
    t = hourly.select(
        "series_id",
        F.col("value").alias("x1"),
        F.lead("value", 1).over(ow).alias("x2"),
        F.lead("value", 2).over(ow).alias("x3"),
    ).filter(F.col("x3").isNotNull())
    code = (
        F.lit(4) * (F.col("x2") > F.col("x1")).cast("int")
        + F.lit(2) * (F.col("x3") > F.col("x2")).cast("int")
        + (F.col("x3") > F.col("x1")).cast("int")
    )
    g = t.select("series_id", code.alias("pattern_code")).groupBy(
        "series_id", "pattern_code"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    share_w = W.partitionBy("series_id")
    return g.select(
        "series_id",
        F.col("pattern_code").cast("int").alias("pattern_code"),
        "n",
        qround(
            F.col("n").cast("double") / F.sum("n").over(share_w).cast("double"), 9
        ).alias("share"),
    )


_HURST_SCALES = (32, 64, 128)


@register(
    "w_hurst_rs",
    oracle=f"""
    WITH {HOURLY_CTE},
    q AS (
      SELECT series_id, CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS qv,
             row_number() OVER (PARTITION BY series_id ORDER BY ts) - 1 AS rn
      FROM hourly
    ),
    sc(scale) AS (VALUES {", ".join(f"({s})" for s in _HURST_SCALES)}),
    ch AS (
      SELECT series_id, scale, rn // scale AS chunk, qv,
             row_number() OVER cw AS t,
             sum(qv) OVER (PARTITION BY series_id, scale, rn // scale ORDER BY rn
                           ROWS UNBOUNDED PRECEDING) AS cs,
             sum(qv) OVER pw AS totq,
             count(*) OVER pw AS cn
      FROM q CROSS JOIN sc
      WINDOW cw AS (PARTITION BY series_id, scale, rn // scale ORDER BY rn),
             pw AS (PARTITION BY series_id, scale, rn // scale)
    ),
    d AS (
      SELECT series_id, scale, chunk,
             CAST(cs AS DOUBLE) / 1000000.0
               - CAST(t AS DOUBLE) * (CAST(totq AS DOUBLE) / (CAST(scale AS DOUBLE) * 1000000.0)) AS sdev,
             CAST(qv AS DOUBLE) / 1000000.0
               - CAST(totq AS DOUBLE) / (CAST(scale AS DOUBLE) * 1000000.0) AS edev
      FROM ch WHERE cn = scale
    ),
    chag AS (
      SELECT series_id, scale, chunk,
             max(sdev) - min(sdev) AS r,
             sqrt({dsum_sql('edev * edev')} / CAST(any_value(scale) AS DOUBLE)) AS sigma
      FROM d GROUP BY 1, 2, 3
    ),
    ok AS (SELECT series_id, scale, r / sigma AS rs FROM chag WHERE sigma > 0.0)
    SELECT series_id, CAST(scale AS INTEGER) AS scale,
           CAST(count(*) AS BIGINT) AS n_chunks,
           {qround_sql(dsum_sql('rs') + ' / CAST(count(*) AS DOUBLE)', 9)} AS rs_avg
    FROM ok GROUP BY 1, 2
    """,
    tags=("A4", "W1", "A3"),
    doc="Rescaled-range (R/S) statistic per series at dyadic chunk scales "
    "32/64/128 h - the raw material of the Hurst exponent (Hurst 1951; "
    "H = slope of log R/S vs log n, so downstream takes log2(rs_128/"
    "rs_32)/2 WITHOUT any cross-engine libm log here): long-memory load "
    "series show R/S growing faster than sqrt(n), mean-reverting noise "
    "slower. Per chunk, the range of the demeaned cumulative deviation "
    "over the population std; partial sums accumulate QUANTIZED BIGINTs "
    "(the w_kpss_stat discipline - float window-cumsums associate "
    "differently across engines), every derived double one fixed IEEE "
    "expression, constant chunks (sigma = 0) excluded identically in "
    "both engines. Shape: one window pass per (series x 3 scales) + two "
    "combinable aggs - chunk counts shrink 32-128x before the final agg.",
)
def w_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.exact import dsum, qround

    hourly = TSO.hourly_series(_events(spark, sf_dir))
    q = hourly.select(
        "series_id",
        F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5)).cast("bigint").alias("qv"),
        (F.row_number().over(W.partitionBy("series_id").orderBy("ts")) - 1).alias("rn"),
    )
    scales = q.sparkSession.createDataFrame(
        [(s,) for s in _HURST_SCALES], "scale int"
    )
    t = q.crossJoin(F.broadcast(scales)).withColumn(
        "chunk", F.expr("rn div scale")
    )
    cw = W.partitionBy("series_id", "scale", "chunk").orderBy("rn")
    pw = W.partitionBy("series_id", "scale", "chunk")
    ch = t.select(
        "series_id",
        "scale",
        "chunk",
        "qv",
        F.row_number().over(cw).alias("t"),
        F.sum("qv").over(cw.rowsBetween(W.unboundedPreceding, 0)).alias("cs"),
        F.sum("qv").over(pw).alias("totq"),
        F.count(F.lit(1)).over(pw).alias("cn"),
    ).filter(F.col("cn") == F.col("scale"))
    sd = F.col("scale").cast("double")
    mean = F.col("totq").cast("double") / (sd * F.lit(1000000.0))
    d = ch.select(
        "series_id",
        "scale",
        "chunk",
        (F.col("cs").cast("double") / F.lit(1000000.0) - F.col("t").cast("double") * mean).alias("sdev"),
        (F.col("qv").cast("double") / F.lit(1000000.0) - mean).alias("edev"),
    )
    chag = d.groupBy("series_id", "scale", "chunk").agg(
        (F.max("sdev") - F.min("sdev")).alias("r"),
        F.sqrt(
            dsum(F.col("edev") * F.col("edev")) / F.first("scale").cast("double")
        ).alias("sigma"),
    )
    ok = chag.filter(F.col("sigma") > 0.0).select(
        "series_id", "scale", (F.col("r") / F.col("sigma")).alias("rs")
    )
    n = F.count(F.lit(1))
    return ok.groupBy("series_id", "scale").agg(
        n.cast("bigint").alias("n_chunks"),
        qround(dsum("rs") / n.cast("double"), 9).alias("rs_avg"),
    ).select(
        "series_id", F.col("scale").cast("int").alias("scale"), "n_chunks", "rs_avg"
    )


def _harm_strings() -> dict[str, str]:
    """Shared SQL expression strings for the 3-parameter harmonic OLS
    (Cramer's rule over the decimal-exact moment columns) — the SAME text
    is parsed by Spark's F.expr and embedded in the DuckDB oracle, so both
    engines evaluate the identical fixed IEEE expression tree. Division
    guards are `/(nullif(., 0.0))` (valid in both dialects; try_divide is
    Spark-only)."""
    det = (
        "(n3 * (sss * scc - ssc * ssc)"
        " - ss * (ss * scc - ssc * sc)"
        " + sc * (ss * ssc - sss * sc))"
    )
    det0 = (
        "(sy * (sss * scc - ssc * ssc)"
        " - ss * (sys * scc - ssc * syc)"
        " + sc * (sys * ssc - sss * syc))"
    )
    det1 = (
        "(n3 * (sys * scc - ssc * syc)"
        " - sy * (ss * scc - ssc * sc)"
        " + sc * (ss * syc - sys * sc))"
    )
    det2 = (
        "(n3 * (sss * syc - sys * ssc)"
        " - ss * (ss * syc - sys * sc)"
        " + sy * (ss * ssc - sss * sc))"
    )
    return {
        "b0": f"({det0} / nullif({det}, 0.0))",
        "bs": f"({det1} / nullif({det}, 0.0))",
        "bc": f"({det2} / nullif({det}, 0.0))",
        "amp": "sqrt(bs * bs + bc * bc)",
        "sse": "(syy - b0 * sy - bs * sys - bc * syc)",
        "sst": "(syy - sy * sy / n3)",
        "r2": "(1.0 - (syy - b0 * sy - bs * sys - bc * syc)"
        " / nullif(syy - sy * sy / n3, 0.0))",
    }


_HARM = _harm_strings()


@register(
    "a_harmonic_regression",
    oracle=f"""
    WITH {HOURLY_CTE},
    ph24(p, c, s) AS (VALUES {_PH24_SQL}),
    t AS (
      SELECT h.series_id, h.value AS y, a.s AS sv, a.c AS cv
      FROM hourly h
      JOIN ph24 a ON CAST((CAST(epoch(h.ts) AS BIGINT) // 3600) % 24 AS INTEGER) = a.p
    ),
    m AS (
      SELECT series_id, CAST(count(*) AS DOUBLE) AS n3,
             CAST(count(*) AS BIGINT) AS n_points,
             {dsum_sql('sv')} AS ss, {dsum_sql('cv')} AS sc,
             {dsum_sql('sv * sv')} AS sss, {dsum_sql('cv * cv')} AS scc,
             {dsum_sql('sv * cv')} AS ssc,
             {dsum_sql('y')} AS sy, {dsum_sql('y * sv')} AS sys,
             {dsum_sql('y * cv')} AS syc, {dsum_sql('y * y')} AS syy
      FROM t GROUP BY 1
    ),
    fit AS (
      SELECT series_id, n_points, n3, sy, sys, syc, syy,
             {_HARM['b0']} AS b0, {_HARM['bs']} AS bs, {_HARM['bc']} AS bc
      FROM m
    )
    SELECT series_id, n_points,
           {qround_sql('b0', 9)} AS intercept,
           {qround_sql(_HARM['amp'], 9)} AS diurnal_amp,
           {qround_sql(_HARM['r2'], 9)} AS r2
    FROM fit
    """,
    tags=("A12", "M7", "F7"),
    doc="Closed-form harmonic regression per series: OLS of load on "
    "[1, sin(2*pi*h/24), cos(2*pi*h/24)] via Cramer's rule over ten "
    "decimal-exact moments - the parametric twin of w_dft_power (the DFT "
    "measures the diurnal amplitude on the residual-free grid; this fits "
    "it jointly with an intercept and reports goodness-of-fit, the "
    "calendar-feature baseline every load forecaster starts from). The "
    "trig features come from the SAME 24-entry literal table as "
    "w_dft_power (no cross-engine libm), and the Cramer/amp/R2 arithmetic "
    "is ONE shared expression string parsed by both engines, so the IEEE "
    "evaluation trees are identical; degenerate designs (constant series, "
    "<3 distinct hours) yield NULL via nullif in both. 100 TB shape: "
    "map-only feature lookup + one combinable 10-moment agg per series.",
)
def a_harmonic_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.exact import dsum, qround

    hourly = TSO.hourly_series(_events(spark, sf_dir))
    sa = F.array(*[F.lit(s) for _, _, s in _PH24])
    ca = F.array(*[F.lit(c) for _, c, _ in _PH24])
    # F.floor, not a bare bigint cast: CAST truncates toward zero while the
    # oracle's // floor-divides — they diverge for negative (pre-1970) epochs.
    hr = F.floor(F.unix_timestamp("ts") / F.lit(3600))
    p24 = F.pmod(hr, F.lit(24)).cast("int")
    t = hourly.select(
        "series_id",
        F.col("value").alias("y"),
        F.element_at(sa, p24 + 1).alias("sv"),
        F.element_at(ca, p24 + 1).alias("cv"),
    )
    m = t.groupBy("series_id").agg(
        F.count(F.lit(1)).cast("double").alias("n3"),
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        dsum("sv").alias("ss"),
        dsum("cv").alias("sc"),
        dsum(F.col("sv") * F.col("sv")).alias("sss"),
        dsum(F.col("cv") * F.col("cv")).alias("scc"),
        dsum(F.col("sv") * F.col("cv")).alias("ssc"),
        dsum("y").alias("sy"),
        dsum(F.col("y") * F.col("sv")).alias("sys"),
        dsum(F.col("y") * F.col("cv")).alias("syc"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
    )
    fit = m.select(
        "series_id",
        "n_points",
        "n3",
        "sy",
        "sys",
        "syc",
        "syy",
        F.expr(_HARM["b0"]).alias("b0"),
        F.expr(_HARM["bs"]).alias("bs"),
        F.expr(_HARM["bc"]).alias("bc"),
    )
    return fit.select(
        "series_id",
        "n_points",
        qround(F.col("b0"), 9).alias("intercept"),
        qround(F.expr(_HARM["amp"]), 9).alias("diurnal_amp"),
        qround(F.expr(_HARM["r2"]), 9).alias("r2"),
    )


def _granger_strings() -> dict[str, str]:
    """Shared expression strings for the lag-24 predictive screen: centered
    moments from the decimal-exact raw sums, restricted SSE (own lag only)
    vs unrestricted SSE (own lag + system lag, Cramer on the 2×2), the
    one-extra-regressor F statistic, and the R² gain — ONE text parsed by
    both engines (the a_harmonic_regression doctrine)."""
    # centered second moments: u = own lag-24, v = system lag-24, y = now
    suu = "(quu - su * su / nn)"
    svv = "(qvv - sv * sv / nn)"
    suv = "(quv - su * sv / nn)"
    syu = "(qyu - sy * su / nn)"
    syv = "(qyv - sy * sv / nn)"
    syy = "(qyy - sy * sy / nn)"
    sse_r = f"({syy} - {syu} * {syu} / nullif({suu}, 0.0))"
    det = f"({suu} * {svv} - {suv} * {suv})"
    b1 = f"(({syu} * {svv} - {syv} * {suv}) / nullif({det}, 0.0))"
    b2 = f"(({syv} * {suu} - {syu} * {suv}) / nullif({det}, 0.0))"
    sse_u = f"({syy} - {b1} * {syu} - {b2} * {syv})"
    return {
        "b_sys": b2,
        "f_stat": (
            f"CASE WHEN {sse_u} > 0.0 AND {det} > 0.0 "
            f"THEN (({sse_r} - {sse_u}) / ({sse_u} / (nn - 3.0))) END"
        ),
        "r2_gain": (
            f"CASE WHEN {sse_r} > 0.0 AND {det} > 0.0 "
            f"THEN (({sse_r} - {sse_u}) / {sse_r}) END"
        ),
    }


_GRANGER = _granger_strings()
_GRANGER_MIN_N = 48


def _granger_oracle() -> str:
    moments = f"""
      SELECT series_id, CAST(count(*) AS DOUBLE) AS nn,
             CAST(count(*) AS BIGINT) AS n_points,
             {dsum_sql('y')} AS sy, {dsum_sql('u')} AS su, {dsum_sql('v')} AS sv,
             {dsum_sql('y * y')} AS qyy, {dsum_sql('u * u')} AS quu,
             {dsum_sql('v * v')} AS qvv, {dsum_sql('y * u')} AS qyu,
             {dsum_sql('y * v')} AS qyv, {dsum_sql('u * v')} AS quv"""
    return f"""
    WITH {HOURLY_CTE},
    sys AS (
      SELECT ts, {dsum_sql('value')} AS sv FROM hourly GROUP BY 1
    ),
    t AS (
      SELECT h1.series_id, h1.value AS y, h2.value AS u, s.sv AS v
      FROM hourly h1
      JOIN hourly h2 ON h1.series_id = h2.series_id
                    AND h2.ts = h1.ts - INTERVAL 24 HOUR
      JOIN sys s ON s.ts = h1.ts - INTERVAL 24 HOUR
    ),
    m AS ({moments} FROM t GROUP BY 1 HAVING count(*) >= {_GRANGER_MIN_N})
    SELECT series_id, n_points,
           {qround_sql(_GRANGER['b_sys'], 9)} AS b_sys,
           {qround_sql(_GRANGER['f_stat'], 6)} AS f_stat,
           {qround_sql(_GRANGER['r2_gain'], 9)} AS r2_gain
    FROM m
    """


@register(
    "a_granger_screen",
    oracle=_granger_oracle,
    tags=("A12", "A4", "J1", "M7"),
    doc="Granger-style cross-learning screen per series: does the lag-24 "
    "SYSTEM total improve the forecast of this series beyond its own "
    "lag-24? Restricted (own-lag) vs unrestricted (own + system lag) OLS "
    "both solve in closed form from ONE combinable 12-moment aggregate "
    "(Cramer on the centered 2x2), and the one-extra-regressor F "
    "statistic plus the R^2 gain are a single shared expression text in "
    "both engines over decimal-exact sums - no iterative fit, no window. "
    "This is the routing signal for hierarchical load forecasting: a "
    "high F says the series should borrow the system profile (the "
    "forecaster's cross-series mode), a low F says its own history "
    "suffices. Lags align by explicit timestamp equi-joins (ts - 24h), "
    "so irregular series never misalign the way a row-offset lag would. "
    "Degenerate guards (constant series, collinear lags) emit NULL via "
    "the same CASE text in both engines; series need >= "
    f"{_GRANGER_MIN_N} aligned points.",
)
def a_granger_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.exact import dsum, qround

    hourly = TSO.hourly_series(_events(spark, sf_dir))
    sys_tot = hourly.groupBy("ts").agg(dsum("value").alias("svv"))
    h1 = hourly.select("series_id", "ts", F.col("value").alias("y"))
    lag_ts = F.col("ts") - F.expr("INTERVAL 24 HOURS")
    h2 = hourly.select(
        "series_id", F.col("ts").alias("lts"), F.col("value").alias("u")
    )
    t = (
        h1.withColumn("lts", lag_ts)
        .join(h2, ["series_id", "lts"])
        .join(sys_tot.select(F.col("ts").alias("lts"), F.col("svv").alias("v")), "lts")
        .select("series_id", "y", "u", "v")
    )
    m = (
        t.groupBy("series_id")
        .agg(
            F.count(F.lit(1)).cast("double").alias("nn"),
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            dsum("y").alias("sy"),
            dsum("u").alias("su"),
            dsum("v").alias("sv"),
            dsum(F.col("y") * F.col("y")).alias("qyy"),
            dsum(F.col("u") * F.col("u")).alias("quu"),
            dsum(F.col("v") * F.col("v")).alias("qvv"),
            dsum(F.col("y") * F.col("u")).alias("qyu"),
            dsum(F.col("y") * F.col("v")).alias("qyv"),
            dsum(F.col("u") * F.col("v")).alias("quv"),
        )
        .filter(F.col("n_points") >= _GRANGER_MIN_N)
    )
    return m.select(
        "series_id",
        "n_points",
        qround(F.expr(_GRANGER["b_sys"]), 9).alias("b_sys"),
        qround(F.expr(_GRANGER["f_stat"]), 6).alias("f_stat"),
        qround(F.expr(_GRANGER["r2_gain"]), 9).alias("r2_gain"),
    )


@register(
    "w_seasonal_strength",
    oracle=f"""
    WITH {FILLED_CTE},
    w AS (
      SELECT series_id, value,
             CAST(sum({dec_sql('value')}) OVER mw AS DOUBLE) / 25.0 AS trend,
             count(*) OVER mw AS wn,
             CAST((CAST(epoch(ts) AS BIGINT) // 3600) % 24 AS INTEGER) AS hod
      FROM filled
      WINDOW mw AS (PARTITION BY series_id ORDER BY ts
                    ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
    ),
    d AS (SELECT series_id, hod, value, value - trend AS det FROM w WHERE wn = 25),
    s AS (SELECT series_id, hod, {davg_sql('det')} AS seas FROM d GROUP BY 1, 2),
    r AS (
      SELECT d.series_id, d.det, d.det - s.seas AS rem, d.value - s.seas AS deseas
      FROM d JOIN s ON d.series_id = s.series_id AND d.hod = s.hod
    ),
    agg AS (
      SELECT series_id, CAST(count(*) AS DOUBLE) AS n,
             CAST(count(*) AS BIGINT) AS n_points,
             {dsum_sql('det')} AS sd, {dsum_sql('det * det')} AS sd2,
             {dsum_sql('rem')} AS sr, {dsum_sql('rem * rem')} AS sr2,
             {dsum_sql('deseas')} AS su, {dsum_sql('deseas * deseas')} AS su2
      FROM r GROUP BY 1
    )
    SELECT series_id, n_points,
           {qround_sql('greatest(0.0, 1.0 - (sr2 - sr * sr / n) / nullif(sd2 - sd * sd / n, 0.0))', 9)} AS seasonal_strength,
           {qround_sql('greatest(0.0, 1.0 - (sr2 - sr * sr / n) / nullif(su2 - su * su / n, 0.0))', 9)} AS trend_strength
    FROM agg WHERE n >= 2.0
    """,
    tags=("A4", "M7", "W1"),
    doc="STL-lite seasonal/trend strength per series (Wang-Smith-Hyndman "
    "2006, the measures behind the 'feasts' feature set): detrend with a "
    "centered 25 h moving average on the gap-filled grid (full windows "
    "only), estimate the diurnal component as the per-(series, hour) mean "
    "of the detrended values, then strength_seasonal = 1 - SS(remainder)/"
    "SS(detrended) and strength_trend = 1 - SS(remainder)/SS(deseasoned) "
    "- the pair of [0, 1] scores a forecasting pipeline uses to ROUTE "
    "series (strong-seasonal -> Holt-Winters/harmonic, strong-trend -> "
    "damped ETS, neither -> naive). The (n-1) divisors cancel in the "
    "ratios, so each strength is one fixed IEEE expression over six "
    "decimal-exact sums; the moving average accumulates QUANTIZED "
    "decimals in the window (float window sums associate differently "
    "across engines). Shape: one rows-window pass, one 24-row-per-series "
    "agg + shuffle-hash join back, one combinable 6-moment agg.",
)
def w_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.exact import davg, dec, dsum, qround
    from .shared import prepared_df

    filled = prepared_df(spark, sf_dir)
    mw = W.partitionBy("series_id").orderBy("ts").rowsBetween(-12, 12)
    # F.floor, not a bare bigint cast: CAST truncates toward zero while the
    # oracle's // floor-divides — they diverge for negative (pre-1970) epochs.
    hr = F.floor(F.unix_timestamp("ts") / F.lit(3600))
    # r15: the sliding 25-row sum accumulates the int64 micro-units dec()
    # quantizes to (floor(v·1e6+0.5)) instead of decimal(27,6) — Spark
    # re-adds the whole frame per output row for bounded sliding windows,
    # so the 25 adds/row were BigDecimal before and long now. Domain
    # bounds (r16, tightened per the r15 advisor): the bound that
    # guarantees ORACLE PARITY is the lattice-fidelity limit |v| ≲ 4.5e9 —
    # past 2^52, v·1e6's double spacing exceeds 1 so the +0.5 tie-break is
    # absorbed and this long path can land one 1e-6 ulp away from the
    # decimal(27,6) quantization the oracle replays. int64 capacity is the
    # far wider |Σ| ≤ 25·|v|·1e6 < 2^63 (|v| < 3.7e11), and long-sum
    # overflow past it DOES raise: Spark 4 runs ANSI mode by default,
    # session.py leaves it on, and tests/test_plans.py::
    # test_ansi_enabled_and_long_sum_overflow_raises pins both facts.
    # The finish is one exact Σmicro/1e6 decimal division and a single
    # decimal→double rounding — exactly the rounding the decimal window
    # sum's final cast performed, so `trend` is bit-identical inside the
    # parity domain (oracle parity re-proven at both SFs).
    mu = F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5)).cast("long")
    trend_d = (
        F.sum(mu).over(mw).cast("decimal(38,0)") / F.lit(1000000).cast("decimal(7,0)")
    ).cast("double")
    w = filled.select(
        "series_id",
        "value",
        (trend_d / F.lit(25.0)).alias("trend"),
        F.count(F.lit(1)).over(mw).alias("wn"),
        F.pmod(hr, F.lit(24)).cast("int").alias("hod"),
    )
    d = w.filter(F.col("wn") == 25).select(
        "series_id", "hod", "value", (F.col("value") - F.col("trend")).alias("det")
    )
    # r15: `d` feeds BOTH the per-(series, hod) seasonal mean and the join
    # back — without a lineage cut the sort + 25-row sliding window execute
    # twice (runtime exchange reuse dedupes only the exchange underneath).
    # The eager checkpoint materializes the exact computed rows (no
    # semantic change), inside the timed query. Row-count bounded by the
    # prepared grid — skinny at any scale.
    d = d.localCheckpoint(eager=True)
    s = d.groupBy("series_id", "hod").agg(davg("det").alias("seas"))
    r = d.join(s.hint("shuffle_hash"), ["series_id", "hod"]).select(
        "series_id",
        "det",
        (F.col("det") - F.col("seas")).alias("rem"),
        (F.col("value") - F.col("seas")).alias("deseas"),
    )
    agg = r.groupBy("series_id").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        dsum("det").alias("sd"),
        dsum(F.col("det") * F.col("det")).alias("sd2"),
        dsum("rem").alias("sr"),
        dsum(F.col("rem") * F.col("rem")).alias("sr2"),
        dsum("deseas").alias("su"),
        dsum(F.col("deseas") * F.col("deseas")).alias("su2"),
    )
    n = F.col("n")
    ss_rem = F.col("sr2") - F.col("sr") * F.col("sr") / n
    ss_det = F.col("sd2") - F.col("sd") * F.col("sd") / n
    ss_des = F.col("su2") - F.col("su") * F.col("su") / n
    return agg.filter(n >= 2.0).select(
        "series_id",
        "n_points",
        qround(
            F.greatest(F.lit(0.0), F.lit(1.0) - ss_rem / F.nullif(ss_det, F.lit(0.0))), 9
        ).alias("seasonal_strength"),
        qround(
            F.greatest(F.lit(0.0), F.lit(1.0) - ss_rem / F.nullif(ss_des, F.lit(0.0))), 9
        ).alias("trend_strength"),
    )


def _crps_exprs() -> tuple[str, str]:
    """Shared CRPS expression strings over the 7 lag columns (identical
    text parsed by both engines — left-to-right IEEE order fixed by
    construction). For the empirical CDF of m ensemble members:
    CRPS = mean_i |x_i − y| − (1/(2m²))·Σ_{i,j} |x_i − x_j|, and the
    double sum over unordered pairs is twice the i<j sum, so the second
    term is (i<j sum)/m² = /49."""
    lags = _TS_LAGS
    t1 = "(" + " + ".join(f"abs(x{k} - value)" for k in lags) + ") / 7.0"
    pairs = [
        f"abs(x{a} - x{b})" for idx, a in enumerate(lags) for b in lags[idx + 1 :]
    ]
    t2 = "(" + " + ".join(pairs) + ") / 49.0"
    return t1, t2


@register(
    "a_crps_ensemble",
    oracle=lambda: f"""
    WITH {FILLED_CTE},
    lagged AS (
      SELECT series_id, value,
             {', '.join(f'lag(value, {k}) OVER w AS x{k}' for k in _TS_LAGS)}
      FROM filled WINDOW w AS (PARTITION BY series_id ORDER BY ts)
    ),
    u AS (
      SELECT series_id,
             ({_crps_exprs()[0]}) - ({_crps_exprs()[1]}) AS crps
      FROM lagged WHERE {' AND '.join(f'x{k} IS NOT NULL' for k in _TS_LAGS)}
    )
    SELECT series_id, CAST(count(*) AS BIGINT) AS n_eval,
           {qround_sql(dsum_sql('crps') + ' / CAST(count(*) AS DOUBLE)', 9)} AS crps_mean
    FROM u GROUP BY 1
    """,
    tags=("A12", "M24", "W2"),
    doc="CRPS of the 7-member seasonal-lag ensemble per series: treat the "
    "day-multiple lags 24..168 h as an empirical forecast distribution "
    "and score it with the continuous ranked probability score "
    "CRPS = mean|x_i - y| - (1/(2m^2))SUM|x_i - x_j| (Gneiting-Raftery "
    "2007) - the proper scoring rule that generalizes MAE to "
    "distributions and the standard metric for probabilistic load "
    "forecasts (complements a_pinball_loss, which scores three fixed "
    "quantiles; CRPS integrates over ALL of them). The 7+21 absolute-"
    "difference terms are ONE shared expression string in both engines "
    "(fixed IEEE order), per-row CRPS routes through the decimal-exact "
    "mean. Shape: 7 lag windows + one combinable agg per series - no "
    "explode, no join.",
)
def a_crps_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.exact import dsum, qround
    from .shared import prepared_df

    filled = prepared_df(spark, sf_dir)
    ow = W.partitionBy("series_id").orderBy("ts")
    lagged = filled.select(
        "series_id",
        "value",
        *[F.lag("value", k).over(ow).alias(f"x{k}") for k in _TS_LAGS],
    )
    cond = None
    for k in _TS_LAGS:
        c = F.col(f"x{k}").isNotNull()
        cond = c if cond is None else (cond & c)
    t1, t2 = _crps_exprs()
    u = lagged.filter(cond).select(
        "series_id", (F.expr(t1) - F.expr(t2)).alias("crps")
    )
    n = F.count(F.lit(1))
    return u.groupBy("series_id").agg(
        n.cast("bigint").alias("n_eval"),
        qround(dsum("crps") / n.cast("double"), 9).alias("crps_mean"),
    )
