"""Forecasting + feature query specs (SURVEY.md §2: M22, A12, W3, A3, A11)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import davg_sql, dsum_sql, qround_sql
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
