"""Synthetic anomaly injection + the minimum detect→impute slice.

Reference semantics (citations into /root/reference/):
- M1-M3 anomaly types               src/data_processing/synth_anomaly.py:27-100
- M4 contamination scheduler        src/data_processing/process_aemo.py:72-130
- M15 postprocess detection         src/anomaly_detection/postprocessing.py:39-79
- imputation fallback (weekly fill) src/data_processing/fill_missing_values.py:14-46

The reference draws NumPy randoms; our spec replaces them with the
deterministic hash-counter RNG (functions/rng.py) keyed on
(series, epoch_day) so injection is a *pure column expression* — no state, no
ordering dependence, embarrassingly parallel at 100 TB, and exactly
reproducible in the DuckDB oracle.

Injection spec (per series-day, day bucketed in UTC):
    u_day  = U(series, day | salt 7)   → contaminated iff u_day < rate
    atype  = 1 + floor(U(salt 11) · 4) ∈ {1..4}
    start  = floor(U(salt 13) · 18)    ∈ {0..17}   (hour-of-day index)
    length = 3 + floor(U(salt 17) · 4) ∈ {3..6}    (types 1/2)
    mag    = 1 + 3 · U(salt 19)

    type 1: seg → 0,          hour 23 += seg_sum        (energy returned late)
    type 2: seg → 0.1·x,      hour 23 += 0.9·seg_sum    (soft drop)
    type 3: point s → −mag·x                            (negative spike)
    type 4: point s → (1+mag)·x                         (positive spike)
    gt = 1 on every altered point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.exact import dec
from ..functions.rng import rng_uniform
from .timeseries import SID, TS, VAL, fill_gaps, regularize

CONTAM_RATE = 0.15

SALT_DAY, SALT_TYPE, SALT_START, SALT_LEN, SALT_MAG = 7, 11, 13, 17, 19


def prepared_series(events: DataFrame | None, hourly: DataFrame | None = None) -> DataFrame:
    """Regularized hourly grid, gaps filled (lag 24h/168h, lead 24h, else 0).
    ``hourly``: optional prebuilt (persisted) hourly grid — see
    plans/shared.py."""
    reg = regularize(events, "1 hour", hourly=hourly)
    filled = fill_gaps(reg, lags=(24, 168), leads=(24,), default=0.0)
    return filled.select(SID, TS, F.col("filled").alias(VAL))


def inject_anomalies(series: DataFrame, rate: float = CONTAM_RATE) -> DataFrame:
    """M1-M4 as one declarative plan: RNG columns → segment mask → windowed
    segment-energy sum → per-point rewrite. Adds (value_contam, gt, atype)."""
    skey = F.col(SID).cast("bigint")
    eday = F.floor(F.unix_timestamp(F.col(TS)) / 86400)
    h = F.hour(F.col(TS))

    u_day = rng_uniform(skey, eday, salt=SALT_DAY)
    contam = u_day < F.lit(rate)
    atype = (F.lit(1) + F.floor(rng_uniform(skey, eday, salt=SALT_TYPE) * 4)).cast("int")
    seg_start = F.floor(rng_uniform(skey, eday, salt=SALT_START) * 18).cast("int")
    seg_len = (F.lit(3) + F.floor(rng_uniform(skey, eday, salt=SALT_LEN) * 4)).cast("int")
    mag = F.lit(1.0) + F.lit(3.0) * rng_uniform(skey, eday, salt=SALT_MAG)

    df = (
        series.withColumn("_eday", eday)
        .withColumn("_h", h)
        .withColumn("_contam", contam)
        .withColumn("atype", F.when(contam, atype).otherwise(F.lit(0)))
        .withColumn("_s", seg_start)
        .withColumn("_len", seg_len)
        .withColumn("_mag", mag)
    )
    in_seg = (
        F.col("_contam")
        & F.col("atype").isin(1, 2)
        & (F.col("_h") >= F.col("_s"))
        & (F.col("_h") < F.col("_s") + F.col("_len"))
    )
    at_point = F.col("_contam") & F.col("atype").isin(3, 4) & (F.col("_h") == F.col("_s"))

    day_w = W.partitionBy(SID, "_eday")
    seg_sum = F.coalesce(
        F.sum(F.when(in_seg, dec(VAL))).over(day_w).cast("double"), F.lit(0.0)
    )

    v = F.col(VAL)
    value_contam = (
        F.when(in_seg & (F.col("atype") == 1), F.lit(0.0))
        .when(in_seg & (F.col("atype") == 2), F.lit(0.1) * v)
        .when(F.col("_contam") & (F.col("atype") == 1) & (F.col("_h") == 23), v + seg_sum)
        .when(F.col("_contam") & (F.col("atype") == 2) & (F.col("_h") == 23), v + F.lit(0.9) * seg_sum)
        .when(at_point & (F.col("atype") == 3), -F.col("_mag") * v)
        .when(at_point & (F.col("atype") == 4), (F.lit(1.0) + F.col("_mag")) * v)
        .otherwise(v)
    )
    gt = (
        in_seg
        | at_point
        | (F.col("_contam") & F.col("atype").isin(1, 2) & (F.col("_h") == 23))
    ).cast("int")

    return (
        df.withColumn("value_contam", value_contam)
        .withColumn("gt", gt)
        .drop("_s", "_len", "_mag", "_h", "_contam", "_eday")
    )


def detect_flags(df: DataFrame, value_col: str = "value_contam", z_threshold: float = 2.5) -> DataFrame:
    """M15 stand-in detector: per-series z-score outliers ∪ zero-plateau runs
    (≥3 consecutive zeros). Pure window functions — one shuffle on series_id."""
    w = W.partitionBy(SID)
    n = F.count(value_col).over(w).cast("double")
    s = F.sum(dec(value_col)).over(w).cast("double")
    s2 = F.sum(dec(F.col(value_col) * F.col(value_col))).over(w).cast("double")
    mean = s / n
    std = F.sqrt((s2 - s * s / n) / (n - F.lit(1.0)))
    z_flag = F.abs(F.col(value_col) - mean) > F.lit(z_threshold) * std

    ord_w = W.partitionBy(SID).orderBy(TS)
    run_w = W.partitionBy(SID).orderBy(TS).rowsBetween(W.unboundedPreceding, 0)
    is_zero = (F.col(value_col) == 0).cast("int")
    chg = (
        (is_zero != F.lag(is_zero, 1).over(ord_w)) | F.lag(is_zero, 1).over(ord_w).isNull()
    ).cast("int")
    with_run = (
        df.withColumn("_mean", mean)
        .withColumn("_z", z_flag)
        .withColumn("_zero", is_zero)
        .withColumn("_run", F.sum(chg).over(run_w))
    )
    run_len_w = W.partitionBy(SID, "_run")
    plateau = (F.col("_zero") == 1) & (F.count(F.lit(1)).over(run_len_w) >= 3)
    return (
        with_run.withColumn("flag", (F.col("_z") | plateau).cast("int"))
        .drop("_z", "_zero", "_run")
    )


def impute_flagged(df: DataFrame, value_col: str = "value_contam") -> DataFrame:
    """Weekly-fill imputation of flagged points (M5 fallback chain:
    value 168 h earlier, else series mean)."""
    ord_w = W.partitionBy(SID).orderBy(TS)
    cleaned = F.when(
        F.col("flag") == 1, F.coalesce(F.lag(value_col, 168).over(ord_w), F.col("_mean"))
    ).otherwise(F.col(value_col))
    return df.withColumn("cleaned", cleaned).drop("_mean")


def cleaned_series(
    events: DataFrame | None, rate: float = CONTAM_RATE, prepared: DataFrame | None = None
) -> DataFrame:
    """The minimum end-to-end slice (SURVEY.md §7): regularize → fill →
    inject → detect → impute. Point-level output with gt and flags.
    ``prepared``: optional prebuilt (persisted) prepared series."""
    base = prepared if prepared is not None else prepared_series(events)
    return impute_flagged(detect_flags(inject_anomalies(base, rate)))


def pipeline_metrics(point_df: DataFrame) -> DataFrame:
    """A10 confusion counts + cleaned-energy rollup per series."""
    flag, gt = F.col("flag"), F.col("gt")
    return point_df.groupBy(SID).agg(
        F.sum((flag * gt)).cast("bigint").alias("tp"),
        F.sum(flag * (1 - gt)).cast("bigint").alias("fp"),
        F.sum((1 - flag) * gt).cast("bigint").alias("fn"),
        F.sum((1 - flag) * (1 - gt)).cast("bigint").alias("tn"),
        F.sum(dec("cleaned")).cast("double").alias("sum_cleaned"),
        F.sum(dec("value_contam")).cast("double").alias("sum_contam"),
    )
