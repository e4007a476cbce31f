"""Point-in-time (as-of) join query spec: each hourly point joined to the
latest PRIOR day's per-series threshold — the feature-store correctness
pattern (features computed on day D become effective at D+1, so no
look-ahead leaks into the joined row). The oracle uses DuckDB's native
ASOF LEFT JOIN against the identical threshold table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import davg, davg_sql, dvar, dvar_sql, qround, qround_sql
from ..operators import timeseries as TSO
from .registry import register

# population std with the variance clamped at 0 in BOTH engines: a
# near-constant group's exact-moment variance can be a tiny fp negative,
# which DuckDB's sqrt rejects outright and Spark's turns into NaN
_STD_SQL = f"sqrt(greatest({dvar_sql('value', 0)}, 0.0))"
_THR_SQL = qround_sql(f"{davg_sql('value')} + 2.0 * {_STD_SQL}", 6)


@register(
    "j_asof_thresholds",
    oracle=f"""
    WITH hourly AS (
      SELECT CAST(user_id AS VARCHAR) AS series_id,
             CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ts,
             {davg_sql('value')} AS value
      FROM events GROUP BY 1, 2
    ),
    thr AS (
      SELECT series_id,
             CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 1 DAY AS eff_ts,
             {_THR_SQL} AS thr
      FROM hourly GROUP BY series_id, date_trunc('day', ts)
    )
    SELECT h.series_id, h.ts, h.value, t.thr, (h.value > t.thr) AS flag
    FROM hourly h ASOF LEFT JOIN thr t
      ON h.series_id = t.series_id AND h.ts >= t.eff_ts
    """,
    tags=("J-asof", "J1", "W2"),
    doc="As-of (point-in-time) join: hourly points pick up yesterday's "
    "per-series mean+2*std threshold via the union-and-carry encoding (one "
    "key shuffle + linear windowed scan — no per-key pair explosion); the "
    "oracle is DuckDB's native ASOF LEFT JOIN, so the operator's <= / "
    "latest-prior semantics are pinned by an independent implementation.",
)
def j_asof_thresholds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .shared import hourly_df

    hourly = hourly_df(spark, sf_dir)
    thr = (
        hourly.groupBy(
            "series_id", F.date_trunc("day", F.col("ts")).alias("day_ts")
        )
        .agg(
            qround(
                davg("value")
                + F.lit(2.0) * F.sqrt(F.greatest(dvar("value", 0), F.lit(0.0))),
                6,
            ).alias("thr")
        )
        .select(
            "series_id",
            (F.col("day_ts") + F.expr("INTERVAL 1 DAY")).alias("eff_ts"),
            "thr",
        )
    )
    joined = TSO.asof_join(
        hourly, thr, by="series_id", left_ts="ts", right_ts="eff_ts", value_cols=["thr"]
    )
    return joined.select(
        "series_id", "ts", "value", "thr", (F.col("value") > F.col("thr")).alias("flag")
    )


@register(
    "j_asof_forward",
    oracle=f"""
    WITH hourly AS (
      SELECT CAST(user_id AS VARCHAR) AS series_id,
             CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ts,
             {davg_sql('value')} AS value
      FROM events GROUP BY 1, 2
    ),
    thr AS (
      SELECT series_id,
             CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 1 DAY AS eff_ts,
             {_THR_SQL} AS thr
      FROM hourly GROUP BY series_id, date_trunc('day', ts)
    )
    SELECT h.series_id, h.ts, h.value, t.thr AS next_thr,
           (h.value > t.thr) AS flag
    FROM hourly h ASOF LEFT JOIN thr t
      ON h.series_id = t.series_id AND h.ts <= t.eff_ts
    """,
    tags=("J-asof", "J1", "W2"),
    doc="FORWARD as-of join (pandas merge_asof direction='forward'): each "
    "hourly point picks up the EARLIEST future per-series threshold - the "
    "'next scheduled event' pattern (upcoming tariff, next calibration). "
    "Union-and-carry reversed: one key shuffle + a linear windowed scan "
    "carrying values backward over the [current, unbounded following] "
    "frame - no per-key pair explosion; the oracle is DuckDB's native "
    "forward ASOF LEFT JOIN (the <= inequality), pinning >= /earliest-"
    "future semantics against an independent implementation.",
)
def j_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .shared import hourly_df

    hourly = hourly_df(spark, sf_dir)
    thr = (
        hourly.groupBy(
            "series_id", F.date_trunc("day", F.col("ts")).alias("day_ts")
        )
        .agg(
            qround(
                davg("value")
                + F.lit(2.0) * F.sqrt(F.greatest(dvar("value", 0), F.lit(0.0))),
                6,
            ).alias("thr")
        )
        .select(
            "series_id",
            (F.col("day_ts") + F.expr("interval 1 day")).alias("ts"),
            "thr",
        )
    )
    j = TSO.asof_join_forward(hourly, thr, by="series_id", value_cols=["thr"])
    return j.select(
        "series_id",
        "ts",
        "value",
        F.col("thr").alias("next_thr"),
        (F.col("value") > F.col("thr")).alias("flag"),
    )
