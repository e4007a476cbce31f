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
    "j_asof_nearest",
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
    ),
    b AS (
      SELECT h.series_id, h.ts, h.value, t.thr AS thr_b, t.eff_ts AS t_b
      FROM hourly h ASOF LEFT JOIN thr t
        ON h.series_id = t.series_id AND h.ts >= t.eff_ts
    ),
    f AS (
      SELECT h.series_id, h.ts, t.thr AS thr_f, t.eff_ts AS t_f
      FROM hourly h ASOF LEFT JOIN thr t
        ON h.series_id = t.series_id AND h.ts <= t.eff_ts
    )
    SELECT b.series_id, b.ts, b.value,
           CASE WHEN t_f IS NULL THEN thr_b
                WHEN t_b IS NULL THEN thr_f
                WHEN CAST(floor(epoch(b.ts)) AS BIGINT) - CAST(floor(epoch(t_b)) AS BIGINT)
                     <= CAST(floor(epoch(t_f)) AS BIGINT) - CAST(floor(epoch(b.ts)) AS BIGINT)
                THEN thr_b ELSE thr_f END AS nearest_thr,
           CASE WHEN t_b IS NULL AND t_f IS NULL THEN NULL
                WHEN t_f IS NULL THEN 'backward'
                WHEN t_b IS NULL THEN 'forward'
                WHEN CAST(floor(epoch(b.ts)) AS BIGINT) - CAST(floor(epoch(t_b)) AS BIGINT)
                     <= CAST(floor(epoch(t_f)) AS BIGINT) - CAST(floor(epoch(b.ts)) AS BIGINT)
                THEN 'backward' ELSE 'forward' END AS direction
    FROM b JOIN f ON b.series_id = f.series_id AND b.ts = f.ts
    """,
    tags=("J-asof", "J1", "W2"),
    doc="NEAREST as-of join (pandas merge_asof direction='nearest', ties -> "
    "backward): each hourly point takes whichever of the latest-prior / "
    "earliest-future per-series threshold is closer in time. Composed from "
    "the two union-and-carry passes (each one key shuffle + linear windowed "
    "scan) joined on the unique (series, ts) key — still no per-key pair "
    "explosion; the oracle composes DuckDB's two native ASOF directions "
    "with the identical integer-seconds tie rule.",
)
def j_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .shared import hourly_df

    hourly = hourly_df(spark, sf_dir)
    thr = (
        hourly.groupBy("series_id", F.date_trunc("day", F.col("ts")).alias("day_ts"))
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
    b = TSO.asof_join(
        hourly,
        thr.withColumn("t_b", F.col("eff_ts")),
        by="series_id",
        left_ts="ts",
        right_ts="eff_ts",
        value_cols=["thr", "t_b"],
    ).select("series_id", "ts", "value", F.col("thr").alias("thr_b"), "t_b")
    fwd = TSO.asof_join_forward(
        hourly,
        thr.withColumnRenamed("eff_ts", "ts").withColumn("t_f", F.col("ts")),
        by="series_id",
        value_cols=["thr", "t_f"],
    ).select("series_id", "ts", F.col("thr").alias("thr_f"), "t_f")
    j = b.join(fwd, ["series_id", "ts"])
    db = F.unix_timestamp(F.col("ts")) - F.unix_timestamp(F.col("t_b"))
    df_ = F.unix_timestamp(F.col("t_f")) - F.unix_timestamp(F.col("ts"))
    nearest = (
        F.when(F.col("t_f").isNull(), F.col("thr_b"))
        .when(F.col("t_b").isNull(), F.col("thr_f"))
        .when(db <= df_, F.col("thr_b"))
        .otherwise(F.col("thr_f"))
    )
    direction = (
        F.when(F.col("t_b").isNull() & F.col("t_f").isNull(), F.lit(None).cast("string"))
        .when(F.col("t_f").isNull(), F.lit("backward"))
        .when(F.col("t_b").isNull(), F.lit("forward"))
        .when(db <= df_, F.lit("backward"))
        .otherwise(F.lit("forward"))
    )
    return j.select(
        "series_id", "ts", "value", nearest.alias("nearest_thr"), direction.alias("direction")
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
