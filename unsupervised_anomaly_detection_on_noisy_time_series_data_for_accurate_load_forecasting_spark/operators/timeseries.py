"""Time-series operators — the reference's core domain, re-expressed as
declarative Spark plans over the long-format contract
``(series_id, ts, value)`` (SURVEY.md §1.4).

Reference semantics covered here (citations into /root/reference/):
- P3/J1 time-grid regularization   process_aemo.py:57-58
- P2 timestamp dedup               process_aemo.py:54
- J2/W2 lagged gap fill            process_aemo.py:59, process_INPG.py:45
- M5 weekly gap fill               fill_missing_values.py:14-46
- W5 consecutive-run detection     postprocessing.py:5-36
- W6 z-score outliers              postprocessing.py:58-62
- W9 position split                process_aemo.py:62-66
- W1 sliding windows               process_aemo.py:146-172, pipeline.py:158-168
- W4 variance-rank dedup           pipeline.py:328-333
- A5 running energy sum            synth_anomaly.py:37-41

Scale design: every operator partitions by ``series_id`` (the natural shard
key — 100 TB means *many* series, not huge single series), uses window
functions instead of self-joins, and keeps all arithmetic in decimal-exact
form so results are independent of partitioning (functions/exact.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.exact import davg, dec, dsum, dvar

SID, TS, VAL = "series_id", "ts", "value"


def events_as_series(events: DataFrame) -> DataFrame:
    """Adapter: the test `events` stream as a long-format series."""
    return events.select(
        F.col("user_id").cast("string").alias(SID), F.col("ts").alias(TS), F.col("value").alias(VAL)
    )


def dedup_first(df: DataFrame, order_col: str = "event_id") -> DataFrame:
    """P2: keep the first row per (series_id, ts) — reference keeps the first
    duplicate index (process_aemo.py:54). row_number, not dropDuplicates,
    so 'first' is deterministic under any partitioning."""
    w = W.partitionBy(SID, TS).orderBy(F.col(order_col).asc())
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def hourly_series(events: DataFrame) -> DataFrame:
    """Bucket the irregular event stream to an hourly grid per series
    (decimal-exact mean per bucket). One shuffle on (series_id, hour)."""
    s = events_as_series(events)
    return (
        s.groupBy(SID, F.date_trunc("hour", F.col(TS)).alias(TS))
        .agg(davg(VAL).alias(VAL))
    )


def time_spine(df: DataFrame, step: str = "1 hour") -> DataFrame:
    """P3 grid: per-series min..max timestamp spine.

    `sequence` + `explode` generates the spine where the data lives (no
    driver-side date_range); the per-series agg is a map-side-combinable
    min/max. A year of hours is ~8.8k rows per series — bounded."""
    bounds = df.groupBy(SID).agg(F.min(TS).alias("_lo"), F.max(TS).alias("_hi"))
    return bounds.select(
        SID, F.explode(F.sequence("_lo", "_hi", F.expr(f"interval {step}"))).alias(TS)
    )


def regularize(
    events: DataFrame | None, step: str = "1 hour", hourly: DataFrame | None = None
) -> DataFrame:
    """P3/J1: spine ⟕ observations. Missing slots surface as NULL value.

    Both sides are partitioned by series_id; at scale this is a co-partitioned
    sort-merge join (spine is derived from the same table, so AQE reuses the
    shuffle). Pass ``hourly`` (ideally persisted — see plans/shared.py) to
    share one bucketing pass across several consumers in a session."""
    if hourly is None:
        hourly = hourly_series(events)
    spine = time_spine(hourly, step)
    return spine.join(hourly, [SID, TS], "left")


def fill_gaps(
    df: DataFrame, lags: tuple[int, ...] = (24, 168), leads: tuple[int, ...] = (24,), default: float | None = None
) -> DataFrame:
    """J2/W2/M5: fill NULL slots from exact earlier/later offsets.

    Reference fills from 7 days prior (process_aemo.py:59) and nearest same
    weekday (fill_missing_values.py:14-46). `lag`/`lead` over the regular grid
    express both without a self-join."""
    w = W.partitionBy(SID).orderBy(TS)
    candidates = [F.col(VAL)]
    candidates += [F.lag(VAL, k).over(w) for k in lags]
    candidates += [F.lead(VAL, k).over(w) for k in leads]
    if default is not None:
        candidates.append(F.lit(default))
    return df.withColumn("filled", F.coalesce(*candidates))


def zscore_flags(df: DataFrame, value_col: str = VAL, threshold: float = 2.0) -> DataFrame:
    """W6: |x - mean| > t·std within the series, exact-moment arithmetic.

    Single window partition per series — no shuffle beyond the series
    repartition, stats computed once per partition frame."""
    w = W.partitionBy(SID)
    n = F.count(value_col).over(w).cast("double")
    s = F.sum(dec(value_col)).over(w).cast("double")
    s2 = F.sum(dec(F.col(value_col) * F.col(value_col))).over(w).cast("double")
    mean = s / n
    var = (s2 - s * s / n) / (n - F.lit(1.0))
    return df.withColumn(
        "is_outlier",
        (F.abs(F.col(value_col) - mean) > F.lit(threshold) * F.sqrt(var)).cast("int"),
    )


def run_ids(df: DataFrame, flag_col: str) -> DataFrame:
    """W5 gaps-and-islands: change-flag + running sum assigns a run id to each
    maximal stretch of equal `flag_col` values per series."""
    w = W.partitionBy(SID).orderBy(TS)
    chg = (
        (F.col(flag_col) != F.lag(flag_col, 1).over(w)) | F.lag(flag_col, 1).over(w).isNull()
    ).cast("int")
    running = W.partitionBy(SID).orderBy(TS).rowsBetween(W.unboundedPreceding, 0)
    return df.withColumn("_chg", chg).withColumn("run_id", F.sum("_chg").over(running)).drop("_chg")


def long_runs(df: DataFrame, flag_col: str, min_len: int) -> DataFrame:
    """W5: runs of `flag_col` with length ≥ min_len (zero-plateau detection,
    postprocessing.py:5-36)."""
    with_runs = run_ids(df, flag_col)
    return (
        with_runs.groupBy(SID, "run_id")
        .agg(
            F.min(flag_col).alias("flag"),
            F.count(F.lit(1)).alias("run_len"),
            F.min(TS).alias("run_start"),
            F.max(TS).alias("run_end"),
        )
        .filter((F.col("flag") == 1) & (F.col("run_len") >= min_len))
        .drop("flag")
    )


def position_split(df: DataFrame, ratio: float = 0.8, day_size: int = 24) -> DataFrame:
    """W9: first floor(ratio·N / day)·day rows are 'train', rest 'test'
    (day-aligned split, process_aemo.py:62-66)."""
    w = W.partitionBy(SID).orderBy(TS)
    cnt = W.partitionBy(SID)
    rn = F.row_number().over(w)
    cut = F.floor(F.lit(ratio) * F.count(F.lit(1)).over(cnt) / day_size) * day_size
    return df.withColumn("split", F.when(rn <= cut, F.lit("train")).otherwise(F.lit("test")))


def sliding_windows(df: DataFrame, size: str = "2 days", slide: str = "1 day") -> DataFrame:
    """W1: sliding event-time windows via the built-in `window()` bucketing —
    rows replicate into size/slide buckets map-side; the agg shuffles on
    (series_id, window_start). No per-row Python, no self-join."""
    return (
        df.groupBy(SID, F.window(TS, size, slide).alias("_w"))
        .agg(F.count(F.lit(1)).alias("n_points"), dsum(VAL).alias("sum_value"))
        .select(SID, F.col("_w.start").alias("window_start"), "n_points", "sum_value")
    )


def variance_rank_dedup(df: DataFrame) -> DataFrame:
    """W4: among candidate day-windows per series, keep the one with the
    lowest variance (reference sorts ascending and keeps first,
    pipeline.py:328-333), deterministic tiebreak on the day."""
    day = F.date_trunc("day", F.col(TS)).alias("day")
    per_day = df.groupBy(SID, day).agg(
        dvar(VAL, ddof=1).alias("day_var"), F.count(F.lit(1)).alias("n_points")
    ).filter(F.col("n_points") >= 2)  # singleton edge-days have no variance
    w = W.partitionBy(SID).orderBy(F.col("day_var").asc(), F.col("day").asc())
    return per_day.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1).drop("rk")


def running_energy(df: DataFrame) -> DataFrame:
    """A5: cumulative energy per series ordered by ts (decimal-exact, so the
    prefix sums are partition-independent)."""
    w = W.partitionBy(SID).orderBy(TS).rowsBetween(W.unboundedPreceding, 0)
    return df.withColumn("cum_energy", F.sum(dec(VAL)).over(w).cast("double"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str = SID,
    left_ts: str = TS,
    right_ts: str = TS,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Point-in-time (as-of) join: attach to each left row the value columns
    of the LATEST right row with ``right.right_ts <= left.left_ts`` per
    ``by`` key — the feature-store correctness join (no look-ahead). Ties at
    equal timestamps include the right row.

    Spark has no native ASOF JOIN; the usual range-join encoding explodes to
    |left|·|right| pairs per key before filtering. This implementation is the
    union-and-carry form instead: tag right rows as state rows, union both
    streams, and carry each value column forward with
    ``last(col, ignorenulls=True)`` over (key, ts, state-first) — ONE hash
    shuffle on the key, a linear windowed scan, zero pair explosion, state
    bounded by the window frame. Left rows before any right row keep NULLs
    (left-join semantics). Verified against DuckDB's native ASOF LEFT JOIN
    (plans/queries_asof.py).
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (by, right_ts)]
    left_cols = list(left.columns)
    l = left
    for c in value_cols:
        l = l.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    l = l.withColumn("_src", F.lit(1))
    r = right.select(
        F.col(by), F.col(right_ts).alias(left_ts), *[F.col(c) for c in value_cols]
    )
    for c in left_cols:
        if c not in (by, left_ts):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    r = r.withColumn("_src", F.lit(0))
    cols = [by, left_ts, *[c for c in left_cols if c not in (by, left_ts)], *value_cols, "_src"]
    u = l.select(*cols).unionByName(r.select(*cols))
    # state rows (_src=0) sort before left rows at the same ts, so an
    # equal-timestamp right row is visible to that left row (<= semantics)
    w = (
        W.partitionBy(by)
        .orderBy(F.col(left_ts).asc(), F.col("_src").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = [F.last(F.col(c), ignorenulls=True).over(w).alias(c) for c in value_cols]
    return (
        u.select(*[F.col(c) for c in left_cols], F.col("_src"), *carried)
        .filter(F.col("_src") == 1)
        .drop("_src")
    )


def range_join_buckets(
    points: DataFrame,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    by: str = SID,
    ts_col: str = TS,
    bucket_hours: int = 24,
) -> DataFrame:
    """Interval (range) join as an EQUI-join: match each point to every
    interval of its key containing it, without the inequality-join plan
    (Catalyst turns `p.ts BETWEEN i.start AND i.end` into a nested-loop or
    per-key cartesian — quadratic in points×intervals per key).

    Both sides map to fixed time buckets — points to the one bucket holding
    their timestamp, intervals EXPLODED to every bucket they overlap — and
    the join becomes a hash equi-join on (key, bucket) followed by the exact
    BETWEEN filter. Replication factor = ⌈interval span / bucket⌉ + 1, so
    ``bucket_hours`` trades shuffle volume (smaller buckets → more interval
    copies) against join selectivity (larger buckets → more filtered pairs);
    size it near the typical interval length. A point lives in exactly one
    bucket, so no output dedup is needed."""
    step = F.lit(bucket_hours * 3600)
    pb = points.withColumn("_bkt", F.floor(F.unix_timestamp(F.col(ts_col)) / step))
    ib = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / step),
                F.floor(F.unix_timestamp(F.col(end_col)) / step),
            )
        ),
    )
    return (
        pb.join(ib, [by, "_bkt"])
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col)))
        .drop("_bkt")
    )


def value_entropy(events: DataFrame, n_bins: int = 16) -> DataFrame:
    """Per-series Shannon entropy of the value distribution over ``n_bins``
    equal-width bins — the distribution-shape signal behind load-profile
    classification (a flat meter has near-zero entropy; a noisy one
    approaches log2(n_bins)).

    Cross-engine discipline: bin edges come from exact per-series min/max
    (combinable agg, joined back on the series key); p_i = c_i/n is an
    exact integer ratio, and each -p·log2(p) term is quantized to the 1e-6
    lattice BEFORE the integer term-sum (the t_tfidf_top_terms precedent:
    a 1-ulp libm divergence cannot cross the 0.5e-6 boundary in practice,
    and the sum of quantized integers is order-independent).

    Scale shape: one combinable min/max agg, one (series, bin) combinable
    count, one series-key join, one combinable term-sum — no window, no
    sort, no collect.
    """
    s = events_as_series(events)
    mm = s.groupBy(SID).agg(F.min(VAL).alias("_lo"), F.max(VAL).alias("_hi"))
    binned = s.join(mm, SID).withColumn(
        "_bin",
        F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
            F.least(
                F.floor(
                    (F.col(VAL) - F.col("_lo"))
                    / (F.col("_hi") - F.col("_lo"))
                    * F.lit(n_bins)
                ).cast("int"),
                F.lit(n_bins - 1),
            )
        ),
    )
    counts = binned.groupBy(SID, "_bin").agg(F.count(F.lit(1)).alias("c"))
    n = counts.groupBy(SID).agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("n_bins_used")
    )
    term = F.expr(
        "cast(floor((cast(c as double) / cast(n as double)) "
        "* (ln(cast(c as double) / cast(n as double)) / ln(2.0D)) "
        "* 1000000.0D + 0.5D) as bigint)"
    )
    return (
        counts.join(n, SID)
        .withColumn("_t", term)
        .groupBy(SID)
        .agg(
            F.max("n").cast("bigint").alias("n_points"),
            F.max("n_bins_used").cast("bigint").alias("n_bins_used"),
            (-F.sum("_t").cast("double") / F.lit(1e6)).alias("entropy_bits"),
        )
    )


def psi_drift(events: DataFrame, n_bins: int = 10) -> DataFrame:
    """Population stability index per event_type between the first and
    second half of the stream — the standard data-drift monitor a feature
    pipeline runs before retraining (PSI < 0.1 stable, 0.1–0.25 moderate
    shift, > 0.25 retrain).

    Spec: the split point is the integer midpoint of the event_id range
    (ids are arrival-ordered; an integer ``div`` split is bit-exact in
    every engine, unlike epoch arithmetic on sub-second timestamps). Bin
    edges are ``n_bins`` equal widths over period A's exact min/max (the
    reference-period convention); period-B values outside A's range clamp
    into the edge bins. Laplace-smoothed densities p = (c+1)/(n+n_bins)
    keep empty bins finite, and every (p_b−p_a)·ln(p_b/p_a) term is
    quantized to the 1e-9 lattice BEFORE the integer term-sum (the
    value_entropy precedent — order-independent, and a 1-ulp libm
    divergence cannot cross the 0.5e-9 boundary).

    Scale shape: one combinable min/max agg per group, one (group, bin)
    combinable count, group-key joins, a static bin grid — no window, no
    sort, no collect; groups are event types, so skew is bounded by the
    type alphabet."""
    e = events.select("event_type", "event_id", "value")
    rng_ = e.groupBy("event_type").agg(
        F.min("event_id").alias("_i0"), F.max("event_id").alias("_i1")
    )
    j = e.join(rng_, "event_type").withColumn(
        "_a", (F.col("event_id") <= F.expr("(_i0 + _i1) div 2")).cast("int")
    )
    amm = (
        j.filter(F.col("_a") == 1)
        .groupBy("event_type")
        .agg(F.min("value").alias("_lo"), F.max("value").alias("_hi"))
    )
    bin_expr = F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
        F.greatest(
            F.lit(0),
            F.least(
                F.floor(
                    (F.col("value") - F.col("_lo"))
                    / (F.col("_hi") - F.col("_lo"))
                    * F.lit(float(n_bins))
                ).cast("int"),
                F.lit(n_bins - 1),
            ),
        )
    )
    counts = (
        j.join(amm, "event_type")
        .withColumn("_bin", bin_expr)
        .groupBy("event_type", "_bin")
        .agg(
            F.sum("_a").alias("ca"),
            F.sum(F.lit(1) - F.col("_a")).alias("cb"),
        )
    )
    grid = (
        counts.select("event_type")
        .distinct()
        .select("event_type", F.explode(F.expr(f"sequence(0, {n_bins - 1})")).alias("_bin"))
    )
    dense = (
        grid.join(counts, ["event_type", "_bin"], "left")
        .withColumn("ca", F.coalesce(F.col("ca"), F.lit(0)))
        .withColumn("cb", F.coalesce(F.col("cb"), F.lit(0)))
    )
    tot = dense.groupBy("event_type").agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    pa = f"(cast(ca as double) + 1.0D) / (cast(na as double) + {float(n_bins)}D)"
    pb = f"(cast(cb as double) + 1.0D) / (cast(nb as double) + {float(n_bins)}D)"
    term = F.expr(
        f"cast(floor((({pb}) - ({pa})) * ln(({pb}) / ({pa})) * 1000000000.0D + 0.5D) as bigint)"
    )
    return (
        dense.join(tot, "event_type")
        .withColumn("_t", term)
        .groupBy("event_type")
        .agg(
            F.max("na").cast("bigint").alias("n_a"),
            F.max("nb").cast("bigint").alias("n_b"),
            (F.sum("_t").cast("double") / F.lit(1e9)).alias("psi"),
        )
    )


def ks_drift(events: DataFrame) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic per event_type between the
    first and second half of the stream (same integer event_id midpoint
    split as :func:`psi_drift`) — the distribution-free companion to PSI:
    KS = max_x |F_a(x) − F_b(x)|, sensitive to any CDF gap rather than
    binned density shifts.

    INTEGER-EXACT cross-engine: the running CDFs are cumulative integer
    counts over the per-type sorted distinct values, and the max gap is
    compared via cross-multiplication — max |cum_a·n_b − cum_b·n_a| — so no
    float division happens until the single final ratio (BIGINT products
    are exact here for per-group counts up to ~3e9; beyond that, widen the
    two products to DECIMAL(38,0) — same plan shape).

    Scale shape: one combinable (type, value) count, one per-TYPE window
    over distinct values (partition key = event type, never a global
    sort), one combinable max — group cardinality is the type alphabet, so
    the window partitions are bounded and skew-free."""
    e = events.select("event_type", "event_id", "value")
    rng_ = e.groupBy("event_type").agg(
        F.min("event_id").alias("_i0"), F.max("event_id").alias("_i1")
    )
    j = e.join(rng_, "event_type").withColumn(
        "_a", (F.col("event_id") <= F.expr("(_i0 + _i1) div 2")).cast("int")
    )
    counts = j.groupBy("event_type", "value").agg(
        F.sum("_a").alias("ca"), F.sum(F.lit(1) - F.col("_a")).alias("cb")
    )
    w = W.partitionBy("event_type").orderBy("value")
    cum = counts.withColumn("cum_ca", F.sum("ca").over(w)).withColumn(
        "cum_cb", F.sum("cb").over(w)
    )
    tot = counts.groupBy("event_type").agg(
        F.sum("ca").cast("bigint").alias("na"), F.sum("cb").cast("bigint").alias("nb")
    )
    gap = F.abs(
        F.col("cum_ca").cast("bigint") * F.col("nb")
        - F.col("cum_cb").cast("bigint") * F.col("na")
    )
    return (
        cum.join(tot, "event_type")
        .withColumn("_gap", gap)
        .groupBy("event_type")
        .agg(
            F.max("na").alias("n_a"),
            F.max("nb").alias("n_b"),
            F.max("_gap").alias("_num"),
        )
        .select(
            "event_type",
            "n_a",
            "n_b",
            F.expr(
                "cast(_num as double) / (cast(n_a as double) * cast(n_b as double))"
            ).alias("ks"),
        )
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    by: str = SID,
    left_ts: str = TS,
    right_ts: str = TS,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Forward as-of join (pandas ``merge_asof(direction='forward')``):
    attach to each left row the value columns of the EARLIEST right row
    with ``right.right_ts >= left.left_ts`` per key — the "next scheduled
    event" pattern (upcoming tariff change, next calibration window). Ties
    at equal timestamps include the right row.

    Mirror of :func:`asof_join`'s union-and-carry encoding, reversed: one
    hash shuffle on the key, a linear windowed scan carrying each value
    column BACKWARD with ``first(col, ignorenulls=True)`` over the
    [current, unbounded following] frame; left rows sort before state rows
    at equal timestamps so an equal-ts right row is visible (>= semantics).
    Left rows after the last right row keep NULLs. Zero pair explosion.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (by, right_ts)]
    left_cols = list(left.columns)
    l = left
    for c in value_cols:
        l = l.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    l = l.withColumn("_src", F.lit(1))
    r = right.select(
        F.col(by), F.col(right_ts).alias(left_ts), *[F.col(c) for c in value_cols]
    )
    for c in left_cols:
        if c not in (by, left_ts):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    r = r.withColumn("_src", F.lit(0))
    cols = [by, left_ts, *[c for c in left_cols if c not in (by, left_ts)], *value_cols, "_src"]
    u = l.select(*cols).unionByName(r.select(*cols))
    # left rows (_src=1) sort BEFORE state rows at the same ts, so the
    # forward frame starting at the left row still sees an equal-ts right
    w = (
        W.partitionBy(by)
        .orderBy(F.col(left_ts).asc(), F.col("_src").desc())
        .rowsBetween(0, W.unboundedFollowing)
    )
    carried = [F.first(F.col(c), ignorenulls=True).over(w).alias(c) for c in value_cols]
    return (
        u.select(*[F.col(c) for c in left_cols], F.col("_src"), *carried)
        .filter(F.col("_src") == 1)
        .drop("_src")
    )


def mad_outliers(events: DataFrame, k_times_10000: int = 44478) -> DataFrame:
    """Robust per-series outlier accounting via the median/MAD estimator —
    the W6 z-score's breakdown-resistant twin (a single injected spike
    inflates a std enough to hide itself; the MAD doesn't move):
    flag x iff |x − median| > (k·1.4826)·MAD, with k·1.4826 = 4.4478
    carried as the INTEGER 44478 so the comparison
    ``|q − med|·10000 > 44478·mad`` is exact int64 arithmetic.

    Exactness: values quantize to the 1e-6 lattice; the median is the
    lower median (element (n+1) div 2 of the sorted array — one spec, no
    engine percentile-interpolation ambiguity); the MAD is the same
    median applied to |x − med|. One combinable collect per series (array
    bounded by series length, the ewma/holt-winters contract) and pure
    array HOFs after — a single pass, no second shuffle.

    Output: (series_id, n_points, median, mad, n_outliers).
    """
    q = F.expr(f"cast(floor({VAL} * 1000000.0D + 0.5D) as bigint)")
    g = events.groupBy(SID).agg(F.sort_array(F.collect_list(q)).alias("arr"))
    med = "element_at(arr, cast((size(arr) + 1) div 2 as int))"
    dev = f"array_sort(transform(arr, x -> abs(x - {med})))"
    mad = f"element_at({dev}, cast((size(arr) + 1) div 2 as int))"
    n_out = (
        f"size(filter(arr, x -> abs(x - {med}) * 10000 > {k_times_10000}L * {mad}))"
    )
    return g.select(
        SID,
        F.size("arr").cast("bigint").alias("n_points"),
        (F.expr(med).cast("double") / F.lit(1e6)).alias("median"),
        (F.expr(mad).cast("double") / F.lit(1e6)).alias("mad"),
        F.expr(n_out).cast("bigint").alias("n_outliers"),
    )
