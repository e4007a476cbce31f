"""Skew-resilient join: key salting.

AQE's skew-join splitting handles sort-merge skew automatically
(spark.sql.adaptive.skewJoin.enabled — on in session.py), but salting is the
explicit fix when one side must broadcast-replicate hot keys, e.g. joining a
fact against per-key aggregates where one key holds 30 % of rows.

Pattern: fact rows get a deterministic salt in [0, n_salts) (hash of a
high-cardinality column — NOT rand(), so retries/stage-replays stay
consistent); the dim side is exploded ×n_salts; the join key becomes
(key, salt), spreading each hot key over n_salts reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join `fact` ⋈ `dim` on `key` with the dim side replicated ×n_salts.

    `salt_source`: a fact column whose hash spreads rows. Defaults to the
    hash of the WHOLE fact row (xxhash64 over every column) — a pure
    function of the data, so stage retries and repartitioning replay the
    exact same row→reducer assignment (spark_partition_id would not).
    Identical duplicate rows share a salt under the default; pass a
    high-cardinality `salt_source` if hot keys are dominated by exact
    duplicates.
    """
    src = [F.col(salt_source)] if salt_source else [F.col(c) for c in fact.columns]
    f = fact.withColumn("_salt", F.pmod(F.xxhash64(*src), F.lit(n_salts)).cast("int"))
    d = dim.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    out = f.join(d, [key, "_salt"], how)
    return out.drop("_salt")


def skew_profile(df, key_col: str, k: int = 10):
    """Join-key skew profiler — the diagnostic run BEFORE choosing a join
    strategy at 100 TB: the top-``k`` hottest keys with their share of all
    rows, plus the global skew factor ``max_cnt · n_keys / n_rows`` (1.0 =
    perfectly uniform; ≫1 = salt or skew-join this key).

    Scale shape: one combinable key count; the hot-key cut is TakeOrdered
    (per-partition heaps over the key-count frame, never a sort of it);
    the 1-row global stats ride a broadcast cross join. All ratios are
    IEEE doubles of exact integers.
    """
    from pyspark.sql import functions as F

    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    stats = counts.agg(
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col("key").asc()).limit(k)
    return top.crossJoin(F.broadcast(stats)).select(
        "key",
        "cnt",
        "n_rows",
        "n_keys",
        (F.col("cnt").cast("double") / F.col("n_rows").cast("double")).alias("share"),
        (
            F.col("max_cnt").cast("double")
            * F.col("n_keys").cast("double")
            / F.col("n_rows").cast("double")
        ).alias("skew_factor"),
    )


JOINEST_SALT = 211
JOINEST_MOD = 16  # sample 1-in-16 keys


def join_size_estimate(
    left, left_key: str, right, right_key: str, mod: int = JOINEST_MOD
) -> "DataFrame":
    """Sketch-based equi-join cardinality estimate — the statistic a cost
    model needs BEFORE running a 100 TB join: |A⋈B| = Σ_k fA(k)·fB(k),
    estimated over a deterministic 1-in-``mod`` distinct-key sample
    (include key k iff rng_draw(k) % mod == 0 — the same coordinated
    sample on both sides, so matching keys are never half-sampled).

    Scale shape: the key-sample predicate filters BEFORE the per-side
    frequency counts (both scans drop ~15/16 of rows pre-shuffle); the
    frequency join runs on the sampled key dims only; the estimate is an
    exact integer (Σ products · mod). The exact count is computed
    alongside for the accuracy report — a real deployment would skip it.

    Output: one row (est_size, exact_size, rel_err).
    """
    from pyspark.sql import functions as F

    from ..functions.rng import rng_draw

    def freqs(df, key):
        return (
            df.select(F.col(key).alias("k"))
            .filter(F.pmod(rng_draw(F.col(key), salt=JOINEST_SALT), F.lit(mod)) == 0)
            .groupBy("k")
            .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
        )
    fa = freqs(left, left_key).withColumnRenamed("f", "fa")
    fb = freqs(right, right_key).withColumnRenamed("f", "fb")
    est = fa.join(fb, "k").agg(
        (F.coalesce(F.sum(F.col("fa") * F.col("fb")), F.lit(0)) * F.lit(mod))
        .cast("bigint")
        .alias("est_size")
    )
    exact = (
        left.select(F.col(left_key).alias("k"))
        .join(right.select(F.col(right_key).alias("k")), "k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_size"))
    )
    j = est.crossJoin(F.broadcast(exact))
    return j.select(
        "est_size",
        "exact_size",
        (
            (F.col("est_size").cast("double") - F.col("exact_size").cast("double"))
            / F.col("exact_size").cast("double")
        ).alias("rel_err"),
    )
