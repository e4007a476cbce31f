"""Deterministic mergeable quantile sketch (bottom-k order sample).

Closes the one sketch family that still leaned on ``percentile_approx``'s
JVM-internal Greenwald-Khanna state: a quantile summary whose state is a
pure function of the input MULTISET — independent of row order, partition
layout, and micro-batch slicing — so the identical sketch is replayable in
DuckDB and the estimates hash-verify cross-engine, not merely land inside
an error band.

Why not KLL proper: KLL's compactors flip a coin per compaction, and WHICH
rows are co-resident in a compactor when it fills depends on arrival
order, so even with the seeded cross-engine RNG supplying the coins the
final state varies with partitioning — unverifiable by an oracle and
unstable under Spark's own task scheduling. The classic order-sample
(bottom-k / "sequential Poisson" family, Cohen & Kaplan 2007; Agarwal et
al., "Mergeable Summaries", PODS 2012 §3) gives up KLL's asymptotic edge
(rank error O(1/sqrt(k)) instead of O(1/k) at equal state) in exchange for
the two properties a distributed, cross-engine, resumable pipeline
actually needs:

* **canonical state** — each row draws ``u = rng_draw(uid)`` from the
  seeded hash-counter RNG (functions/rng.py, SURVEY.md §2 F8); the sketch
  for a group is THE k rows with the smallest ``(u, uid)``. A deterministic
  function of the set, full stop.
* **exact mergeability** — bottom-k of a union is the bottom-k of the
  concatenated per-part bottom-k's: ``B_k(A ∪ B) = B_k(B_k(A) ∪ B_k(B))``
  (any row in the union's true bottom-k is in its own part's bottom-k,
  since dropping other-part rows only improves its rank). Partials merge
  associatively and commutatively, so ANY partition layout, combine tree,
  or micro-batch slicing yields the identical final state — proven by
  tests/test_quantile_sketch.py against shuffled partitionings.

Because ``u`` is a uniform hash, the kept rows are a simple random sample
without replacement of the group (when n ≤ k, the whole group — the
sketch degrades to EXACT quantiles). Quantile q is read off the sample at
the integer rank ``(q_pct · (m-1)) // 100 + 1`` (1-based lower-nearest
rank, pure integer arithmetic — no float interpolation to diverge by an
ulp cross-engine), giving rank error O(n/sqrt(k)) w.h.p.

100 TB shape: Catalyst rewrites the rank filter into a map-side
``WindowGroupLimit Partial`` (each task forwards ≤ k rows per group —
the combiner, JVM-side, inside the scan stage's codegen), so at most
``k · n_tasks`` rows per group ever reach the single shuffle; the
finishing window orders only those. State per group is O(k) everywhere.
Reference contract: the quantile surface of SURVEY.md §2 A1/A6 (the
reference computes exact numpy quantiles, process_aemo.py:60-75; this is
the bounded-state scale path with a driver-verifiable spec).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rng import rng_draw

QSKETCH_K = 256  # sample size per group: rank error ~ n/16 w.h.p.
QSKETCH_SALT = 227  # RNG stream id, disjoint from every other operator's


def bottom_k_sample(
    df: DataFrame,
    group_col: str,
    uid_cols: list[str],
    k: int = QSKETCH_K,
    salt: int = QSKETCH_SALT,
) -> DataFrame:
    """The k rows with the smallest ``(u, *uid_cols)`` per group, where
    ``u = rng_draw(*uid_cols, salt)`` — the canonical order-sample state.

    The plan is ONE rank window, and the merge-combiner comes from
    Catalyst: the ``row_number() <= k`` filter is rewritten into a
    ``WindowGroupLimit Partial`` BEFORE the hash exchange (each map task
    forwards at most k rows per group — exactly the bottom-k merge
    identity, executed JVM-side inside the scan stage) plus a ``Final``
    after it, so at most k·n_tasks rows per group ever shuffle. A first
    cut implemented the partial by hand as a ``mapInPandas`` fold; the
    executed plan showed Catalyst's partial ALREADY capping map-side,
    leaving the pandas stage nothing to do but push the whole input
    through an Arrow round trip — the JVM form is strictly better
    (plan shape pinned in tests/test_quantile_sketch.py).
    Output: input columns plus ``u``.
    """
    with_u = df.withColumn("u", rng_draw(*uid_cols, salt=salt))
    cols = with_u.columns
    w = Window.partitionBy(group_col).orderBy("u", *uid_cols)
    return (
        with_u.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(*cols)
    )


def _rank_pick(q_pct: int, m: Column, rv: Column, value: Column) -> Column:
    """Aggregate picking the sample value at the lower-nearest rank for
    quantile ``q_pct``/100 — integer arithmetic only: rank =
    (q_pct·(m-1)) div 100 + 1, identical to the oracle's ``//``."""
    target = F.floor((F.lit(q_pct) * (m - F.lit(1))) / F.lit(100)) + F.lit(1)
    return F.max(F.when(rv == target, value))


def sketch_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    uid_cols: list[str],
    k: int = QSKETCH_K,
    salt: int = QSKETCH_SALT,
    q_pcts: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """Per-group quantile estimates from the bottom-k order sample, plus
    the exact row count: ``(group, n, m, p{q}...)``. ``n`` comes from one
    combinable count agg over the base frame (broadcast back — one row per
    group); the quantiles are read off the O(k) sample at integer ranks,
    so every emitted value is a raw input double — nothing to round."""
    samp = bottom_k_sample(df, group_col, uid_cols, k=k, salt=salt)
    vw = Window.partitionBy(group_col).orderBy(value_col, *uid_cols)
    mw = Window.partitionBy(group_col)
    ranked = samp.select(
        group_col,
        value_col,
        F.row_number().over(vw).alias("rv"),
        F.count(F.lit(1)).over(mw).cast("bigint").alias("m"),
    )
    est = ranked.groupBy(group_col).agg(
        F.first("m").alias("m"),
        *[
            _rank_pick(q, F.col("m"), F.col("rv"), F.col(value_col)).alias(f"p{q}")
            for q in q_pcts
        ],
    )
    n = df.groupBy(group_col).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return est.join(F.broadcast(n), group_col).select(
        group_col, "n", "m", *[f"p{q}" for q in q_pcts]
    )
