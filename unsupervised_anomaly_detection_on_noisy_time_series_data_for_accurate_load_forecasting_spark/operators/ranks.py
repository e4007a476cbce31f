"""Distributed order statistics without single-task Windows.

A ``Window.orderBy(col)`` with no partitionBy funnels every row through one
task — fine at 10^4 rows, fatal at 10^9. The utilities here compute exact
global cumulative sums with bounded parallelism instead:

1. pick ~``n_buckets`` value boundaries with one ``approxQuantile`` pass;
2. bucket rows by value (value-based, so re-computation of the plan can
   never disagree with itself — no reliance on partition ids staying stable
   across jobs);
3. aggregate exact per-bucket totals (B rows, collected to the driver);
4. cumulate *within* each bucket with a per-bucket Window, and add the
   exact driver-side prefix total of all lower buckets.

The result is EXACT regardless of how approximate the quantile boundaries
are — boundaries only steer parallelism, never values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def value_buckets(df: DataFrame, order_col: str, n_buckets: int = 64, rel_err: float = 1e-3):
    """Return a bucket-id Column for `order_col` from approx quantile
    boundaries. Equal values always land in the same bucket (comparisons are
    value-based), so ties never straddle a boundary."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    try:
        qs = df.stat.approxQuantile(order_col, probs, rel_err)
    except Exception:
        qs = []
    bounds = sorted(set(qs))
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(F.col(order_col) > F.lit(b), F.lit(1)).otherwise(F.lit(0))
    return bucket, bounds


def ordered_cumsum_before(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    out_col: str = "_cum_before",
    n_buckets: int = 64,
) -> DataFrame:
    """Attach `out_col` = exact sum of `weight_col` over all rows whose
    `order_col` sorts strictly before this row's (rows must be unique on
    `order_col`; group first if not). No global single-partition Window:
    per-bucket Windows run in parallel, and cross-bucket prefixes are exact
    driver-side sums over the (tiny) bucket-total table."""
    bucket, _ = value_buckets(df, order_col, n_buckets=n_buckets)
    d = df.withColumn("_bkt", bucket)
    totals = sorted(
        d.groupBy("_bkt").agg(F.sum(weight_col).alias("_w")).collect(),
        key=lambda r: r["_bkt"],
    )
    offsets: dict[int, float] = {}
    acc = 0
    for r in totals:
        offsets[r["_bkt"]] = acc
        acc += r["_w"] or 0
    if offsets:
        pairs = [x for kv in offsets.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
        off = F.coalesce(F.element_at(F.create_map(*pairs), F.col("_bkt")), F.lit(0))
    else:
        off = F.lit(0)
    win = W.partitionBy("_bkt").orderBy(order_col).rowsBetween(W.unboundedPreceding, -1)
    within = F.coalesce(F.sum(weight_col).over(win), F.lit(0))
    return d.withColumn(out_col, (off + within)).drop("_bkt")
