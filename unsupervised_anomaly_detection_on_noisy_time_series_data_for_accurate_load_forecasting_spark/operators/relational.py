"""Core relational operators (SURVEY.md §2.2-§2.8, SQL-class rows).

These are the Catalyst-native layer: declarative DataFrame plans where
projection/filter pushdown, join selection, and whole-stage codegen are free.
Scale notes per operator are in the docstrings — the guiding rule is: small
dims broadcast, fact-fact joins shuffle on their keys, aggregates are partial
(map-side) by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exact import davg, dsum


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: scan → filter → partial agg → final agg.

    One shuffle on a 6-value grouping key; everything before it is map-side.
    Exercises A2-style arithmetic and decimal-exact sums (see functions.exact).
    """
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def regional_revenue(
    region: DataFrame, nation: DataFrame, customer: DataFrame, orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """TPC-H-Q5-shaped star join: fact (lineitem⋈orders) with broadcast dims.

    region/nation are tiny at any scale → broadcast. customer is mid-size →
    let AQE decide (broadcastable at test SF, shuffle-hash at 100 TB).
    lineitem⋈orders is the one real shuffle, on orderkey.
    """
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("r_name", "n_name")
        .agg(dsum(revenue).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


def top_customers(customer: DataFrame, orders: DataFrame, lineitem: DataFrame, k: int = 10) -> DataFrame:
    """O3-style deterministic top-k: rank with an explicit key tiebreak.

    Revenue is decimal-exact and the sort key (revenue DESC, custkey ASC) is
    unique per row, so ORDER BY + LIMIT is deterministic — and Catalyst
    executes it as TakeOrderedAndProject: per-partition top-k heaps merged on
    the driver, never a single-task global Window over every customer. The
    rank column is assigned afterwards over just the k survivors.
    """
    from pyspark.sql import Window as W

    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_cust = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(dsum(revenue).alias("revenue"))
    )
    order_cols = [F.col("revenue").desc(), F.col("o_custkey").asc()]
    topk = per_cust.orderBy(*order_cols).limit(k)
    w = W.orderBy(*order_cols)  # over k rows only — trivially single-task
    return (
        F.broadcast(topk.withColumn("rk", F.row_number().over(w)))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("c_name").alias("cust_name"),
            F.col("revenue"),
            F.col("rk"),
        )
    )


def order_priority_counts(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H-Q4-shaped EXISTS: left-semi join instead of a distinct+inner.

    Semi join never duplicates the left side and streams the right — the
    Catalyst plan at scale is a shuffle on orderkey with early termination
    per key, strictly better than join+dropDuplicates.
    """
    big_items = lineitem.select("l_orderkey").filter(F.col("l_quantity") > 45)
    has_item = orders.join(big_items, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
    return has_item.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


def market_share_by_segment(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Segment rollup with a conditional aggregate (A10-style confusion math)."""
    return (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_finished"),
            dsum("o_totalprice").alias("total_price"),
        )
    )
