"""Core relational operators (SURVEY.md §2.2-§2.8, SQL-class rows).

These are the Catalyst-native layer: declarative DataFrame plans where
projection/filter pushdown, join selection, and whole-stage codegen are free.
Scale notes per operator are in the docstrings — the guiding rule is: small
dims broadcast, fact-fact joins shuffle on their keys, aggregates are partial
(map-side) by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.exact import davg, dsum, qround


def pricing_summary(lineitem: DataFrame, salt_buckets: int = 1) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: scan → filter → partial agg → final agg.

    One shuffle on a 6-value grouping key; everything before it is map-side.
    Exercises A2-style arithmetic and decimal-exact sums (see functions.exact).

    r15: the sums run two-level on the int64 micro-unit lattice —
    per row floor(x·1e6 + 0.5) as a long (exactly the value dec()
    quantizes to), long partials per (group, salt bucket), then one exact
    decimal sum of the ≤ ``salt_buckets`` partials per group and a single
    decimal→double rounding identical to dsum's. Integer partition of a
    sum is associative, so the result is bit-identical to the decimal
    aggregation while the per-row accumulation is long adds instead of
    BigDecimal (noop-sink 1.8 s → ~0.5 s at sf0.1). ``salt_buckets``
    bounds each bucket's micro-unit sum below 2^63: callers derive it
    from input size (~1 per 512 MB of fact input, i.e. 1 at test SFs,
    thousands at 100 TB — see queries_relational.q1_pricing_summary)."""
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))

    def mu(c) -> F.Column:
        c = F.col(c) if isinstance(c, str) else c
        return F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("long")

    salt = F.pmod(F.xxhash64("l_orderkey"), F.lit(int(salt_buckets))).alias("_salt")
    partial = (
        lineitem.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus", salt)
        .agg(
            F.sum(mu("l_quantity")).alias("_q"),
            F.sum(mu("l_extendedprice")).alias("_p"),
            F.sum(mu(disc_price)).alias("_d"),
            F.sum(mu(charge)).alias("_c"),
            F.sum(mu("l_discount")).alias("_disc"),
            F.count("l_quantity").alias("_nq"),
            F.count("l_extendedprice").alias("_np"),
            F.count("l_discount").alias("_nd"),
            F.count(F.lit(1)).alias("_n"),
        )
    )

    def fin(partial_col: str) -> F.Column:
        # exact Σ micro / 1e6 as decimal, then ONE rounding to double —
        # the same single rounding dsum's decimal-sum→double cast performs
        return (
            F.sum(partial_col).cast("decimal(38,0)")
            / F.lit(1000000).cast("decimal(7,0)")
        ).cast("double")

    return partial.groupBy("l_returnflag", "l_linestatus").agg(
        fin("_q").alias("sum_qty"),
        fin("_p").alias("sum_base_price"),
        fin("_d").alias("sum_disc_price"),
        fin("_c").alias("sum_charge"),
        (fin("_q") / F.sum("_nq").cast("double")).alias("avg_qty"),
        (fin("_p") / F.sum("_np").cast("double")).alias("avg_price"),
        (fin("_disc") / F.sum("_nd").cast("double")).alias("avg_disc"),
        F.sum("_n").alias("count_order"),
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


def bloom_filter_bitmap(
    keys: DataFrame, key_col: str, m_bits: int = 1024, n_hashes: int = 3
) -> DataFrame:
    """One-row DataFrame holding a bloom filter over ``keys[key_col]`` as an
    ``array<bigint>`` bitmap (``m_bits``/64 words).

    The scale rationale: a semi-join reducer. At 100 TB the fact side
    dominates; shipping a kilobyte-scale bitmap to every task and dropping
    non-joining rows BEFORE the join's shuffle removes most of the exchange
    volume. Spark's own runtime bloom (spark.sql.optimizer.runtime.
    bloomFilter) does this opportunistically; the explicit operator makes
    the reduction part of the plan contract, works across stages/queries,
    and its bitmap is mergeable (bit-OR) across builds.

    All JVM-side: positions via xxhash64 with per-hash seeds, bitmap via an
    ``aggregate`` HOF over the collected distinct positions (collect_set is
    bounded by m_bits — driver-safe by construction)."""
    pos = [F.expr(_bloom_pos(key_col, i, m_bits)) for i in range(n_hashes)]
    n_words = m_bits // 64
    positions = keys.select(F.explode(F.array(*pos)).alias("p")).distinct()
    return positions.agg(
        F.expr(
            f"aggregate(collect_set(p), array_repeat(0L, {n_words}), "
            "(acc, p) -> transform(acc, (w, i) -> "
            "IF(i = CAST(p div 64 AS INT), w | shiftleft(1L, CAST(p % 64 AS INT)), w)))"
        ).alias("bloom")
    )


def _bloom_pos(key_col: str, i: int, m_bits: int) -> str:
    """SQL text for hash-``i``'s bit position of ``key_col`` — one shared
    builder so the bitmap build and the membership probe can never use
    different hash constructions."""
    return f"pmod(xxhash64({key_col}, CAST({i * 2654435761} AS BIGINT)), {m_bits})"


def bloom_might_contain(key_col: str, m_bits: int = 1024, n_hashes: int = 3):
    """Predicate Column: all ``n_hashes`` bit positions of ``key_col`` are
    set in the broadcast ``bloom`` bitmap column (no false negatives — safe
    as a pre-join pruning filter)."""
    conds = []
    for i in range(n_hashes):
        p = _bloom_pos(key_col, i, m_bits)
        conds.append(
            f"((element_at(bloom, CAST(({p}) div 64 AS INT) + 1)"
            f" >> CAST(({p}) % 64 AS INT)) & 1) = 1"
        )
    return F.expr(" AND ".join(conds))


def bloom_pruned_segment_revenue(
    customer: DataFrame, orders: DataFrame, segment: str = "BUILDING"
) -> DataFrame:
    """Order-priority revenue for one customer segment, with the fact side
    bloom-pruned before the join: build the bitmap over the segment's
    custkeys, broadcast it, drop non-candidate orders pre-shuffle, then run
    the exact broadcast join (bloom false positives are eliminated by the
    join itself — result is bit-identical to the plain join, which is what
    the oracle checks)."""
    seg = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    bloom = bloom_filter_bitmap(seg, "c_custkey")
    pruned = orders.crossJoin(F.broadcast(bloom)).filter(
        bloom_might_contain("o_custkey")
    )
    return (
        pruned.join(
            F.broadcast(seg), F.col("o_custkey") == F.col("c_custkey"), "inner"
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
    )


def rollup_region_revenue(
    orders: DataFrame, customer: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """ROLLUP hierarchy totals (region -> nation -> grand total): Catalyst's
    Expand produces every prefix level inside ONE shuffle, partial-aggregated
    map-side like any groupBy — the hierarchy report shape at any scale."""
    j = (
        orders.join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return j.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("revenue")
    )


def nation_revenue_deciles(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, n_tiles: int = 10
) -> DataFrame:
    """Per-nation revenue deciles: rank each nation's customers into
    ``n_tiles`` equal-count bands by exact revenue and aggregate the band.
    The window partitions by NATION — bounded partitions (a nation's
    customers), never the single-task global ntile a naive decile query
    compiles to (the anti-pattern tests/test_plans.py hunts). The ordering
    key (revenue, custkey) is unique per row, so tile assignment is
    deterministic and identical in the SQL mirror.

    Scale shape: the heavy lineitem⋈orders revenue aggregate is map-side
    combinable; only the skinny (custkey, nation, revenue) frame enters
    the window; the final per-(nation, tile) rollup is combinable again.
    """
    from pyspark.sql import Window as W

    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_cust = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(dsum(revenue).alias("revenue"))
        .join(
            customer.select(
                F.col("c_custkey").alias("o_custkey"), "c_nationkey"
            ),
            "o_custkey",
        )
    )
    w = W.partitionBy("c_nationkey").orderBy(
        F.col("revenue").desc(), F.col("o_custkey").asc()
    )
    tiled = per_cust.withColumn("decile", F.ntile(n_tiles).over(w))
    return tiled.groupBy(
        F.col("c_nationkey").alias("nationkey"), "decile"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_custs"),
        dsum(F.col("revenue")).alias("revenue_sum"),
    )


def retention_cohorts(orders: DataFrame) -> DataFrame:
    """Monthly retention-cohort matrix — the standard product-analytics
    triangle: customers are assigned to the month of their FIRST order
    (the cohort), and for each (cohort, months-since) cell we count how
    many of them placed an order, as an absolute count and as a share of
    the cohort size.

    Cross-engine discipline: months are the integer lattice
    ``year·12 + month`` (no engine date subtraction), the retention share
    is one bigint/bigint double division (IEEE-exact in every engine).

    Scale shape: min-per-customer and distinct-(customer, month) are both
    map-side combinable; the customer-keyed join shuffles once on
    custkey; the cohort-size join is a broadcast of #months rows. No
    window, no sort.

    Output: (cohort_month DATE, offset, active, cohort_n, retention).
    """
    mkey = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("mkey")
    firsts = orders.groupBy("o_custkey").agg(F.min(mkey.cast("int")).alias("mkey0"))
    activity = orders.select("o_custkey", mkey.cast("int").alias("mkey")).distinct()
    cohort_n = firsts.groupBy("mkey0").agg(F.count(F.lit(1)).cast("bigint").alias("cohort_n"))
    per = (
        activity.join(firsts, "o_custkey")
        .groupBy("mkey0", (F.col("mkey") - F.col("mkey0")).alias("m_offset"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("active"))
    )
    return per.join(F.broadcast(cohort_n), "mkey0").select(
        F.make_date(
            F.floor((F.col("mkey0") - 1) / F.lit(12.0)).cast("int"),
            (F.pmod(F.col("mkey0") - 1, F.lit(12)) + 1).cast("int"),
            F.lit(1),
        ).alias("cohort_month"),
        F.col("m_offset").cast("int").alias("m_offset"),
        "active",
        "cohort_n",
        (F.col("active").cast("double") / F.col("cohort_n").cast("double")).alias("retention"),
    )


def rfm_segments(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Per-nation RFM (recency / frequency / monetary) quintile
    segmentation — the classic CRM cube: each customer gets three 1–5
    scores via ``ntile(5)`` within their nation, and the output is the
    per-(nation, R, F, M) cell with its population and exact monetary sum.

    Determinism: every ntile ordering carries the custkey tiebreak, so
    tile assignment is unique; recency is an integer day count against
    the global max order date (broadcast 1-row aggregate, no driver
    collect); monetary is the decimal-exact per-customer sum.

    Scale shape: the per-customer rollup is one combinable agg; the three
    windows are NATION-bounded (never a single-task global ntile); the
    1-row max-date frame and the nation column join stay broadcast.
    """
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        dsum(F.col("o_totalprice")).alias("monetary"),
    )
    maxd = orders.agg(F.max("o_orderdate").alias("max_date"))
    base = (
        per_cust.crossJoin(F.broadcast(maxd))
        .withColumn("recency_days", F.datediff(F.col("max_date"), F.col("last_order")))
        .join(
            customer.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey"),
            "o_custkey",
        )
    )
    wn = lambda *order: W.partitionBy("c_nationkey").orderBy(*order)
    tiled = base.select(
        "c_nationkey",
        "monetary",
        F.ntile(5).over(wn(F.col("recency_days").asc(), F.col("o_custkey").asc())).alias("r_q"),
        F.ntile(5).over(wn(F.col("freq").desc(), F.col("o_custkey").asc())).alias("f_q"),
        F.ntile(5).over(wn(F.col("monetary").desc(), F.col("o_custkey").asc())).alias("m_q"),
    )
    return tiled.groupBy("c_nationkey", "r_q", "f_q", "m_q").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_custs"),
        dsum(F.col("monetary")).alias("monetary_sum"),
    )


def gini_revenue(customer: DataFrame, orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Per-nation Gini coefficient of customer revenue — the inequality
    measure on the exact rank-weighted form
    ``G = (2·Σ rk·x_rk − (n+1)·Σx) / (n·Σx)`` with ranks ascending.

    Cross-engine discipline: per-customer revenue is the decimal-exact
    sum cast to double (identical in both engines); ``rk·x`` is one
    IEEE-exact double product re-quantized through the same decimal sum;
    the closing expression is pure +,−,×,/ — no libm anywhere.

    Scale shape: the heavy lineitem⋈orders rollup is combinable before
    the window; only the skinny (nation, custkey, revenue) frame enters
    the NATION-bounded rank window; final agg is combinable.

    Output: (nationkey, n_custs, revenue_sum, gini).
    """
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_cust = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(dsum(revenue).alias("revenue"))
        .join(
            customer.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey"),
            "o_custkey",
        )
    )
    w = W.partitionBy("c_nationkey").orderBy(F.col("revenue").asc(), F.col("o_custkey").asc())
    ranked = per_cust.withColumn("rk", F.row_number().over(w))
    agg = ranked.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_custs"),
        dsum(F.col("revenue")).alias("revenue_sum"),
        dsum(F.col("rk").cast("double") * F.col("revenue")).alias("rk_rev_sum"),
    )
    n = F.col("n_custs").cast("double")
    t = F.col("revenue_sum")
    gini = (F.lit(2.0) * F.col("rk_rev_sum") - (n + F.lit(1.0)) * t) / (n * t)
    return agg.select(
        "nationkey", "n_custs", "revenue_sum", qround(gini, 9).alias("gini")
    )


def shipping_priority(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, k: int = 10
) -> DataFrame:
    """TPC-H-Q3-shaped shipping priority: revenue of not-yet-shipped
    lineitems for BUILDING-segment orders placed before the cutoff,
    top-``k`` by (revenue DESC, orderkey ASC).

    Scale shape: the segment filter reduces customer before its join
    (semi-join pruning Catalyst pushes through); the one real shuffle is
    lineitem⋈orders on orderkey with the date predicates pushed to both
    scans; the grouped frame is per-order (skinny) and the top-k compiles
    to TakeOrderedAndProject — per-partition heaps, no global sort.
    """
    cutoff = F.lit("1998-03-15").cast("timestamp")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter(F.col("l_shipdate") > cutoff)
        .join(orders.filter(F.col("o_orderdate") < cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(k)
    )


def returned_items(
    customer: DataFrame, nation: DataFrame, orders: DataFrame, lineitem: DataFrame, k: int = 20
) -> DataFrame:
    """TPC-H-Q10-shaped returned-item report: the ``k`` customers who
    returned the most revenue in a quarter, with their nation.

    Scale shape: returnflag + quarter predicates push to the scans; one
    orderkey shuffle, one custkey combine; nation broadcast; top-k is
    TakeOrderedAndProject on the skinny per-customer frame.
    """
    lo = F.lit("1997-10-01").cast("timestamp")
    hi = F.lit("1998-01-01").cast("timestamp")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(k)
    )


def large_orders(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, qty_threshold: int = 250
) -> DataFrame:
    """TPC-H-Q18-shaped large-volume orders: orders whose total lineitem
    quantity exceeds the threshold, with customer attribution — the
    GROUP BY + HAVING pattern.

    Scale shape: the per-order quantity rollup is combinable BEFORE any
    join (the aggregate-then-join rewrite of Q18 — never join-then-
    aggregate the wide frame); the surviving orders are a tiny fraction,
    so the orders/customer joins run on the filtered skinny side.
    """
    per_order = (
        lineitem.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > F.lit(float(qty_threshold)))
    )
    return (
        per_order.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("cust_name"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
            "sum_qty",
        )
    )


def promo_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H-Q14-shaped promotion effect: the share of one month's revenue
    attributable to PROMO-type parts, as one conditional-aggregate row.

    Scale shape: the shipdate predicate pushes to the lineitem scan; the
    partkey join is the one shuffle (AQE broadcasts part when it fits);
    both sums are decimal-exact conditional aggregates in a single pass;
    the final percentage is one IEEE double division.
    """
    lo = F.lit("1997-09-01").cast("timestamp")
    hi = F.lit("1997-10-01").cast("timestamp")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            dsum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))).alias(
                "promo_rev"
            ),
            dsum(rev).alias("total_rev"),
        )
        .select(
            "promo_rev",
            "total_rev",
            (F.lit(100.0) * F.col("promo_rev") / F.col("total_rev")).alias("promo_pct"),
        )
    )


def volume_shipping(
    supplier: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation_a: str = "NATION_3",
    nation_b: str = "NATION_7",
) -> DataFrame:
    """TPC-H-Q7-shaped volume shipping: bilateral trade revenue between two
    nations by ship year — the two-role dimension pattern (nation joined
    once for the supplier side, once for the customer side).

    Scale shape: the two-nation predicate reaches BOTH tiny broadcast
    nation dims, which prunes supplier and customer before the fact joins
    (semi-join reduction through broadcast); lineitem⋈orders on orderkey
    is the one real shuffle; the year rollup is combinable.
    """
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pair = [nation_a, nation_b]
    n1 = nation.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("s_nationkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("c_nationkey"), F.col("n_name").alias("cust_nation")
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), "s_nationkey")
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), "c_nationkey")
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(rev).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


def brand_basket_lift(lineitem: DataFrame, part: DataFrame, min_co: int = 3) -> DataFrame:
    """Market-basket association mining over order baskets: for every
    brand pair co-occurring in an order, the support and lift
    (``lift = P(a,b) / (P(a)·P(b))``) — the screen behind "frequently
    bought together".

    Scale shape: the basket frame is distinct (order, brand) — orders
    have a bounded line count, so the orderkey self-join explodes at most
    C(|basket|, 2) pairs per order (never all-pairs across orders); pair
    and brand counts are combinable; the brand marginals (|brands|² max
    rows) and the 1-row order count are broadcast. Lift/support are pure
    IEEE double ratios of exact integer counts.
    """
    ob = (
        lineitem.select("l_orderkey", "l_partkey")
        .join(part.select(F.col("p_partkey").alias("l_partkey"), "p_brand"), "l_partkey")
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    n_orders = ob.agg(F.countDistinct("l_orderkey").cast("bigint").alias("n_orders"))
    a, b = ob.alias("a"), ob.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand_a"), F.col("b.p_brand").alias("brand_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("co"))
        .filter(F.col("co") >= min_co)
    )
    bc = ob.groupBy("p_brand").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    co_d = F.col("co").cast("double")
    n_d = F.col("n_orders").cast("double")
    return (
        pairs.join(
            F.broadcast(bc.select(F.col("p_brand").alias("brand_a"), F.col("cnt").alias("n_a"))),
            "brand_a",
        )
        .join(
            F.broadcast(bc.select(F.col("p_brand").alias("brand_b"), F.col("cnt").alias("n_b"))),
            "brand_b",
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            "brand_a",
            "brand_b",
            "co",
            "n_a",
            "n_b",
            (co_d / n_d).alias("support"),
            (
                (co_d * n_d)
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("lift"),
        )
    )


BENFORD_E = None  # computed once below: log10(1 + 1/d), d = 1..9


def _benford_expected() -> list[float]:
    global BENFORD_E
    if BENFORD_E is None:
        import math

        BENFORD_E = [math.log10(1.0 + 1.0 / d) for d in range(1, 10)]
    return BENFORD_E


def benford_deviation(
    df: DataFrame, value_col: str, group_col: str
) -> DataFrame:
    """Benford's-law deviation per group — the fabricated-data screen
    auditors run on financial columns: compare the observed leading-digit
    distribution of ``value_col`` against log10(1 + 1/d) and report the
    total variation distance.

    Cross-engine discipline: the leading digit comes from the INTEGER part
    rendered as a string (int→string is identical in every engine — no
    float log10, no float formatting); the expected shares are Python
    double literals embedded identically in both programs, so no log is
    ever computed by either engine; each |observed − expected| term is
    quantized to the 1e-6 lattice before the integer term-sum (missing
    digits contribute their full expected share via the 9-digit spine).

    Scale shape: one combinable (group, digit) count, a 9-row broadcast
    spine, one combinable term-sum — no window, no sort.

    Output: (group, n_values, tvd) with tvd = 0.5·Σ|o_d − e_d|.
    """
    e = _benford_expected()
    vals = df.filter(F.col(value_col) >= 1).select(
        F.col(group_col).alias("grp"),
        F.substring(
            F.floor(F.col(value_col)).cast("bigint").cast("string"), 1, 1
        ).cast("int").alias("digit"),
    )
    counts = vals.groupBy("grp", "digit").agg(F.count(F.lit(1)).alias("c"))
    n = vals.groupBy("grp").agg(F.count(F.lit(1)).alias("n"))
    spine = n.select(
        "grp", "n", F.explode(F.sequence(F.lit(1), F.lit(9))).alias("digit")
    )
    e_case = F.element_at(
        F.array(*[F.lit(x) for x in e]), F.col("digit")
    )
    terms = (
        spine.join(counts, ["grp", "digit"], "left")
        .withColumn("c", F.coalesce("c", F.lit(0)))
        .withColumn("_e", e_case)
        .withColumn(
            "t",
            F.expr(
                "cast(floor(abs(cast(c as double) / cast(n as double) - _e) "
                "* 1000000.0D + 0.5D) as bigint)"
            ),
        )
    )
    return terms.groupBy(F.col("grp")).agg(
        F.max("n").cast("bigint").alias("n_values"),
        (F.sum("t").cast("double") / F.lit(2e6)).alias("tvd"),
    )


def kanonymity_report(customer: DataFrame, k: int = 5) -> DataFrame:
    """k-anonymity screen over the quasi-identifier tuple
    (nation, market segment, account-balance bucket) — the privacy gate a
    training-data pipeline runs before releasing joined customer
    attributes: any QI group with fewer than ``k`` members re-identifies
    its rows and must be suppressed or generalized.

    Scale shape: one combinable groupBy over the QI columns (bounded
    cardinality: |nations|·|segments|·|buckets|); the flag is a pure
    integer comparison. The balance bucket is floor(bal/1000) — floor
    division is engine-identical for negatives too.

    Output: (nationkey, segment, bal_bucket, group_n, anonymous).
    """
    bucket = F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("int")
    return (
        customer.groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_mktsegment").alias("segment"),
            bucket.alias("bal_bucket"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("group_n"))
        .withColumn("anonymous", F.col("group_n") >= F.lit(k))
    )


def customer_order_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H-Q13-shaped customer distribution: how many customers placed
    exactly k orders, INCLUDING the zero-order customers a plain inner
    join silently drops — the left-outer + two-level aggregation pattern.

    Scale shape: the per-customer order count is one combinable agg on the
    orders side BEFORE the join (aggregate-then-join, so the left outer
    join carries one row per customer, not per order); the distribution
    rollup is a second combinable agg over the skinny count frame.
    """
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_count")
    )
    return (
        customer.select("c_custkey")
        .join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(F.coalesce(F.col("c_count"), F.lit(0)).cast("bigint").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
    )


def top_supplier(supplier: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H-Q15-shaped top supplier: suppliers achieving the maximum
    quarterly revenue — the aggregate → global-max → join-back pattern
    (ties preserved, unlike a LIMIT 1).

    Scale shape: per-supplier revenue is combinable; the global max is a
    broadcast 1-row frame (never a single-task window); the equality
    join-back touches only the max achievers; decimal-exact revenue makes
    the max/equality bit-stable across engines.
    """
    lo = F.lit("1997-01-01").cast("timestamp")
    hi = F.lit("1997-04-01").cast("timestamp")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_supp = (
        lineitem.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy("l_suppkey")
        .agg(dsum(rev).alias("total_revenue"))
    )
    mx = per_supp.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        per_supp.join(F.broadcast(mx), F.col("total_revenue") == F.col("max_revenue"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supp_name"),
            "total_revenue",
        )
    )


def discounted_brand_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H-Q19-shaped OR-of-conjunctions revenue: three brand/size/
    quantity clauses OR-ed together — the predicate-pushdown stress shape
    (Catalyst extracts the common partkey equi-join and pushes the
    residual disjunction below/into the join).

    Scale shape: the disjunction's common subexpressions (quantity and
    size bounds) prune both scans; the partkey join is the one shuffle;
    one decimal-exact conditional-free aggregate row.
    """
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15)) & q.between(1, 21))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(1, 30)) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 45)) & q.between(20, 40))
    )
    return (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            dsum(rev).alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
    )


def forecast_revenue_change(lineitem: DataFrame) -> DataFrame:
    """TPC-H-Q6-shaped forecast revenue change: one year's revenue that
    would vanish if small-quantity discounted lines were dropped.

    Scale shape: the canonical scan-only aggregate — all three predicates
    (shipdate range, discount band, quantity cap) push to the parquet scan,
    no join, one map-side-combinable decimal-exact sum. The query the
    planner must never shuffle for.
    """
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
    )


def national_market_share(
    region_: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    target_nation: str = "NATION_5",
) -> DataFrame:
    """TPC-H-Q8-shaped national market share: within ASIA customers' PROMO
    purchases, the fraction supplied by ``target_nation``, per order year.

    Scale shape: the two-role nation dimension again (customer side filters
    through region, supplier side labels the numerator) — both broadcast;
    part's type filter prunes the fact before the orderkey shuffle; the
    share is a conditional decimal sum over one grouped pass, then an IEEE
    double ratio quantized 1e-6.
    """
    cust_asia = (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region_), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey")
    )
    supp_nat = (
        supplier.join(
            F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "supp_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_type") == "PROMO").select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_asia, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(supp_nat, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    tgt = F.when(F.col("supp_nation") == target_nation, rev).otherwise(F.lit(0.0))
    return (
        base.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            dsum(tgt).alias("nation_rev"),
            dsum(rev).alias("total_rev"),
        )
        .withColumn("mkt_share", qround(F.col("nation_rev") / F.col("total_rev"), 6))
    )


def product_type_profit(
    nation: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    name_substr: str = "gear",
) -> DataFrame:
    """TPC-H-Q9-shaped product profit by supplier nation and year, for
    parts whose name contains ``name_substr``. The reference Q9 nets out
    partsupp supply cost; this corpus has no partsupp table, so profit is
    the discounted revenue — the join/rollup shape is the point.

    Scale shape: part's substring filter cannot push below the scan but
    prunes the broadcast build side to a fraction of an already-small dim;
    supplier⋈nation broadcasts; the only fact-fact shuffle is
    lineitem⋈orders on orderkey; the (nation, year) rollup is combinable.
    """
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    supp_nat = supplier.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name"))),
        F.col("s_nationkey") == F.col("sn_key"),
    ).select("s_suppkey", "n_name")
    return (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_name").contains(name_substr)).select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(orders.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp_nat, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            dsum(amount).alias("sum_profit"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
    )


def parts_supplier_relationship(
    supplier: DataFrame, part: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """TPC-H-Q16-shaped parts/supplier relationship: distinct suppliers able
    to supply each (brand, type, size) bucket, excluding one brand, one
    type, off-list sizes, and flagged suppliers. The reference walks
    partsupp; this corpus's part-supplier bridge is lineitem, and the
    "customer complaints" exclusion becomes the negative-balance supplier
    list — the NOT-IN anti-join shape is preserved.

    Scale shape: the flagged-supplier list is tiny (anti-join broadcasts);
    part filters prune the broadcast dim; countDistinct shuffles once on
    the (brand, type, size) key with partial dedup map-side.
    """
    flagged = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    p = part.filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(flagged), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


def small_quantity_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H-Q17-shaped small-quantity order revenue: yearly revenue lost
    if orders below 20 % of a part's average quantity were no longer taken,
    for one brand + type bucket.

    Scale shape: the correlated avg becomes aggregate-then-join-back (one
    grouped pass over the filtered fact, re-joined on partkey). The 20 %
    threshold is evaluated in INTEGERS — qty·5·n_lines < Σqty — so both
    engines agree bit-exactly with no decimal/average rounding at the
    boundary (quantities are integral by schema contract).
    """
    p = part.filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    ).select("p_partkey")
    li = lineitem.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")).select(
        "l_partkey", F.col("l_quantity").cast("bigint").alias("qty"), "l_extendedprice"
    )
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("qty").alias("qsum"), F.count(F.lit(1)).alias("qcnt")
    )
    small = li.join(per_part, F.col("l_partkey") == F.col("pk")).filter(
        F.col("qty") * 5 * F.col("qcnt") < F.col("qsum")
    )
    return small.agg(
        qround(dsum("l_extendedprice") / F.lit(7.0), 6).alias("avg_yearly"),
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
    )


def waiting_suppliers(
    supplier: DataFrame,
    nation: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supp_nation: str = "NATION_2",
    k: int = 20,
) -> DataFrame:
    """TPC-H-Q21-shaped suppliers who kept orders waiting: suppliers from
    one nation whose line in a finalized multi-supplier order came back
    flagged while EVERY co-supplier's lines were clean. The reference keys
    "late" on receipt-vs-commit dates this corpus lacks; the return flag
    'R' is the fault marker — the EXISTS / NOT-EXISTS double-correlation
    shape is the point.

    Scale shape: both correlations are order-key semi/anti joins of
    pre-aggregated per-order supplier sets (never per-line self-joins):
    exists(other supplier) = distinct-supplier count ≥ 2; not-exists(other
    faulty supplier) = the order's distinct FAULTY suppliers == {me}. One
    orderkey shuffle builds both counts; the final rollup is per supplier
    name with a TakeOrdered top-k.
    """
    f_orders = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    li = lineitem.join(f_orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_faulty"),
    )
    nat_supp = supplier.join(
        F.broadcast(
            nation.filter(F.col("n_name") == supp_nation).select("n_nationkey")
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    faulty_lines = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .join(nat_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_faulty") == 1))
    )
    return (
        faulty_lines.groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(k)
    )


def lapsed_high_balance_customers(
    customer: DataFrame,
    nation: DataFrame,
    orders: DataFrame,
    cutoff: str = "1999-01-01",
) -> DataFrame:
    """TPC-H-Q22-shaped global sales opportunity: per nation, the count and
    total balance of above-average-balance customers with NO recent orders
    (none since ``cutoff``). The reference buckets by phone country code
    this corpus lacks; nation is the bucket — the scalar-average filter +
    anti-join shape is the point.

    Scale shape: the positive-balance average is a 1-row broadcast (the
    q15 global-max pattern, never a window); the no-recent-orders test is
    an anti join against the date-filtered orders scan; the average is the
    decimal-exact-sum-over-count double (davg), so the raw-double boundary
    comparison is bit-identical in both engines.
    """
    avg_pos = customer.filter(F.col("c_acctbal") > 0).agg(
        davg("c_acctbal").alias("_avg")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit(cutoff).cast("timestamp")
    ).select("o_custkey")
    return (
        customer.join(F.broadcast(avg_pos), F.col("c_acctbal") > F.col("_avg"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )


def min_cost_supplier(
    region_: DataFrame,
    nation: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    lineitem: DataFrame,
    p_size_max: int = 15,
    p_type: str = "LARGE",
    r_name: str = "EUROPE",
) -> DataFrame:
    """TPC-H-Q2-shaped minimum-cost supplier: for every part in one
    size-range/type bucket, the EUROPE supplier(s) observed offering it at the
    lowest unit price. The reference reads partsupp's supply cost; this
    corpus's observed price book is lineitem (min extendedprice per
    part×supplier), and the correlated min re-joins exactly like Q2's
    subquery — ties preserved.

    Scale shape: part and the region-pruned supplier list broadcast; one
    partkey-grouped min over the pruned fact, then an equality join-back
    on the min (doubles compare exactly — min returns a member, never an
    average); DISTINCT collapses repeat offers at the same price.
    """
    p = part.filter((F.col("p_size") <= p_size_max) & (F.col("p_type") == p_type)).select(
        "p_partkey", "p_name"
    )
    eur_supp = (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region_), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == r_name)
        .select("s_suppkey", "s_name", "n_name")
    )
    offers = (
        lineitem.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(eur_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("p_partkey", "p_name", "l_suppkey", F.col("l_extendedprice").alias("price"))
    )
    best = offers.groupBy(F.col("p_partkey").alias("bk")).agg(F.min("price").alias("min_price"))
    return (
        offers.join(best, (F.col("p_partkey") == F.col("bk")) & (F.col("price") == F.col("min_price")))
        .join(eur_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "p_name", "s_name", "n_name", "min_price")
        .distinct()
    )


def observed_price_book(lineitem: DataFrame) -> DataFrame:
    """partsupp analog derived from the fact table: per (part, supplier)
    pair, the minimum observed unit price (supply-cost analog — min of
    doubles returns a member, so it is cross-engine exact) and the total
    shipped quantity (avail-qty analog — quantities are integer-valued, so
    the BIGINT sum is exact). Closes the TPC-H Q11/Q20 gap the corpus's
    missing partsupp table left open (SURVEY §2.12 X-tpch).

    Scale shape: ONE map-side-combinable groupBy on (partkey, suppkey) —
    the same shuffle key both consumers join on, so AQE can reuse the
    exchange; nothing here is corpus-order-dependent."""
    return lineitem.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(
        F.min("l_extendedprice").alias("ps_supplycost"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("ps_availqty"),
    )


def important_stock_value(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    n_name: str = "NATION_9",
    mult: float = 3.0,
) -> DataFrame:
    """TPC-H-Q11-shaped important stock: per part, the total value
    (supply cost × available quantity) held by one nation's suppliers,
    keeping parts whose value exceeds ``mult`` × the MEAN per-part value.
    (TPC-H's fixed fraction of the grand total is scale-dependent — the
    spec itself divides it by SF; a mean-relative threshold keeps the
    selection non-trivial at every corpus size.)

    The HAVING scalar is a 1-row aggregate over the per-part frame
    (broadcast join of one row); per-part values and the mean's sum are
    decimal-exact, and the threshold multiply is one IEEE op on the exact
    mean — boundary-stable cross-engine."""
    pb = observed_price_book(lineitem)
    nat_supp = (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == n_name)
        .select("s_suppkey")
    )
    val = F.col("ps_supplycost") * F.col("ps_availqty").cast("double")
    g = (
        pb.join(nat_supp, F.col("ps_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("ps_partkey")
        .agg(dsum(val).alias("value"))
    )
    thr = g.agg((davg("value") * F.lit(mult)).alias("_thr"))
    return (
        g.crossJoin(F.broadcast(thr))
        .filter(F.col("value") > F.col("_thr"))
        .select("ps_partkey", "value")
    )


def surplus_stock_suppliers(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    name_prefix: str = "small",
    n_name: str = "NATION_9",
    year_start: str = "1997-01-01",
    year_end: str = "1998-01-01",
) -> DataFrame:
    """TPC-H-Q20-shaped surplus-stock suppliers: one nation's suppliers
    holding, for some part in a name bucket, standing stock (all-time
    shipped quantity — the avail-qty analog) exceeding TWICE what they
    shipped of that part in the probe year. The correlated quantity
    subquery is a (partkey, suppkey) aggregate joined back on the pair key;
    the surplus comparison is pure integer arithmetic (exact cross-engine).

    Scale shape: part-name filter broadcasts into both aggregates; the
    price book and the year aggregate share the (partkey, suppkey) shuffle
    key; the supplier output is a semi join on suppkey."""
    pnames = part.filter(F.col("p_name").startswith(name_prefix)).select("p_partkey")
    pb = observed_price_book(lineitem).join(
        F.broadcast(pnames), F.col("ps_partkey") == F.col("p_partkey"), "left_semi"
    )
    yr = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(year_start).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(year_end).cast("timestamp"))
        )
        .join(F.broadcast(pnames), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("_yq"))
    )
    surplus = (
        pb.join(
            yr,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .filter(F.col("ps_availqty") > 2 * F.col("_yq"))
        .select("ps_suppkey")
    )
    return (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == n_name)
        .join(surplus, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )
