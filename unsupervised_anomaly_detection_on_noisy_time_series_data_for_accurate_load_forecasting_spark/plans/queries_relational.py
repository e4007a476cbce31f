"""Relational query specs (SURVEY.md §2: P1, J-class, A-class, O-class, U1)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import davg_sql, dsum_sql, lit_double, qround_sql
from ..operators import relational as R
from ..sources.readers import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_base_price,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {davg_sql('l_quantity')} AS avg_qty,
           {davg_sql('l_extendedprice')} AS avg_price,
           {davg_sql('l_discount')} AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("P1", "A2", "F6"),
    doc="TPC-H-Q1-shaped pricing summary; decimal-exact sums.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    # salt buckets sized from fact-input bytes (~1 per 512 MB): each
    # bucket's micro-unit partial stays < 2^63 at any scale (1 bucket at
    # test SFs — the salt column is then constant and free).
    try:
        nbytes = os.path.getsize(os.path.join(sf_dir, "lineitem.parquet"))
    except OSError:
        nbytes = 0
    buckets = max(1, -(-nbytes // (512 * 1024 * 1024)))
    return R.pricing_summary(_t(spark, sf_dir, "lineitem"), salt_buckets=buckets)


@register(
    "q5_regional_revenue",
    oracle=f"""
    SELECT r_name, n_name,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY r_name, n_name
    """,
    tags=("J1", "A2"),
    doc="Star join: fact shuffle on orderkey, broadcast dims.",
)
def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.regional_revenue(
        _t(spark, sf_dir, "region"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
    )


@register(
    "o3_top_customers",
    oracle=f"""
    WITH per_cust AS (
        SELECT o_custkey, {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_custkey
    ), ranked AS (
        SELECT o_custkey, revenue,
               row_number() OVER (ORDER BY revenue DESC, o_custkey ASC) AS rk
        FROM per_cust
    )
    SELECT o_custkey AS custkey, c_name AS cust_name, revenue, CAST(rk AS INTEGER) AS rk
    FROM ranked JOIN customer ON o_custkey = c_custkey
    WHERE rk <= 10
    """,
    tags=("O2", "O3", "W4"),
    doc="Deterministic top-k by exact revenue with key tiebreak.",
)
def o3_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.top_customers(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
    )


@register(
    "j_semi_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    GROUP BY o_orderpriority
    """,
    tags=("J3",),
    doc="EXISTS as left-semi join (no duplication, early-out per key).",
)
def j_semi_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.order_priority_counts(_t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem"))


@register(
    "a10_segment_rollup",
    oracle=f"""
    SELECT c_mktsegment,
           count(*) AS n_orders,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
           {dsum_sql('o_totalprice')} AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    tags=("A10", "A13"),
    doc="Conditional aggregates (confusion-count pattern A10).",
)
def a10_segment_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.market_share_by_segment(_t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders"))


@register(
    "j_bloom_prune",
    oracle=f"""
    SELECT o_orderpriority, count(*) AS n_orders,
           {dsum_sql('o_totalprice')} AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderpriority
    """,
    tags=("J3", "J1", "SKEW-salt"),
    doc="Explicit bloom-filter semi-join reduction: a 1 KiB bitmap over the "
    "BUILDING custkeys is broadcast and non-candidate orders drop BEFORE "
    "the join — at 100 TB this removes most of the exchange volume (the "
    "runtime-filter technique, made a plan contract). Bloom has no false "
    "negatives and the exact join removes false positives, so the result "
    "is bit-identical to the plain join the oracle runs.",
)
def j_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.bloom_pruned_segment_revenue(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    )


@register(
    "rollup_region_revenue",
    oracle=f"""
    SELECT r_name, n_name, count(*) AS n_orders,
           {dsum_sql('o_totalprice')} AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    tags=("CUBE", "A10", "J1"),
    doc="ROLLUP hierarchy totals (region -> nation -> grand total): one "
    "shuffle producing every prefix level via Expand, partial-aggregated "
    "map-side like any groupBy — completes the grouping-sets family next "
    "to cube_order_stats.",
)
def rollup_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.rollup_region_revenue(
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "region"),
    )


@register(
    "a_nation_revenue_deciles",
    oracle=f"""
    WITH per_cust AS (
      SELECT o_custkey, {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_custkey
    ),
    tiled AS (
      SELECT c.c_nationkey AS nationkey, p.revenue,
             ntile(10) OVER (PARTITION BY c.c_nationkey
                             ORDER BY p.revenue DESC, p.o_custkey ASC) AS decile
      FROM per_cust p JOIN customer c ON p.o_custkey = c.c_custkey
    )
    SELECT nationkey, CAST(decile AS INTEGER) AS decile,
           CAST(count(*) AS BIGINT) AS n_custs,
           {dsum_sql('revenue')} AS revenue_sum
    FROM tiled GROUP BY 1, 2
    """,
    tags=("O1", "O2", "A6"),
    doc="Per-nation revenue deciles: ntile over NATION-bounded windows "
    "(never the single-task global ntile a naive decile query compiles "
    "to), deterministic tile assignment via the unique (revenue, custkey) "
    "ordering, exact decimal revenue. Heavy join+agg is map-side "
    "combinable; only the skinny per-customer frame enters the window.",
)
def a_nation_revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.nation_revenue_deciles(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
    )


def _benford_oracle() -> str:
    from ..operators.relational import _benford_expected

    e_list = ", ".join(
        f"({d}, {lit_double(x)})" for d, x in enumerate(_benford_expected(), start=1)
    )
    return f"""
    WITH v AS (
      SELECT l_returnflag AS grp,
             CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
      FROM lineitem WHERE l_extendedprice >= 1
    ),
    counts AS (SELECT grp, digit, count(*) AS c FROM v GROUP BY 1, 2),
    n AS (SELECT grp, count(*) AS n FROM v GROUP BY 1),
    exp(digit, e) AS (VALUES {e_list}),
    terms AS (
      SELECT n.grp, n.n,
             CAST(floor(abs(CAST(coalesce(c.c, 0) AS DOUBLE) / CAST(n.n AS DOUBLE) - exp.e)
                        * 1000000.0 + 0.5) AS BIGINT) AS t
      FROM n CROSS JOIN exp
      LEFT JOIN counts c ON c.grp = n.grp AND c.digit = exp.digit
    )
    SELECT grp, CAST(max(n) AS BIGINT) AS n_values,
           CAST(sum(t) AS DOUBLE) / 2000000.0 AS tvd
    FROM terms GROUP BY 1
    """


@register(
    "a_benford_deviation",
    oracle=_benford_oracle,
    tags=("A14", "A6", "F7"),
    doc="Benford's-law deviation per return flag - the fabricated-data "
    "screen auditors run on financial columns: observed leading-digit "
    "shares of l_extendedprice vs log10(1 + 1/d), reported as total "
    "variation distance. The leading digit comes from the INTEGER part "
    "rendered as a string (int-to-string is engine-identical - no float "
    "log10 or formatting anywhere); expected shares are Python double "
    "literals embedded identically in both programs; per-digit terms "
    "quantize to the 1e-6 lattice before the integer term-sum, with "
    "missing digits contributing their full expected share via the "
    "9-digit spine. Combinable aggs end to end - no window, no sort.",
)
def a_benford_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.benford_deviation(
        _t(spark, sf_dir, "lineitem"), "l_extendedprice", "l_returnflag"
    )


@register(
    "a_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             CAST(min(year(o_orderdate) * 12 + month(o_orderdate)) AS INTEGER) AS mkey0
      FROM orders GROUP BY 1
    ),
    activity AS (
      SELECT DISTINCT o_custkey,
             CAST(year(o_orderdate) * 12 + month(o_orderdate) AS INTEGER) AS mkey
      FROM orders
    ),
    cohort_n AS (SELECT mkey0, count(*) AS cohort_n FROM firsts GROUP BY 1),
    per AS (
      SELECT f.mkey0, a.mkey - f.mkey0 AS m_offset, count(*) AS active
      FROM activity a JOIN firsts f USING (o_custkey)
      GROUP BY 1, 2
    )
    SELECT make_date(CAST(floor((p.mkey0 - 1) / 12.0) AS INTEGER),
                     CAST(((p.mkey0 - 1) % 12) + 1 AS INTEGER), 1) AS cohort_month,
           CAST(p.m_offset AS INTEGER) AS m_offset,
           CAST(p.active AS BIGINT) AS active,
           CAST(c.cohort_n AS BIGINT) AS cohort_n,
           CAST(p.active AS DOUBLE) / CAST(c.cohort_n AS DOUBLE) AS retention
    FROM per p JOIN cohort_n c USING (mkey0)
    """,
    tags=("A10", "J1", "F4"),
    doc="Monthly retention-cohort triangle: customers keyed to the month "
    "of their first order, counted per (cohort, months-since) cell with "
    "the cohort-share ratio. Months live on the integer year*12+month "
    "lattice (no engine date subtraction); min-per-customer and "
    "distinct-(customer, month) are combinable aggs; one custkey "
    "shuffle; cohort sizes broadcast (#months rows). No window, no sort.",
)
def a_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.retention_cohorts(_t(spark, sf_dir, "orders"))


@register(
    "a_rfm_segments",
    oracle=f"""
    WITH per_cust AS (
      SELECT o_custkey, max(o_orderdate) AS last_order, count(*) AS freq,
             {dsum_sql('o_totalprice')} AS monetary
      FROM orders GROUP BY 1
    ),
    base AS (
      SELECT c.c_nationkey, p.o_custkey, p.freq, p.monetary,
             date_diff('day', CAST(p.last_order AS DATE),
                       CAST((SELECT max(o_orderdate) FROM orders) AS DATE)) AS recency_days
      FROM per_cust p JOIN customer c ON p.o_custkey = c.c_custkey
    ),
    tiled AS (
      SELECT c_nationkey, monetary,
             ntile(5) OVER (PARTITION BY c_nationkey
                            ORDER BY recency_days ASC, o_custkey ASC) AS r_q,
             ntile(5) OVER (PARTITION BY c_nationkey
                            ORDER BY freq DESC, o_custkey ASC) AS f_q,
             ntile(5) OVER (PARTITION BY c_nationkey
                            ORDER BY monetary DESC, o_custkey ASC) AS m_q
      FROM base
    )
    SELECT c_nationkey, CAST(r_q AS INTEGER) AS r_q, CAST(f_q AS INTEGER) AS f_q,
           CAST(m_q AS INTEGER) AS m_q,
           CAST(count(*) AS BIGINT) AS n_custs, {dsum_sql('monetary')} AS monetary_sum
    FROM tiled GROUP BY 1, 2, 3, 4
    """,
    tags=("O2", "A6", "W4"),
    doc="Per-nation RFM quintile segmentation (the CRM cube): ntile(5) "
    "per nation on recency (integer days vs the broadcast global max "
    "order date), frequency, and decimal-exact monetary, each with the "
    "custkey tiebreak so tile assignment is unique; output is the "
    "(nation, R, F, M) cell population + exact monetary sum. Windows "
    "are nation-bounded - never a single-task global ntile.",
)
def a_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.rfm_segments(_t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders"))


_GINI_EXPR = (
    "(2.0 * rk_rev_sum - (CAST(n_custs AS DOUBLE) + 1.0) * revenue_sum)"
    " / (CAST(n_custs AS DOUBLE) * revenue_sum)"
)


@register(
    "a_gini_revenue",
    oracle=f"""
    WITH per_cust AS (
      SELECT o_custkey, {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1
    ),
    nat AS (
      SELECT c.c_nationkey AS nationkey, p.o_custkey, p.revenue
      FROM per_cust p JOIN customer c ON p.o_custkey = c.c_custkey
    ),
    ranked AS (
      SELECT nationkey, o_custkey, revenue,
             row_number() OVER (PARTITION BY nationkey
                                ORDER BY revenue ASC, o_custkey ASC) AS rk
      FROM nat
    ),
    agg AS (
      SELECT nationkey, CAST(count(*) AS BIGINT) AS n_custs,
             {dsum_sql('revenue')} AS revenue_sum,
             {dsum_sql('CAST(rk AS DOUBLE) * revenue')} AS rk_rev_sum
      FROM ranked GROUP BY 1
    )
    SELECT nationkey, n_custs, revenue_sum,
           {qround_sql(_GINI_EXPR, 9)} AS gini
    FROM agg
    """,
    tags=("A6", "O1", "A2"),
    doc="Per-nation Gini coefficient of customer revenue via the exact "
    "rank-weighted identity G = (2*sum(rk*x) - (n+1)*sum(x)) / (n*sum(x)): "
    "decimal-exact revenue, IEEE-exact double products re-quantized "
    "through the decimal sum, closing arithmetic pure +,-,*,/ (no libm). "
    "Heavy lineitem join is combinable before the nation-bounded rank "
    "window; only the skinny per-customer frame is sorted.",
)
def a_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.gini_revenue(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
    )


@register(
    "a_basket_lift",
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l_orderkey, p_brand
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM ob),
    bc AS (SELECT p_brand, count(*) AS cnt FROM ob GROUP BY 1),
    pairs AS (
      SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, count(*) AS co
      FROM ob a JOIN ob b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY 1, 2
    )
    SELECT brand_b, brand_a, CAST(co AS BIGINT) AS co,
           CAST(ca.cnt AS BIGINT) AS n_a, CAST(cb.cnt AS BIGINT) AS n_b,
           CAST(co AS DOUBLE) / CAST(n.n_orders AS DOUBLE) AS support,
           (CAST(co AS DOUBLE) * CAST(n.n_orders AS DOUBLE))
             / (CAST(ca.cnt AS DOUBLE) * CAST(cb.cnt AS DOUBLE)) AS lift
    FROM pairs
    JOIN bc ca ON ca.p_brand = pairs.brand_a
    JOIN bc cb ON cb.p_brand = pairs.brand_b
    CROSS JOIN n
    WHERE co >= 3
    """,
    tags=("J1", "A10", "O3"),
    doc="Market-basket association mining: support and lift for brand "
    "pairs co-occurring in an order basket ('frequently bought "
    "together'). The orderkey self-join explodes at most C(basket,2) "
    "pairs per order (baskets are bounded) - never cross-order pairs; "
    "counts are combinable; brand marginals and the 1-row order count "
    "broadcast; lift/support are IEEE-exact double ratios of integers.",
)
def a_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.brand_basket_lift(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey, o_orderdate, o_orderpriority,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
    tags=("P1", "J1", "O3"),
    doc="TPC-H-Q3-shaped shipping priority: unshipped revenue of "
    "BUILDING-segment orders, top-10 by exact revenue with the orderkey "
    "tiebreak. Date and segment predicates push to the scans; one "
    "orderkey shuffle; the top-k compiles to TakeOrderedAndProject "
    "(per-partition heaps), never a global sort.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.shipping_priority(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, c_acctbal, n_name,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
    tags=("P1", "J1", "O3"),
    doc="TPC-H-Q10-shaped returned-item report: the 20 customers who "
    "returned the most revenue in a quarter, with nation attribution. "
    "Returnflag + quarter predicates push to the scans; nation "
    "broadcast; TakeOrdered top-k on the skinny per-customer frame.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.returned_items(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
    )


@register(
    "q18_large_orders",
    oracle=f"""
    WITH per_order AS (
      SELECT l_orderkey, {dsum_sql('l_quantity')} AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING {dsum_sql('l_quantity')} > 250.0
    )
    SELECT c_custkey AS custkey, c_name AS cust_name, o_orderkey AS orderkey,
           o_orderdate AS orderdate, o_totalprice AS totalprice, sum_qty
    FROM per_order
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    """,
    tags=("A2", "J1", "P1"),
    doc="TPC-H-Q18-shaped large-volume orders (GROUP BY + HAVING): the "
    "per-order quantity rollup is combinable BEFORE any join (the "
    "aggregate-then-join rewrite - never join-then-aggregate the wide "
    "frame); survivors are a ~1% fraction, so the orders/customer joins "
    "run on the filtered skinny side.",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.large_orders(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
    )


@register(
    "p_kanonymity",
    oracle="""
    SELECT c_nationkey AS nationkey, c_mktsegment AS segment,
           CAST(floor(c_acctbal / 1000.0) AS INTEGER) AS bal_bucket,
           CAST(count(*) AS BIGINT) AS group_n,
           (count(*) >= 5) AS anonymous
    FROM customer
    GROUP BY 1, 2, 3
    """,
    tags=("A14", "P8", "TXT-pii"),
    doc="k-anonymity screen over the (nation, segment, balance-bucket) "
    "quasi-identifier tuple - the privacy gate before releasing joined "
    "customer attributes: groups under k=5 members re-identify their "
    "rows. One combinable groupBy over bounded-cardinality QI columns; "
    "floor-division bucketing is engine-identical for negatives.",
)
def p_kanonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.kanonymity_report(_t(spark, sf_dir, "customer"))


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT {dsum_sql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")} AS promo_rev,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_rev,
           100.0 * {dsum_sql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
             / {dsum_sql('l_extendedprice * (1 - l_discount)')} AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
    tags=("A10", "A13", "P1"),
    doc="TPC-H-Q14-shaped promotion effect: one month's PROMO revenue "
    "share as a single conditional-aggregate pass. Shipdate predicate "
    "pushed to the scan, one AQE-sized partkey join, decimal-exact "
    "conditional sums, IEEE double percentage.",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.promo_revenue(_t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part"))


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS l_year,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_name IN ('NATION_3', 'NATION_7')
      AND n2.n_name IN ('NATION_3', 'NATION_7')
      AND n1.n_name <> n2.n_name
    GROUP BY 1, 2, 3
    """,
    tags=("J1", "A2", "P1"),
    doc="TPC-H-Q7-shaped bilateral volume shipping: the two-role dimension "
    "pattern - nation joined once for the supplier side, once for the "
    "customer side, both as filtered broadcasts that prune supplier/"
    "customer before the orderkey fact shuffle; year rollup combinable.",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.volume_shipping(
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
    )


@register(
    "a_skew_profile",
    oracle="""
    WITH counts AS (
      SELECT user_id AS key, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1
    ),
    stats AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(max(cnt) AS BIGINT) AS max_cnt
      FROM counts
    ),
    top AS (SELECT key, cnt FROM counts ORDER BY cnt DESC, key ASC LIMIT 10)
    SELECT key, cnt, n_rows, n_keys,
           CAST(cnt AS DOUBLE) / CAST(n_rows AS DOUBLE) AS share,
           CAST(max_cnt AS DOUBLE) * CAST(n_keys AS DOUBLE)
             / CAST(n_rows AS DOUBLE) AS skew_factor
    FROM top CROSS JOIN stats
    """,
    tags=("SKEW-salt", "O3", "A14"),
    doc="Join-key skew profiler - the pre-join diagnostic at 100 TB: "
    "top-10 hottest keys with row share plus the global skew factor "
    "max_cnt*n_keys/n_rows (1.0 = uniform; >>1 = salt this key). One "
    "combinable key count, TakeOrdered hot-key cut, broadcast 1-row "
    "stats; ratios are IEEE doubles of exact integers.",
)
def a_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import skew_profile

    return skew_profile(_t(spark, sf_dir, "events"), "user_id")


@register(
    "q13_custdist",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS c_count FROM orders GROUP BY 1
    )
    SELECT CAST(coalesce(p.c_count, 0) AS BIGINT) AS c_count,
           CAST(count(*) AS BIGINT) AS custdist
    FROM customer c LEFT JOIN per_cust p ON c.c_custkey = p.o_custkey
    GROUP BY 1
    """,
    tags=("J1", "A10", "U1"),
    doc="TPC-H-Q13-shaped customer distribution: customers per exact order "
    "count INCLUDING the zero-order customers an inner join drops. "
    "Aggregate-then-left-join (one row per customer enters the join, not "
    "per order), then a second combinable rollup of the skinny frame.",
)
def q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.customer_order_distribution(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH per_supp AS (
      SELECT l_suppkey, {dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY 1
    )
    SELECT s_suppkey AS suppkey, s_name AS supp_name, total_revenue
    FROM per_supp
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM per_supp)
    """,
    tags=("O3", "A2", "J1"),
    doc="TPC-H-Q15-shaped top supplier: the aggregate -> global-max -> "
    "join-back pattern, ties preserved (unlike LIMIT 1). The max is a "
    "broadcast 1-row frame - never a single-task window; decimal-exact "
    "revenue makes the equality join-back bit-stable.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.top_supplier(_t(spark, sf_dir, "supplier"), _t(spark, sf_dir, "lineitem"))


@register(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 45 AND l_quantity BETWEEN 20 AND 40)
    """,
    tags=("P1", "A2", "J1"),
    doc="TPC-H-Q19-shaped OR-of-conjunctions revenue - the predicate-"
    "pushdown stress shape: Catalyst keeps the common partkey equi-join "
    "and pushes the residual disjunction's per-side conjuncts into both "
    "scans; one decimal-exact aggregate row.",
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.discounted_brand_revenue(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
    )


def _joinest_oracle() -> str:
    from ..functions.rng import rng_draw_sql
    from ..operators.skew import JOINEST_MOD, JOINEST_SALT

    da = rng_draw_sql("user_id", salt=JOINEST_SALT)
    db = rng_draw_sql("o_custkey", salt=JOINEST_SALT)
    return f"""
    WITH fa AS (
      SELECT user_id AS k, CAST(count(*) AS BIGINT) AS fa
      FROM events WHERE ({da}) % {JOINEST_MOD} = 0 GROUP BY 1
    ),
    fb AS (
      SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS fb
      FROM orders WHERE ({db}) % {JOINEST_MOD} = 0 GROUP BY 1
    ),
    est AS (
      SELECT CAST(coalesce(sum(fa * fb), 0) * {JOINEST_MOD} AS BIGINT) AS est_size
      FROM fa JOIN fb USING (k)
    ),
    ex AS (
      SELECT CAST(count(*) AS BIGINT) AS exact_size
      FROM events e JOIN orders o ON e.user_id = o.o_custkey
    )
    SELECT est_size, exact_size,
           (CAST(est_size AS DOUBLE) - CAST(exact_size AS DOUBLE))
             / CAST(exact_size AS DOUBLE) AS rel_err
    FROM est CROSS JOIN ex
    """


@register(
    "a_join_size_est",
    oracle=_joinest_oracle,
    tags=("A-sketch", "SKEW-salt", "J1"),
    doc="Sketch-based equi-join cardinality estimate (events x orders on "
    "the customer key) via a coordinated 1-in-16 distinct-key sample: "
    "|A join B| = sum fA(k)*fB(k) scaled by the sampling rate - the "
    "cost-model statistic computed BEFORE a 100 TB join. The key-sample "
    "predicate filters both scans pre-shuffle; the estimate is an exact "
    "integer; the exact count rides along for the accuracy report.",
)
def a_join_size_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import join_size_estimate

    return join_size_estimate(
        _t(spark, sf_dir, "events"), "user_id", _t(spark, sf_dir, "orders"), "o_custkey"
    )


def _kfold_oracle() -> str:
    from ..functions.rng import rng_draw_sql

    d = rng_draw_sql("c_custkey", salt=271)
    return f"""
    WITH f AS (
      SELECT CAST(({d}) % 5 AS INTEGER) AS fold, c_acctbal
      FROM customer
    )
    SELECT fold, CAST(count(*) AS BIGINT) AS n_custs,
           {dsum_sql('c_acctbal')} AS acctbal_sum,
           CAST(count(*) AS DOUBLE)
             / (SELECT CAST(count(*) AS DOUBLE) FROM customer) AS share
    FROM f GROUP BY fold
    """


@register(
    "u_kfold_assign",
    oracle=_kfold_oracle,
    tags=("U4", "F8", "U3"),
    doc="Deterministic k-fold assignment (k=5) for cross-validation: fold "
    "= seeded hash draw of the key mod k - embarrassingly parallel, "
    "slicing-independent, reproducible across engines (the same F8 RNG "
    "contract as the hash split), with per-fold population and exact "
    "balance-sum health stats.",
)
def u_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rng import rng_draw

    cust = _t(spark, sf_dir, "customer")
    total = cust.agg(F.count(F.lit(1)).cast("double").alias("n_total"))
    f = cust.select(
        F.pmod(rng_draw("c_custkey", salt=271), F.lit(5)).cast("int").alias("fold"),
        "c_acctbal",
    )
    from ..functions.exact import dsum

    return (
        f.groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_custs"),
            dsum(F.col("c_acctbal")).alias("acctbal_sum"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "fold",
            "n_custs",
            "acctbal_sum",
            (F.col("n_custs").cast("double") / F.col("n_total")).alias("share"),
        )
    )


@register(
    "f_time_to_convert",
    oracle="""
    WITH f AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    ),
    g AS (
      SELECT CAST(date_diff('second', t_view, t_purchase) AS BIGINT) AS gap_s
      FROM f WHERE t_view IS NOT NULL AND t_purchase > t_view
    ),
    arr AS (SELECT list_sort(list(gap_s)) AS a FROM g)
    SELECT CAST(len(a) AS BIGINT) AS n_converted,
           CAST(a[CAST((len(a) + 1) // 2 AS INTEGER)] AS BIGINT) AS median_gap_s,
           CAST(a[1] AS BIGINT) AS min_gap_s,
           CAST(a[len(a)] AS BIGINT) AS max_gap_s
    FROM arr
    """,
    tags=("A10", "U5", "F4"),
    doc="Time-to-convert distribution (first view -> first purchase): "
    "conditional-min first-touch per user (one combinable agg, no event-"
    "history window), integer-second gaps, and the lower-median spec on "
    "the sorted gap array (engine-unambiguous, no percentile "
    "interpolation). The global collect is bounded by the CONVERTED-user "
    "count, orders of magnitude under the event count.",
)
def f_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    g = f.filter(
        F.col("t_view").isNotNull() & (F.col("t_purchase") > F.col("t_view"))
    ).select(
        (
            F.unix_timestamp("t_purchase") - F.unix_timestamp("t_view")
        ).cast("bigint").alias("gap_s")
    )
    arr = g.agg(F.sort_array(F.collect_list("gap_s")).alias("a"))
    med = "element_at(a, cast((size(a) + 1) div 2 as int))"
    return arr.select(
        F.size("a").cast("bigint").alias("n_converted"),
        F.expr(med).cast("bigint").alias("median_gap_s"),
        F.element_at("a", 1).cast("bigint").alias("min_gap_s"),
        F.expr("element_at(a, size(a))").cast("bigint").alias("max_gap_s"),
    )


@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("P1", "A2", "F7"),
    doc="TPC-H-Q6-shaped forecast revenue change: the canonical scan-only "
    "aggregate - every predicate pushes to the parquet scan, no join, one "
    "decimal-exact map-side-combinable sum.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.forecast_revenue_change(_t(spark, sf_dir, "lineitem"))


@register(
    "q8_market_share",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           {dsum_sql("CASE WHEN sn.n_name = 'NATION_5' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")} AS nation_rev,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_rev,
           {qround_sql(dsum_sql("CASE WHEN sn.n_name = 'NATION_5' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END") + ' / ' + dsum_sql('l_extendedprice * (1 - l_discount)'), 6)} AS mkt_share
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE p_type = 'PROMO'
      AND o_custkey IN (
        SELECT c_custkey FROM customer
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region   ON cn.n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
      )
    GROUP BY 1
    """,
    tags=("J1", "A10", "A13"),
    doc="TPC-H-Q8-shaped national market share: ASIA customers' PROMO "
    "purchases, fraction supplied by NATION_5 per order year. Two-role "
    "nation dim (customer side filters via a semi join, supplier side "
    "labels the numerator); conditional decimal sums, IEEE ratio "
    "quantized 1e-6.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.national_market_share(
        _t(spark, sf_dir, "region"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "part"),
    )


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_profit,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%gear%'
    GROUP BY 1, 2
    """,
    tags=("J1", "A2", "P1"),
    doc="TPC-H-Q9-shaped product profit by supplier nation x year for "
    "'gear' parts (no partsupp table in this corpus, so profit is the "
    "discounted revenue - the join/rollup shape is the point). Substring-"
    "filtered part dim broadcasts; one orderkey fact shuffle.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.product_type_profit(
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "part"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
    )


@register(
    "q16_supplier_cnt",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
    tags=("J3", "A10", "P1"),
    doc="TPC-H-Q16-shaped parts/supplier relationship: distinct suppliers "
    "per (brand, type, size) bucket, excluding one brand/type, off-list "
    "sizes, and negative-balance suppliers (the customer-complaints "
    "NOT-IN anti join; lineitem is the part-supplier bridge - no partsupp "
    "table in this corpus).",
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.parts_supplier_relationship(
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "part"),
        _t(spark, sf_dir, "lineitem"),
    )


@register(
    "q17_small_qty_revenue",
    oracle=f"""
    WITH li AS (
      SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty, l_extendedprice
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
    ),
    per_part AS (
      SELECT l_partkey AS pk, CAST(sum(qty) AS BIGINT) AS qsum,
             CAST(count(*) AS BIGINT) AS qcnt
      FROM li GROUP BY 1
    )
    SELECT {qround_sql(dsum_sql('l_extendedprice') + ' / 7.0', 6)} AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM li JOIN per_part ON l_partkey = pk
    WHERE qty * 5 * qcnt < qsum
    """,
    tags=("A2", "J1", "A6"),
    doc="TPC-H-Q17-shaped small-quantity revenue: correlated per-part "
    "average as aggregate-then-join-back; the 20% threshold compares in "
    "INTEGERS (qty*5*n < sum_qty) so the boundary is engine-exact - no "
    "decimal average rounding can flip a row.",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.small_quantity_revenue(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH f_li AS (
      SELECT l_orderkey, l_suppkey, l_returnflag FROM lineitem
      WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
    ),
    per_order AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_faulty
      FROM f_li GROUP BY 1
    ),
    nat_supp AS (
      SELECT s_suppkey, s_name FROM supplier
      JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_2'
    ),
    faulty AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM f_li WHERE l_returnflag = 'R'
    )
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM faulty
    JOIN nat_supp  ON l_suppkey = s_suppkey
    JOIN per_order USING (l_orderkey)
    WHERE n_supp >= 2 AND n_faulty = 1
    GROUP BY 1
    ORDER BY numwait DESC, s_name ASC
    LIMIT 20
    """,
    tags=("J3", "A10", "O3"),
    doc="TPC-H-Q21-shaped suppliers who kept orders waiting: NATION_2 "
    "suppliers whose line in a finalized multi-supplier order was flagged "
    "'R' while every co-supplier ran clean (return flag stands in for the "
    "receipt-vs-commit lateness this corpus lacks). The EXISTS/NOT-EXISTS "
    "double correlation becomes two per-order distinct-supplier counts - "
    "one orderkey shuffle, never a per-line self-join; TakeOrdered top-20.",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.waiting_suppliers(
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
    )


@register(
    "q22_sales_opportunity",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(count(*) AS BIGINT) AS numcust,
           {dsum_sql('c_acctbal')} AS totacctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (
        SELECT {davg_sql('c_acctbal')} FROM customer WHERE c_acctbal > 0
      )
      AND c_custkey NOT IN (
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
      )
    GROUP BY 1
    """,
    tags=("J3", "A2", "A10"),
    doc="TPC-H-Q22-shaped sales opportunity: per nation (standing in for "
    "the phone country code this corpus lacks), count and total balance "
    "of above-average-balance customers with no orders since 1999. The "
    "scalar average is a broadcast 1-row davg (double of a decimal-exact "
    "sum - boundary bit-stable); lapsed = anti join on the date-filtered "
    "orders scan.",
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.lapsed_high_balance_customers(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "orders"),
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH p AS (
      SELECT p_partkey, p_name FROM part WHERE p_size <= 15 AND p_type = 'LARGE'
    ),
    eur_supp AS (
      SELECT s_suppkey, s_name, n_name FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    offers AS (
      SELECT p.p_partkey, p.p_name, l_suppkey, l_extendedprice AS price
      FROM lineitem JOIN p ON l_partkey = p.p_partkey
      WHERE l_suppkey IN (SELECT s_suppkey FROM eur_supp)
    ),
    best AS (SELECT p_partkey AS bk, min(price) AS min_price FROM offers GROUP BY 1)
    SELECT DISTINCT o.p_partkey, o.p_name, s.s_name, s.n_name, b.min_price
    FROM offers o
    JOIN best b ON o.p_partkey = b.bk AND o.price = b.min_price
    JOIN eur_supp s ON o.l_suppkey = s.s_suppkey
    """,
    tags=("J1", "O3", "A1"),
    doc="TPC-H-Q2-shaped minimum-cost supplier: for each small-size LARGE "
    "part, the EUROPE supplier(s) observed at the lowest unit price "
    "(lineitem is the observed price book - no partsupp table). The "
    "correlated min is aggregate-then-equality-join-back, ties preserved; "
    "min of doubles returns a member so the equality is exact.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.min_cost_supplier(
        _t(spark, sf_dir, "region"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "part"),
        _t(spark, sf_dir, "lineitem"),
    )


_PB_CTE = """pb AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             min(l_extendedprice) AS ps_supplycost,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS ps_availqty
      FROM lineitem GROUP BY 1, 2
    )"""


@register(
    "q11_important_stock",
    oracle=f"""
    WITH {_PB_CTE},
    g AS (
      SELECT ps_partkey,
             {dsum_sql('ps_supplycost * CAST(ps_availqty AS DOUBLE)')} AS value
      FROM pb JOIN supplier ON ps_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_9'
      GROUP BY 1
    ),
    t AS (SELECT {davg_sql('value')} * 3.0 AS _thr FROM g)
    SELECT ps_partkey, value FROM g, t WHERE value > _thr
    """,
    tags=("J1", "A2", "A6"),
    doc="TPC-H-Q11-shaped important stock over the observed price book "
    "(partsupp analog: per (part, supplier), min observed unit price = "
    "supply cost, total shipped quantity = avail qty - closing the "
    "no-partsupp gap): per part, NATION_9 suppliers' total held value, "
    "kept when above 3x the mean per-part value (scale-free - TPC-H's "
    "fixed fraction is SF-dependent by spec). The HAVING scalar "
    "is a broadcast 1-row aggregate; all sums decimal-exact.",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.important_stock_value(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "nation"),
    )


@register(
    "q20_surplus_suppliers",
    oracle=f"""
    WITH {_PB_CTE},
    pn AS (SELECT p_partkey FROM part WHERE p_name LIKE 'small%'),
    yr AS (
      SELECT l_partkey, l_suppkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS _yq
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_partkey IN (SELECT p_partkey FROM pn)
      GROUP BY 1, 2
    )
    SELECT s_suppkey, s_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_9' AND s_suppkey IN (
      SELECT ps_suppkey FROM pb
      JOIN yr ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
      WHERE ps_partkey IN (SELECT p_partkey FROM pn)
        AND ps_availqty > 2 * _yq
    )
    """,
    tags=("J1", "J3", "A6"),
    doc="TPC-H-Q20-shaped surplus-stock suppliers over the observed price "
    "book: NATION_9 suppliers holding, for some 'small%' part, all-time "
    "stock above TWICE their 1997 shipments of it. The correlated year "
    "quantity is a pair-keyed aggregate joined back on (partkey, suppkey); "
    "the surplus test is exact integer arithmetic.",
)
def q20_surplus_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.surplus_stock_suppliers(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "part"),
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "nation"),
    )


@register(
    "p_l_diversity",
    oracle="""
    SELECT c_nationkey AS nationkey,
           CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(count(*) AS BIGINT) AS group_n,
           CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS l_distinct,
           (count(DISTINCT o_orderpriority) >= 3) AS diverse
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1, 2
    """,
    tags=("A14", "P8", "TXT-pii"),
    doc="l-diversity screen, the companion privacy gate to p_kanonymity: "
    "k-anonymous groups still leak when every member shares the sensitive "
    "value, so each (nation, order-year) quasi-identifier group must carry "
    ">= 3 DISTINCT order priorities. One join + one combinable groupBy "
    "with a distinct-count (partial aggregation of the (QI, value) pairs "
    "then a count - Spark plans exactly that two-phase shape).",
)
def p_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    return (
        od.join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("group_n"),
            F.countDistinct("o_orderpriority").cast("bigint").alias("l_distinct"),
        )
        .withColumn("diverse", F.col("l_distinct") >= 3)
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY 1
    """,
    tags=("J3", "A10", "P1"),
    doc="TPC-H-Q4-shaped order-priority checking: per priority, the count "
    "of one quarter's orders having at least one LATE line (shipped > 90 "
    "days after the order date - the corpus has no commit/receipt dates, "
    "so lateness against the order date is the EXISTS predicate). The "
    "EXISTS compiles to a left-semi join with the date bound inside the "
    "join condition; the quarter filter pushes to the orders scan.",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = od.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("order_count")
    )


@register(
    "q12_lateness_buckets",
    oracle="""
    SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) < 0 THEN 'EARLY'
                WHEN datediff('day', o_orderdate, l_shipdate) <= 90 THEN 'ON-TIME'
                ELSE 'LATE' END AS ship_bucket,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
    """,
    tags=("J1", "A10", "F4"),
    doc="TPC-H-Q12-shaped shipping-mode summary: the corpus has no shipmode "
    "column, so lines bucket by DERIVED shipping lateness (early / within "
    "90 days / late vs the order date - exact integer day arithmetic), and "
    "each bucket counts high- vs low-priority lines for one ship year. One "
    "orderkey join with the year predicate pushed to the lineitem scan; "
    "both counts are conditional aggregates in a single pass.",
)
def q12_lateness_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    od = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    gap = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(gap < 0, "EARLY").when(gap <= 90, "ON-TIME").otherwise("LATE")
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("ship_bucket", bucket)
        .groupBy("ship_bucket")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "p_t_closeness",
    oracle=f"""
    WITH rows_ AS (
      SELECT c_nationkey AS nationkey,
             CAST(year(o_orderdate) AS INTEGER) AS o_year,
             CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS lvl
      FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    cnt AS (SELECT nationkey, o_year, lvl, CAST(count(*) AS BIGINT) AS c
            FROM rows_ GROUP BY 1, 2, 3),
    grp AS (SELECT nationkey, o_year, CAST(sum(c) AS BIGINT) AS ng
            FROM cnt GROUP BY 1, 2),
    gl AS (SELECT lvl, CAST(sum(c) AS BIGINT) AS gc FROM cnt GROUP BY 1),
    tot AS (SELECT CAST(sum(gc) AS BIGINT) AS nn FROM gl),
    lv AS (SELECT unnest(range(1, 6)) AS lvl),
    gpre AS (
      SELECT a.lvl, CAST(sum(coalesce(b.gc, 0)) AS BIGINT) AS gp
      FROM lv a LEFT JOIN gl b ON b.lvl <= a.lvl GROUP BY 1
    ),
    spine AS (SELECT g.nationkey, g.o_year, g.ng, l.lvl FROM grp g, lv l),
    pre AS (
      SELECT s.nationkey, s.o_year, s.ng, s.lvl,
             sum(coalesce(c.c, 0)) OVER (PARTITION BY s.nationkey, s.o_year
                                         ORDER BY s.lvl) AS pg
      FROM spine s LEFT JOIN cnt c
        ON s.nationkey = c.nationkey AND s.o_year = c.o_year AND s.lvl = c.lvl
    ),
    terms AS (
      SELECT p.nationkey, p.o_year, p.ng,
             abs(p.pg * t.nn - g.gp * p.ng) AS num, t.nn
      FROM pre p JOIN gpre g ON p.lvl = g.lvl CROSS JOIN tot t
      WHERE p.lvl <= 4
    )
    SELECT nationkey, o_year, CAST(max(ng) AS BIGINT) AS group_n,
           CAST(sum(num) AS BIGINT) AS t_num,
           {qround_sql("CAST(sum(num) AS DOUBLE) / (CAST(max(ng) AS DOUBLE) * CAST(max(nn) AS DOUBLE) * 4.0)", 9)} AS t_stat,
           ({qround_sql("CAST(sum(num) AS DOUBLE) / (CAST(max(ng) AS DOUBLE) * CAST(max(nn) AS DOUBLE) * 4.0)", 9)} <= 0.2) AS close
    FROM terms GROUP BY 1, 2
    """,
    tags=("A14", "P8", "TXT-pii"),
    doc="t-closeness - the third privacy gate completing the "
    "p_kanonymity / p_l_diversity trio: a diverse group still leaks when "
    "its sensitive-value DISTRIBUTION diverges from the table's, so each "
    "(nation, order-year) quasi-identifier group is scored by the ordinal "
    "Earth-Mover's Distance between its order-priority distribution and "
    "the global one (priorities 1-URGENT..5-LOW are ordered, so EMD = "
    "mean |prefix-CDF gap|). Exactness: the per-level term "
    "|P_g(l)*N - P(l)*n_g| is INTEGER (cross-multiplied - one double "
    "divide at the very end), so the stat is deterministic in both "
    "engines. Shape: one (QI, level) count, a 5-level dense spine (groups "
    "x 5 rows), per-group prefix windows over <=5-row partitions, and the "
    "5-row global CDF broadcast - never a global window or a "
    "distribution-sized collect.",
)
def p_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.exact import qround

    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    rows = od.join(cu, F.col("o_custkey") == F.col("c_custkey")).select(
        F.col("c_nationkey").alias("nationkey"),
        F.year("o_orderdate").cast("int").alias("o_year"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("lvl"),
    )
    cnt = rows.groupBy("nationkey", "o_year", "lvl").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    grp = cnt.groupBy("nationkey", "o_year").agg(F.sum("c").cast("bigint").alias("ng"))
    glob = cnt.groupBy("lvl").agg(F.sum("c").cast("bigint").alias("gc"))
    tot = glob.agg(F.sum("gc").cast("bigint").alias("nn"))
    lv = spark.range(1, 6).select(F.col("id").cast("int").alias("lvl"))
    # global prefix CDF: 5x5 tiny self-join, no single-partition window
    gpre = (
        lv.alias("a")
        .join(F.broadcast(glob.alias("b")), F.col("b.lvl") <= F.col("a.lvl"), "left")
        .groupBy(F.col("a.lvl").alias("lvl"))
        .agg(F.sum(F.coalesce(F.col("b.gc"), F.lit(0))).cast("bigint").alias("gp"))
    )
    spine = grp.crossJoin(F.broadcast(lv))
    pre = (
        spine.join(cnt, ["nationkey", "o_year", "lvl"], "left")
        .withColumn(
            "pg",
            F.sum(F.coalesce(F.col("c"), F.lit(0))).over(
                W.partitionBy("nationkey", "o_year").orderBy("lvl")
            ),
        )
    )
    terms = (
        pre.filter(F.col("lvl") <= 4)
        .join(F.broadcast(gpre), "lvl")
        .crossJoin(F.broadcast(tot))
        .select(
            "nationkey",
            "o_year",
            "ng",
            "nn",
            F.abs(F.col("pg") * F.col("nn") - F.col("gp") * F.col("ng")).alias("num"),
        )
    )
    t_stat = qround(
        F.sum("num").cast("double")
        / (F.max("ng").cast("double") * F.max("nn").cast("double") * F.lit(4.0)),
        9,
    )
    return terms.groupBy("nationkey", "o_year").agg(
        F.max("ng").cast("bigint").alias("group_n"),
        F.sum("num").cast("bigint").alias("t_num"),
        t_stat.alias("t_stat"),
        (t_stat <= 0.2).alias("close"),
    )


_RR_P = 0.75  # keep-truth probability of the randomized-response coin


def _rr_oracle() -> str:
    from ..functions.exact import qround_sql as _q
    from ..functions.rng import rng_uniform_sql

    u1 = rng_uniform_sql("event_id", salt=101)
    u2 = rng_uniform_sql("event_id", salt=102)
    est = _q(
        f"(CAST(coalesce(obs.n_obs, 0) AS DOUBLE)"
        f" - CAST(nf.n AS DOUBLE) * {1.0 - _RR_P} / CAST(kf.k AS DOUBLE)) / {_RR_P}",
        6,
    )
    return f"""
    WITH types AS (
      SELECT event_type, CAST(row_number() OVER (ORDER BY event_type) AS BIGINT) AS idx
      FROM (SELECT DISTINCT event_type FROM events)
    ),
    kf AS (SELECT CAST(count(*) AS BIGINT) AS k FROM types),
    ev AS (
      SELECT event_id, event_type,
             {u1} AS u1, {u2} AS u2
      FROM events
    ),
    rep AS (
      SELECT ev.event_id,
             CASE WHEN ev.u1 < {_RR_P} THEN ev.event_type ELSE t.event_type END AS reported
      FROM ev CROSS JOIN kf
      JOIN types t ON t.idx = CAST(floor(ev.u2 * CAST(kf.k AS DOUBLE)) AS BIGINT) + 1
    ),
    obs AS (SELECT reported AS event_type, CAST(count(*) AS BIGINT) AS n_obs FROM rep GROUP BY 1),
    tru AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_true FROM events GROUP BY 1),
    nf AS (SELECT CAST(count(*) AS BIGINT) AS n FROM events)
    SELECT t.event_type,
           coalesce(tru.n_true, 0) AS n_true,
           coalesce(obs.n_obs, 0) AS n_observed,
           {est} AS n_estimated
    FROM types t
    LEFT JOIN tru ON t.event_type = tru.event_type
    LEFT JOIN obs ON t.event_type = obs.event_type
    CROSS JOIN kf CROSS JOIN nf
    """


@register(
    "p_randomized_response",
    oracle=_rr_oracle,
    tags=("P-privacy", "F8", "A10"),
    doc="Randomized response (Warner 1965), the LOCAL-DP counterpart of "
    "p_dp_counts' central Laplace mechanism: each event keeps its true "
    f"type with p = {_RR_P} or swaps to a uniform draw from the K observed "
    "types, and the debiased estimator (n_obs - N(1-p)/K) / p recovers the "
    "true histogram without any row ever being trusted. Both coins come "
    "from the seeded cross-engine RNG keyed on event_id, so the perturbed "
    "release itself is bit-reproducible in the oracle. The type dictionary "
    "is a K-row frame (its row_number window is bounded by type "
    "cardinality, broadcast everywhere); the events side is one map pass "
    "+ two combinable counts. Estimator arithmetic is one fixed IEEE "
    "expression over exact integer counts.",
)
def p_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.exact import qround
    from ..functions.rng import rng_uniform

    ev0 = _t(spark, sf_dir, "events")
    types = (
        ev0.select("event_type")
        .distinct()
        .withColumn(
            "idx", F.row_number().over(W.orderBy("event_type")).cast("bigint")
        )
    )
    kf = types.agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    ev = ev0.select(
        "event_id",
        "event_type",
        rng_uniform("event_id", salt=101).alias("u1"),
        rng_uniform("event_id", salt=102).alias("u2"),
    )
    rep = (
        ev.crossJoin(F.broadcast(kf))
        .withColumn(
            "ridx",
            F.floor(F.col("u2") * F.col("k").cast("double")).cast("bigint") + 1,
        )
        .join(
            F.broadcast(types.select(F.col("idx").alias("ridx"), F.col("event_type").alias("repl"))),
            "ridx",
        )
        .select(
            F.when(F.col("u1") < F.lit(_RR_P), F.col("event_type"))
            .otherwise(F.col("repl"))
            .alias("reported")
        )
    )
    obs = rep.groupBy(F.col("reported").alias("event_type")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs")
    )
    tru = ev0.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("n_true"))
    nf = ev0.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    est = (
        F.coalesce(F.col("n_obs"), F.lit(0)).cast("double")
        - F.col("n").cast("double") * F.lit(1.0 - _RR_P) / F.col("k").cast("double")
    ) / F.lit(_RR_P)
    return (
        types.join(tru.hint("shuffle_hash"), "event_type", "left")
        .join(obs.hint("shuffle_hash"), "event_type", "left")
        .crossJoin(F.broadcast(kf))
        .crossJoin(F.broadcast(nf))
        .select(
            "event_type",
            F.coalesce(F.col("n_true"), F.lit(0)).alias("n_true"),
            F.coalesce(F.col("n_obs"), F.lit(0)).alias("n_observed"),
            qround(est, 6).alias("n_estimated"),
        )
    )


# Fixed a-priori threshold grid (local DP never looks at the data to pick
# it) and exact-dyadic RR constants: p = 3/4, so 1-p = 0.25 and 2p-1 = 0.5
# and every debias constant is exactly representable — no lit_double needed.
_DPQ_GRID = (4, 8, 16, 24, 32, 40, 48, 64, 80, 96, 128, 160, 192, 256, 384, 512)
_DPQ_P = 0.75
_DPQ_QS = (0.25, 0.5, 0.75)
_DPQ_SALT = 113


def _dp_quantile_oracle() -> str:
    from ..functions.rng import rng_uniform_sql

    u = rng_uniform_sql("event_id", "tidx", salt=_DPQ_SALT)
    grid = ", ".join(f"({i}, {t})" for i, t in enumerate(_DPQ_GRID, start=1))
    qs = ", ".join(f"({q})" for q in _DPQ_QS)
    est = "(((CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE)) - 0.25) / 0.5)"
    true_cdf = "(CAST(nt AS DOUBLE) / CAST(n AS DOUBLE))"
    return f"""
    WITH grid(tidx, tval) AS (VALUES {grid}),
    qs(q) AS (VALUES {qs}),
    bits AS (
      SELECT g.tidx, g.tval,
             CASE WHEN e.value <= g.tval THEN 1 ELSE 0 END AS b,
             CASE WHEN {u} < {_DPQ_P}
                  THEN CASE WHEN e.value <= g.tval THEN 1 ELSE 0 END
                  ELSE CASE WHEN e.value <= g.tval THEN 0 ELSE 1 END
             END AS ob
      FROM events e CROSS JOIN grid g
    ),
    agg AS (
      SELECT tval, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(ob) AS BIGINT) AS n1, CAST(sum(b) AS BIGINT) AS nt
      FROM bits GROUP BY 1
    )
    SELECT CAST(q.q AS DOUBLE) AS q,
           CAST(min(CASE WHEN {est} >= q.q THEN tval END) AS BIGINT) AS est_threshold,
           {qround_sql(f"min_by({est}, CASE WHEN {est} >= q.q THEN tval ELSE NULL END)", 6)}
             AS est_cdf_at,
           CAST(min(CASE WHEN {true_cdf} >= q.q THEN tval END) AS BIGINT) AS true_threshold
    FROM agg CROSS JOIN qs q
    GROUP BY 1
    """


@register(
    "p_dp_quantile",
    oracle=_dp_quantile_oracle,
    tags=("P-privacy", "F8", "A1", "A6"),
    doc="Local-DP quantile estimation (the RAPPOR-family threshold-bit "
    "mechanism): every event answers 'is my value <= t' for each of the "
    f"{len(_DPQ_GRID)} FIXED grid thresholds through a randomized-response "
    f"coin (keep-truth p = {_DPQ_P}, keyed on (event_id, t) by the seeded "
    "cross-engine RNG), the per-threshold debias (rate - (1-p)) / (2p-1) "
    "rebuilds the CDF without trusting any row, and each requested "
    "quantile reports the smallest grid threshold whose debiased CDF "
    "clears it (true-CDF pick alongside, as the utility reference). All "
    "RR constants are exact dyadics so the debias is one fixed IEEE "
    "expression over exact integer counts - binomial noise only, no "
    "log/laplace libm anywhere. 100 TB shape: map-only 16x bit expansion, "
    "ONE combinable 16-group count agg, then constant-size frames.",
)
def p_dp_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.exact import qround
    from ..functions.rng import rng_uniform

    ev = _t(spark, sf_dir, "events")
    grid = F.array(*[F.lit(int(t)) for t in _DPQ_GRID])
    bits = ev.select(
        "event_id",
        "value",
        F.posexplode(grid).alias("ti0", "tval"),
    ).select(
        "tval",
        (F.col("value") <= F.col("tval")).cast("int").alias("b"),
        (F.col("ti0") + 1).alias("tidx"),
        "event_id",
    )
    u = rng_uniform("event_id", "tidx", salt=_DPQ_SALT)
    bits = bits.withColumn(
        "ob", F.when(u < F.lit(_DPQ_P), F.col("b")).otherwise(1 - F.col("b"))
    )
    agg = bits.groupBy("tval").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("ob").cast("bigint").alias("n1"),
        F.sum("b").cast("bigint").alias("nt"),
    )
    est = ((F.col("n1").cast("double") / F.col("n").cast("double")) - F.lit(0.25)) / F.lit(0.5)
    true_cdf = F.col("nt").cast("double") / F.col("n").cast("double")
    qf = spark.createDataFrame([(q,) for q in _DPQ_QS], "q double")
    j = agg.crossJoin(F.broadcast(qf)).select(
        "q",
        "tval",
        est.alias("est"),
        true_cdf.alias("tc"),
    )
    return j.groupBy("q").agg(
        F.min(F.when(F.col("est") >= F.col("q"), F.col("tval")))
        .cast("bigint")
        .alias("est_threshold"),
        qround(
            F.expr("min_by(est, CASE WHEN est >= q THEN tval ELSE NULL END)"), 6
        ).alias("est_cdf_at"),
        F.min(F.when(F.col("tc") >= F.col("q"), F.col("tval")))
        .cast("bigint")
        .alias("true_threshold"),
    )
