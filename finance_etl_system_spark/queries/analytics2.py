"""Second tier of classic analytic shapes (TPC-H Q4/Q13/Q17/Q18/Q19/Q22,
adapted to the fixture star schema).

These six cover the plan families the first analytics tier
(queries/analytics.py — Q3/Q5/Q10/Q14 shapes) does not: EXISTS /
NOT-EXISTS rewritten to semi/anti joins, two-level aggregation over an
outer join that must preserve empty groups, a correlated per-group
average consumed by the same table (aggregate + self-join on one key),
HAVING over a pre-join aggregate, and a disjunction of conjunctive
predicates that Catalyst must still partially push to the scan.

The reference has no joins at all (SURVEY §2.3); this tier is harness
coverage proving warehouse-grade planning.

Scale notes (100 TB posture):
- Q4/Q22 shapes: EXISTS/NOT EXISTS become left_semi / left_anti joins
  on the fact key — shuffle on (orderkey|custkey) both sides, no
  row-multiplication, and the semi side is projected to the join key +
  predicate columns only before the exchange.
- Q13 shape: both aggregations key on c_custkey first, so the outer
  join and the first groupBy share one exchange; the second groupBy
  (on the count) is tiny. Customers with zero orders survive via the
  outer join — at scale this is the skew-prone side (many-zero-order
  keys are fine: they aggregate to one row each).
- Q17 shape: the per-part average is a groupBy on l_partkey followed
  by a join back to lineitem on the SAME key — Catalyst plans one
  hash-partitioning on l_partkey reused by both, and the filtered
  `part` dim (15 rows here, still small at any SF after the
  brand+type filter) broadcasts.
- Q18 shape: sum(l_quantity) per order runs BEFORE joining
  customer/orders, so the join input is one row per qualifying order,
  not per lineitem.
- Q19 shape: the OR-of-ANDs predicate references both sides, so it
  evaluates post-join, but the per-side envelopes (p_brand IN (...),
  l_quantity range) are pushed to the scans.
- Determinism: l_quantity is integral (sums exact in double);
  acctbal thresholds go through integer cents (round(bal*100)) so the
  Spark and DuckDB averages agree bit-for-bit (see SCALE.md). Bound:
  exact while every PARTIAL sum of cents stays under 2^53 (~9e13
  dollars — far above any fixture SF; a 100-TB deployment crossing it
  should cast the cents column to decimal before the avg, making the
  threshold exact at any magnitude).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import cents, discounted_revenue, money, money_sum, tick_sum


def q_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: orders (one year) having at least one lineitem shipped
    more than 90 days after the order date, counted per priority.
    EXISTS → left_semi join with a non-equi conjunct."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        o.join(l, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


_LATE_SHIPMENT_PRIORITY_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: distribution of orders-per-customer, including the
    zero bucket — left outer join, then two stacked aggregations."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


_ORDER_COUNT_DISTRIBUTION_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q_small_qty_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: yearly-ized revenue of small-quantity lineitems for
    one brand+type — per-part average quantity joined back to lineitem
    on the same key (one exchange on l_partkey serves both), filtered
    part dim broadcast. l_quantity is integral so avg is exact."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "ECONOMY")
    )
    keys = F.broadcast(p.select("p_partkey"))
    # The average is per-part, so restricting its input to qualifying
    # parts (broadcast semi) is semantics-preserving and turns a
    # full-lineitem shuffle into one over ~|keys| parts' rows.
    part_avg = (
        l.join(keys, l.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.avg("l_quantity").alias("avg_qty"))
    )
    return (
        l.join(keys, l.l_partkey == F.col("p_partkey"))
        .join(part_avg, "l_partkey")
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(F.round(tick_sum("l_extendedprice") / 100.0 / 7.0, 2).alias("avg_yearly"))
    )


_SMALL_QTY_PART_REVENUE_SQL = """
SELECT ROUND(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) / 100.0 / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p_brand = 'Brand#3' AND p_type = 'ECONOMY'
  AND l_quantity < 0.5 * (
    SELECT AVG(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
  )
"""


def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: customers whose single orders exceed 300 units —
    the per-order quantity aggregate runs BEFORE the customer/orders
    joins, so join inputs are one row per qualifying order."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            # integral doubles — cast to long so both engines emit the same type
            F.col("total_qty").cast("long").alias("total_qty"),
        )
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey").asc())
    )


_LARGE_VOLUME_CUSTOMERS_SQL = """
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       ROUND(o_totalprice, 2) AS totalprice,
       CAST(SUM(l_quantity) AS BIGINT) AS total_qty
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_name, c_custkey, o_orderkey, orderdate, totalprice
HAVING SUM(l_quantity) > 300
ORDER BY totalprice DESC, o_orderkey
"""


def q_disjunctive_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: revenue under an OR of brand/size/quantity conjunct
    bands. The quantity and size envelopes are scan-pushable; the
    cross-side conjuncts evaluate at the join."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(band)
        .agg(money_sum(discounted_revenue(), 10_000).alias("revenue"))
    )


_DISJUNCTIVE_PART_REVENUE_SQL = """
SELECT ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) / 10000.0, 2) AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: above-average-balance customers with no recent
    orders, summarized per market segment. NOT EXISTS → left_anti on
    the date-filtered orders; the balance threshold is an integer-cent
    average (exact in double on both engines, see module docstring)."""
    c = load_table(spark, sf_dir, "customer")
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    bal = cents("c_acctbal")
    threshold = c.filter(F.col("c_acctbal") > 0).agg(F.avg(bal).alias("t"))
    return (
        c.join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(threshold))
        .filter(bal > F.col("t"))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            money_sum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


_IDLE_RICH_CUSTOMERS_SQL = """
SELECT c_mktsegment, COUNT(*) AS numcust,
       ROUND(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) / 100.0, 2) AS totacctbal
FROM customer c
WHERE ROUND(c_acctbal * 100) > (
    SELECT AVG(ROUND(c_acctbal * 100)) FROM customer WHERE c_acctbal > 0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= TIMESTAMP '2000-01-01'
  )
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def q_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: shipped volume between two nations (either direction),
    per direction per year. supplier-nation and customer-nation ride
    separate broadcast copies of `nation`; the disjunctive pair
    predicate evaluates after both are attached."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(money_sum(discounted_revenue(), 10_000).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_NATION_PAIR_VOLUME_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) / 10000.0, 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: one nation's share of a region's revenue per year —
    conditional aggregation (sum-of-CASE / total) over a 6-way join.
    The share divides two sums from the SAME aggregated rows, so no
    second pass over the fact table."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n_cust = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n_supp = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev_t = F.round(discounted_revenue() * 10_000, 0).cast("long")
    national_t = F.when(
        F.col("supp_nation") == "NATION_5", rev_t
    ).otherwise(F.lit(0).cast("long"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_cust), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == r.r_regionkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_supp), s.s_nationkey == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(F.sum(national_t) / F.sum(rev_t), 6).alias("mkt_share"),
            F.round(F.sum(rev_t) / 10_000.0, 2).alias("region_revenue"),
        )
        .orderBy("o_year")
    )


_MARKET_SHARE_SQL = """
SELECT year(o_orderdate) AS o_year,
       ROUND(SUM(CASE WHEN n2.n_name = 'NATION_5'
                      THEN CAST(ROUND(l_extendedprice * (1 - l_discount)
                                      * 10000, 0) AS BIGINT)
                      ELSE 0 END)
             / SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0)
                        AS BIGINT)), 6) AS mkt_share,
       ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0)
                      AS BIGINT)) / 10000.0, 2) AS region_revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY o_year
ORDER BY o_year
"""


def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: supplier(s) achieving the maximum quarterly revenue
    — an aggregate view consumed twice (scalar max + equality filter).
    Spark reuses the aggregated exchange for both branches; no second
    scan of lineitem."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = (
        l.groupBy("l_suppkey")
        .agg(money_sum(discounted_revenue(), 10_000).alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("m"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


_TOP_SUPPLIER_REVENUE_SQL = """
WITH revenue AS (
  SELECT l_suppkey, ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) / 10000.0, 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct suppliers per (brand, type, size) for
    non-promo parts, excluding a denylisted supplier set (NOT IN →
    anti join against a tiny aggregated list). The distinct-count
    rides the (partkey-joined) fact; top 10 categories."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") != "PROMO")
    denylist = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(denylist), l.l_suppkey == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            "p_brand",
            "p_type",
            F.col("p_size").asc(),
        )
        .limit(10)
    )


_SUPPLIER_DIVERSITY_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_type <> 'PROMO'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 10
"""


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase per user:
    a user advances a stage only with an event AT OR AFTER their
    previous stage's first event. Three stage aggregations, each
    joined on user_id — all shuffles share one key, so Catalyst plans
    one hash partitioning reused down the chain. The output is the
    per-stage user count (funnel drop-off)."""
    e = load_table(spark, sf_dir, "events")

    def first_after(df, etype, prev):
        ev = e.filter(F.col("event_type") == etype)
        if prev is not None:
            ev = ev.join(prev, "user_id").filter(F.col("ts") >= F.col("t0")).drop("t0")
        return ev.groupBy("user_id").agg(F.min("ts").alias("t0"))

    views = first_after(e, "view", None)
    clicks = first_after(e, "click", views)
    buys = first_after(e, "purchase", clicks)
    return (
        views.agg(F.count(F.lit(1)).alias("n")).select(F.lit("1_view").alias("stage"), "n")
        .unionAll(clicks.agg(F.count(F.lit(1)).alias("n")).select(F.lit("2_click").alias("stage"), "n"))
        .unionAll(buys.agg(F.count(F.lit(1)).alias("n")).select(F.lit("3_purchase").alias("stage"), "n"))
        .orderBy("stage")
    )


_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t0 FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t0
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts >= v.t0
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t0
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts >= c.t0
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT stage, n FROM (
  SELECT '1_view' AS stage, COUNT(*) AS n FROM v
  UNION ALL SELECT '2_click', COUNT(*) FROM c
  UNION ALL SELECT '3_purchase', COUNT(*) FROM p
) ORDER BY stage
"""


QUERIES = {
    "late_shipment_priority": q_late_shipment_priority,
    "funnel": q_funnel,
    "order_count_distribution": q_order_count_distribution,
    "small_qty_part_revenue": q_small_qty_part_revenue,
    "large_volume_customers": q_large_volume_customers,
    "disjunctive_part_revenue": q_disjunctive_part_revenue,
    "idle_rich_customers": q_idle_rich_customers,
    "nation_pair_volume": q_nation_pair_volume,
    "market_share": q_market_share,
    "top_supplier_revenue": q_top_supplier_revenue,
    "supplier_diversity": q_supplier_diversity,
}

ORACLE = {
    "late_shipment_priority": _LATE_SHIPMENT_PRIORITY_SQL,
    "order_count_distribution": _ORDER_COUNT_DISTRIBUTION_SQL,
    "small_qty_part_revenue": _SMALL_QTY_PART_REVENUE_SQL,
    "large_volume_customers": _LARGE_VOLUME_CUSTOMERS_SQL,
    "disjunctive_part_revenue": _DISJUNCTIVE_PART_REVENUE_SQL,
    "idle_rich_customers": _IDLE_RICH_CUSTOMERS_SQL,
    "nation_pair_volume": _NATION_PAIR_VOLUME_SQL,
    "market_share": _MARKET_SHARE_SQL,
    "top_supplier_revenue": _TOP_SUPPLIER_REVENUE_SQL,
    "supplier_diversity": _SUPPLIER_DIVERSITY_SQL,
    "funnel": _FUNNEL_SQL,
}
