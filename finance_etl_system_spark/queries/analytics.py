"""Classic multi-join analytic queries (TPC-H Q3/Q5/Q10 shapes,
adapted to the fixture star schema).

The reference has zero DataFrame joins (SURVEY §2.3) — these queries
are the harness-coverage tier that proves the engine handles the
plans a real warehouse workload produces: 3- to 6-way joins, selective
date/segment predicates that must reach the parquet scan, partial
aggregation before the shuffle, and top-k without a global sort.

Scale notes (100 TB posture):
- nation/region are broadcast explicitly; customer/orders/lineitem
  shuffle on their join keys — at 1000 executors AQE re-plans the
  post-filter sides (the date filters cut orders by ~6×) into
  broadcasts when they fit, which is exactly the plan we want.
- Every filter is a plain column predicate → Catalyst pushes it into
  the scan (PushedFilters), so a year of orders is read, not seven.
- Top-k goes through orderBy(...).limit(k) → TakeOrderedAndProject:
  per-partition heaps, only k rows per partition reach the driver.
- Revenue is rounded 2dp on BOTH engines and every top-k carries a
  unique-key tiebreak (l_orderkey / c_custkey) per the oracle policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.columns import discounted_revenue, tick_sum

def _revenue():
    # built lazily — Column construction needs an active SparkContext,
    # and this module must import before the session exists.
    # EXACT 1e4-tick accumulation (the 2dp x 2dp product is a 4dp
    # rational): order-insensitive bigint sum, one double division —
    # round-7 determinism policy (functions/columns.tick_sum)
    return tick_sum(discounted_revenue(), 10_000) / 10_000.0


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: unshipped high-revenue orders for one market segment.

    customer(filtered) ⋈ orders(date-filtered) ⋈ lineitem
    (date-filtered), revenue per order, top 10.
    """
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-01-01"
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-01-01"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(F.round(_revenue(), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


_SHIPPING_PRIORITY_SQL = """
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority,
       ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) / 10000.0, 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: revenue by nation where the supplier and the customer
    share a nation, one region, one order year. Six-way join; the
    c_nationkey = s_nationkey predicate rides on the supplier join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(_revenue(), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("nation").asc())
    )


_LOCAL_SUPPLIER_VOLUME_SQL = """
SELECT n_name AS nation,
       ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) / 10000.0, 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, nation
"""


def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: customers who returned the most revenue in two
    quarters — 4-way join, per-customer aggregate, top 20."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            F.round("c_acctbal", 2).alias("acctbal"),
        )
        .agg(F.round(_revenue(), 2).alias("revenue"))
        .select("c_custkey", "c_name", "nation", "revenue", "acctbal")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


_RETURNED_ITEMS_SQL = """
SELECT c_custkey, c_name, n_name AS nation,
       ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) / 10000.0, 2) AS revenue,
       ROUND(c_acctbal, 2) AS acctbal
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: monthly share of promo-part revenue — the
    conditional-aggregation (sum-of-CASE over a join) pattern, and the
    only query family touching ``part``. No explicit broadcast: the
    projected part side is (p_partkey, p_type) and AQE promotes it to
    a broadcast when it fits, which is the right call at any scale."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev_t = F.round(rev * 10_000, 0).cast("long")
    promo_t = F.when(F.col("p_type") == "PROMO", rev_t).otherwise(F.lit(0).cast("long"))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.round(
                100.0 * F.sum(promo_t) / F.sum(rev_t), 6
            ).alias("promo_pct"),
            F.round(F.sum(rev_t) / 10_000.0, 2).alias("total_revenue"),
        )
        .orderBy("ship_month")
    )


_PROMO_REVENUE_SQL = """
SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
       ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                              THEN CAST(ROUND(l_extendedprice * (1 - l_discount)
                                              * 10000, 0) AS BIGINT)
                              ELSE 0 END)
             / SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0)
                        AS BIGINT)), 6) AS promo_pct,
       ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) / 10000.0, 2) AS total_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
GROUP BY ship_month
ORDER BY ship_month
"""


QUERIES = {
    "shipping_priority": q_shipping_priority,
    "promo_revenue": q_promo_revenue,
    "local_supplier_volume": q_local_supplier_volume,
    "returned_items": q_returned_items,
}

ORACLE = {
    "shipping_priority": _SHIPPING_PRIORITY_SQL,
    "promo_revenue": _PROMO_REVENUE_SQL,
    "local_supplier_volume": _LOCAL_SUPPLIER_VOLUME_SQL,
    "returned_items": _RETURNED_ITEMS_SQL,
}
