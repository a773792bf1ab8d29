"""Aggregations, sorts/top-k, set operations (SURVEY §2.4, §2.6, §2.7).

Reference semantics re-expressed:
- grouped count (reference api/prediction_api.py:282-291 ``$group $sum``)
- latest-per-group argmax (reference ml-service/ml_scheduler.py:142-149
  ``$sort + $group $first`` — the canonical Spark window row_number)
- distinct / count-distinct (reference ml_pipeline.py:374,
  prediction_api.py:332)
- avg/min/max summaries (reference prediction_api.py:322-342)
- sort+limit top-N (reference prediction_api.py:236-250)
- union+distinct of key sets (reference prediction_api.py:375)
plus harness coverage the reference lacks: rollup, cube, having,
intersect/except.

Scale notes: all groupBys here get map-side partial aggregation from
Catalyst automatically. Top-k uses orderBy+limit which Spark plans as
TakeOrderedAndProject (per-partition heaps, no global sort). Argmax is
a single window shuffle, not a self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.columns import money_sum, tick_avg


def q_group_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A6/A7: multi-key group, full agg family, HAVING filter.

    avg/stddev are derived from EXACT integer-cent moments (Σc as
    bigint, Σc² summed as decimal(38,0) — Σc² overflows bigint at
    ~6e5 rows of 1e7-cent prices), not from float stddev/avg: both
    engines' native stddev merge partial float states in
    partition-dependent order, so the 6dp-rounded value can flip at
    a rounding boundary between runs/engines — the same latent-flake
    class fixed in anomaly_seasonal (round 7). sd² = (n·Σc² −
    (Σc)²)/(n(n−1)) is computed in exact decimal/hugeint on both
    sides, converted to double ONCE (correctly rounded from an
    engine-identical exact integer), then one sqrt + one divide —
    deterministic everywhere. Bounds: values stay under 1e38 through
    n ≈ 1e12 rows/group at 1e7-cent prices; map-side partial
    aggregation still applies (sum/count are algebraic)."""
    l = load_table(spark, sf_dir, "lineitem")
    c = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    m = (
        l.select(
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            c.alias("_c"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
            F.sum("_c").alias("_s"),
            F.sum((F.col("_c") * F.col("_c")).cast("decimal(28,0)")).alias(
                "_q"
            ),
        )
    )
    d = F.col("n").cast("decimal(18,0)") * F.col("_q") - F.col("_s").cast(
        "decimal(19,0)"
    ) * F.col("_s").cast("decimal(19,0)")
    return (
        m.filter(F.col("n") > 100)
        .select(
            "l_returnflag",
            "l_linestatus",
            "n",
            "total_qty",
            F.round(F.col("_s") / (F.lit(100.0) * F.col("n")), 6).alias(
                "avg_price"
            ),
            "min_price",
            "max_price",
            F.round(
                F.sqrt(
                    d.cast("double") / (F.col("n") * (F.col("n") - 1))
                )
                / 100.0,
                6,
            ).alias("std_price"),
        )
    )


_GROUP_AGG_HAVING_SQL = """
WITH m AS (
  SELECT
    l_returnflag, l_linestatus,
    CAST(COUNT(*) AS BIGINT) AS n,
    ROUND(SUM(l_quantity), 2) AS total_qty,
    ROUND(MIN(l_extendedprice), 2) AS min_price,
    ROUND(MAX(l_extendedprice), 2) AS max_price,
    SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS s,
    SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
        * CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS q
  FROM lineitem
  GROUP BY l_returnflag, l_linestatus
  HAVING COUNT(*) > 100
)
SELECT
  l_returnflag, l_linestatus, n, total_qty,
  ROUND(s / (100.0 * n), 6) AS avg_price,
  min_price, max_price,
  ROUND(SQRT(CAST(n * q - CAST(s AS HUGEINT) * s AS DOUBLE)
             / (n * (n - 1))) / 100.0, 6) AS std_price
FROM m
"""


def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/A8: exact count-distinct per group.

    (At 100 TB the default would be ``approx_count_distinct`` — HLL,
    no exact-distinct shuffle; exact kept here because the oracle
    hash-compares values.)
    """
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_suppliers"),
        F.count(F.lit(1)).alias("n_rows"),
    )


_COUNT_DISTINCT_SQL = """
SELECT
  l_returnflag,
  COUNT(DISTINCT l_partkey) AS distinct_parts,
  COUNT(DISTINCT l_suppkey) AS distinct_suppliers,
  COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup with sentinel-filled subtotal rows."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum("o_totalprice", 10_000).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


_ROLLUP_SQL = """
SELECT
  COALESCE(o_orderstatus, 'ALL') AS status,
  COALESCE(o_orderpriority, 'ALL') AS priority,
  COUNT(*) AS n_orders,
  ROUND(SUM(CAST(ROUND(o_totalprice * 10000, 0) AS BIGINT)) / 10000.0, 2) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form rollup/cube sugar
    over: per-status totals, per-priority totals, and one grand total,
    WITHOUT the (status, priority) pairs a cube would add. Spark plans
    one Expand + one aggregation — a single pass over orders however
    many sets are requested."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum("o_totalprice", 10_000).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


_GROUPING_SETS_SQL = """
SELECT
  COALESCE(o_orderstatus, 'ALL') AS status,
  COALESCE(o_orderpriority, 'ALL') AS priority,
  COUNT(*) AS n_orders,
  ROUND(SUM(CAST(ROUND(o_totalprice * 10000, 0) AS BIGINT)) / 10000.0, 2) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cube over two dimensions."""
    e = load_table(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyy-MM-dd")
    return (
        e.withColumn("day", day)
        .cube("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n"),
            money_sum("value").alias("total_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce("day", F.lit("ALL")).alias("day"),
            "n",
            "total_value",
        )
    )


_CUBE_SQL = """
SELECT
  COALESCE(event_type, 'ALL') AS event_type,
  COALESCE(strftime(ts, '%Y-%m-%d'), 'ALL') AS day,
  COUNT(*) AS n,
  ROUND(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0, 2) AS total_value
FROM events
GROUP BY CUBE (event_type, strftime(ts, '%Y-%m-%d'))
"""


def q_argmax_latest_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/W10/O4: latest order per customer — the Spark argmax.

    Reference shape: ``$sort created_at desc + $group $first``
    (reference ml_scheduler.py:142-149) and best-model
    ``find_one(sort=[('r2_score',-1)])`` (reference
    ml_pipeline.py:288-291). One window, deterministic tiebreak on the
    unique key.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("latest_orderdate"),
            F.round("o_totalprice", 2).alias("latest_totalprice"),
        )
    )


_ARGMAX_LATEST_PER_GROUP_SQL = """
SELECT
  o_custkey,
  o_orderkey AS latest_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS latest_orderdate,
  ROUND(o_totalprice, 2) AS latest_totalprice
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
  ) AS rn
  FROM orders
) t
WHERE rn = 1
"""


def q_top_n_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per priority class (window top-k)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "o_orderpriority",
            "rnk",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
        )
    )


_TOP_N_PER_GROUP_SQL = """
SELECT o_orderpriority, rnk, o_orderkey, ROUND(o_totalprice, 2) AS totalprice
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC
  ) AS rnk
  FROM orders
) t
WHERE rnk <= 3
"""


def q_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: global sort+limit — planned as TakeOrderedAndProject.

    Reference shape: latest-N predictions
    (reference prediction_api.py:236-250). Unique-key tiebreak keeps
    the result deterministic.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
        .select(
            "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"), "o_orderstatus"
        )
    )


_GLOBAL_TOPK_SQL = """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice, o_orderstatus
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 25
"""


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1/U2 + harness intersect/except over customer-key slices.

    big spenders UNION auto-segment, INTERSECT with machinery-nation
    keys, EXCEPT customers with open orders; tagged per-branch so one
    result covers all three operators.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    big = (
        o.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("spend"))
        .filter(F.col("spend") > 400000.0)
        .select(F.col("o_custkey").alias("custkey"))
    )
    auto = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select(
        F.col("c_custkey").alias("custkey")
    )
    open_orders = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    union_d = big.union(auto).distinct()
    inter = union_d.intersect(
        c.filter(F.col("c_acctbal") > 0).select(F.col("c_custkey").alias("custkey"))
    )
    diff = inter.exceptAll(open_orders.distinct())
    return diff.select("custkey").orderBy("custkey")


_SET_OPS_SQL = """
WITH big AS (
  SELECT o_custkey AS custkey FROM orders
  GROUP BY o_custkey HAVING SUM(o_totalprice) > 400000.0
),
auto AS (
  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
),
pos AS (
  SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0
),
open_orders AS (
  SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
)
SELECT custkey FROM (
  (SELECT custkey FROM big UNION SELECT custkey FROM auto)
  INTERSECT
  SELECT custkey FROM pos
)
EXCEPT ALL
SELECT custkey FROM open_orders
ORDER BY custkey
"""


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (median/p90) — the
    distribution summary the reference's avg/min/max lacks (A7+).

    Spark ``percentile`` and DuckDB ``quantile_cont`` share the linear
    interpolation definition. (At 100 TB the documented alternative is
    ``approx_percentile`` — mergeable t-digest-style sketch.)
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias("p90_price"),
        F.count(F.lit(1)).alias("n"),
    )


_PERCENTILES_SQL = """
SELECT
  o_orderpriority,
  ROUND(quantile_cont(o_totalprice, 0.5), 6) AS median_price,
  ROUND(quantile_cont(o_totalprice, 0.9), 6) AS p90_price,
  COUNT(*) AS n
FROM orders
GROUP BY o_orderpriority
"""


def q_merge_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: the reference's ``$mergeObjects`` of latest-doc + counts per
    group (reference api/prediction_api.py:281-318) — in Spark, a join
    of two aggregates on the group key: latest order per customer
    merged with that customer's order stats."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    latest = (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.col("o_orderstatus").alias("latest_status"),
        )
    )
    stats = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        tick_avg("o_totalprice", 10_000).alias("avg_price"),
    )
    return latest.join(stats, "o_custkey").select(
        "o_custkey", "latest_orderkey", "latest_status", "n_orders", "avg_price"
    )


_MERGE_AGGREGATES_SQL = """
WITH latest AS (
  SELECT o_custkey, o_orderkey AS latest_orderkey, o_orderstatus AS latest_status
  FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
    ) AS rn FROM orders
  ) t WHERE rn = 1
),
stats AS (
  SELECT o_custkey, COUNT(*) AS n_orders, ROUND(SUM(CAST(ROUND(o_totalprice * 10000, 0) AS BIGINT)) / (10000.0 * COUNT(o_totalprice)), 6) AS avg_price
  FROM orders GROUP BY o_custkey
)
SELECT l.o_custkey, latest_orderkey, latest_status, n_orders, avg_price
FROM latest l JOIN stats s ON l.o_custkey = s.o_custkey
"""


def q_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-tier percentiles: ``approx_percentile`` (mergeable
    KLL-style sketch, accuracy=10000) per group. The 100 TB companion
    to q_percentiles' exact interpolation — sketches merge map-side,
    so the shuffle carries one bounded sketch per (task, group) no
    matter the row count. Engine-specific sketch → rows-only driver
    check; error vs the exact percentiles pinned in
    tests/test_properties.py."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(
            F.expr("approx_percentile(o_totalprice, 0.5, 10000)"), 6
        ).alias("approx_median_price"),
        F.round(
            F.expr("approx_percentile(o_totalprice, 0.9, 10000)"), 6
        ).alias("approx_p90_price"),
        F.count(F.lit(1)).alias("n"),
    )


QUERIES = {
    "percentiles": q_percentiles,
    "approx_percentiles": q_approx_percentiles,
    "merge_aggregates": q_merge_aggregates,
    "group_agg_having": q_group_agg_having,
    "count_distinct": q_count_distinct,
    "rollup": q_rollup,
    "cube": q_cube,
    "grouping_sets": q_grouping_sets,
    "argmax_latest_per_group": q_argmax_latest_per_group,
    "top_n_per_group": q_top_n_per_group,
    "global_topk": q_global_topk,
    "set_ops": q_set_ops,
}

ORACLE = {
    "percentiles": _PERCENTILES_SQL,
    "merge_aggregates": _MERGE_AGGREGATES_SQL,
    "group_agg_having": _GROUP_AGG_HAVING_SQL,
    "count_distinct": _COUNT_DISTINCT_SQL,
    "rollup": _ROLLUP_SQL,
    "cube": _CUBE_SQL,
    "grouping_sets": _GROUPING_SETS_SQL,
    "argmax_latest_per_group": _ARGMAX_LATEST_PER_GROUP_SQL,
    "top_n_per_group": _TOP_N_PER_GROUP_SQL,
    "global_topk": _GLOBAL_TOPK_SQL,
    "set_ops": _SET_OPS_SQL,
}
