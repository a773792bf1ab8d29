"""Join family (SURVEY §2.3 J1-J9).

The reference's join-like semantics are key lookups
(reference spark-job/etl_job.py:102 find_one watermark;
reference ml-service/ml_pipeline.py:260 model fetch) and symbol-set
union (reference api/prediction_api.py:369-376). Harness coverage adds
the full equi/outer/semi/anti/range/as-of family over the star schema.

Scale notes: dimension joins (nation/region/supplier) are explicit
``F.broadcast`` — at 100 TB the fact side streams, dims ship once per
executor, zero shuffle. orders⋈lineitem is a genuine big-big join:
both sides hash-partition on the key; AQE handles skew. The as-of join
is union+window (one shuffle, no explosion) — see operators/joins.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.columns import discounted_revenue, money_sum, tick_avg
from ..functions.frames import literal_frame
from ..operators.joins import asof_join, range_join


def q_join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J5: fact ⋈ broadcast dims (customer -> nation -> region).

    The Spark-first form of the reference's per-key dimension lookup
    (reference etl_job.py:102): instead of N driver-side find_one
    calls, one broadcast hash join.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "inner")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "inner")
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.count(F.lit(1)).alias("customers"),
            money_sum("c_acctbal").alias("total_acctbal"),
        )
    )


_JOIN_BROADCAST_DIMS_SQL = """
SELECT
  r_name AS region_name,
  n_name AS nation_name,
  COUNT(*) AS customers,
  ROUND(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) / 100.0, 2) AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def q_join_big_big(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: orders ⋈ lineitem — the genuine shuffle join.

    Both sides hash-partition on l_orderkey/o_orderkey; Catalyst picks
    SMJ or shuffled-hash, AQE splits skewed partitions at runtime.
    """
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey, "inner")
        .filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("line_count"),
            money_sum(discounted_revenue(), 10_000).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


_JOIN_BIG_BIG_SQL = """
SELECT
  o_orderpriority,
  COUNT(*) AS line_count,
  ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0)
                 AS BIGINT)) / 10000.0, 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 outer: every customer with order stats, null-preserving."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_sum("o_totalprice", 10_000).alias("spend"),
    )
    return c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left").select(
        "c_custkey",
        "c_mktsegment",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("spend", F.lit(0.0)).alias("spend"),
    )


_JOIN_LEFT_OUTER_SQL = """
SELECT
  c_custkey,
  c_mktsegment,
  COALESCE(n_orders, 0) AS n_orders,
  COALESCE(spend, 0.0) AS spend
FROM customer
LEFT JOIN (
  SELECT o_custkey, COUNT(*) AS n_orders, ROUND(SUM(CAST(ROUND(o_totalprice * 10000, 0) AS BIGINT)) / 10000.0, 2) AS spend
  FROM orders GROUP BY o_custkey
) po ON c_custkey = po.o_custkey
"""


def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 full outer: symbol-set reconciliation, the Spark form of the
    reference's symbols-with-models vs symbols-with-data merge
    (reference prediction_api.py:369-376)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "full_outer")
        .select(
            F.coalesce("c_custkey", "o_custkey").alias("custkey"),
            F.col("c_nationkey").alias("nationkey"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.col("c_custkey").isNotNull().alias("has_customer_row"),
        )
    )


_JOIN_FULL_OUTER_SQL = """
SELECT
  COALESCE(c_custkey, o_custkey) AS custkey,
  c_nationkey AS nationkey,
  COALESCE(n_orders, 0) AS n_orders,
  c_custkey IS NOT NULL AS has_customer_row
FROM (SELECT c_custkey, c_nationkey FROM customer) c
FULL OUTER JOIN (
  SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
) o ON c_custkey = o_custkey
"""


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 semi: customers having at least one high-value order (EXISTS)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


_JOIN_SEMI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0
)
"""


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 anti: customers with no urgent high-value order (NOT EXISTS)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 150000.0)
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


_JOIN_ANTI_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderpriority = '1-URGENT' AND o.o_totalprice > 150000.0
)
"""


def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 theta/range: price-band classification of orders.

    Equi part (none — the band table is tiny) + range predicate; the
    band dim is broadcast so this is a broadcast nested-loop over 5
    rows, not a cartesian blow-up.
    """
    o = load_table(spark, sf_dir, "orders")
    # literal_frame (not createDataFrame(list)) so the 5-row band dim
    # plans as LocalTableScan — the node the cross-join lint can PROVE
    # bounded; the raw list would plan Scan ExistingRDD, which the
    # lint no longer blesses (advisor finding r10)
    bands = literal_frame(
        spark,
        [
            ("tiny", 0.0, 50000.0),
            ("small", 50000.0, 125000.0),
            ("medium", 125000.0, 250000.0),
            ("large", 250000.0, 400000.0),
            ("huge", 400000.0, 1e18),
        ],
        "band STRING, lo DOUBLE, hi DOUBLE",
    )
    joined = range_join(
        o,
        bands,
        equi=[],
        range_cond=(o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
    )
    return (
        joined.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            tick_avg("o_totalprice", 10_000).alias("avg_price"),
        )
        .orderBy("band")
    )


_JOIN_RANGE_SQL = """
WITH bands(band, lo, hi) AS (
  VALUES ('tiny', 0.0, 50000.0), ('small', 50000.0, 125000.0),
         ('medium', 125000.0, 250000.0), ('large', 250000.0, 400000.0),
         ('huge', 400000.0, 1e18)
)
SELECT band, COUNT(*) AS n_orders, ROUND(SUM(CAST(ROUND(o_totalprice * 10000, 0) AS BIGINT)) / (10000.0 * COUNT(o_totalprice)), 6) AS avg_price
FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band
ORDER BY band
"""


def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 as-of: each purchase matched to the user's most recent prior
    (or simultaneous) signup/click value.

    union+window LOCF formulation (operators/joins.py) — the
    scale-safe as-of; oracle is DuckDB's native ASOF JOIN.
    """
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    joined = asof_join(
        purchases,
        clicks,
        on="ts",
        by=["user_id"],
        right_values=["click_value"],
        suffix="",
    )
    return joined.select(
        "user_id",
        "event_id",
        F.round("value", 2).alias("purchase_value"),
        F.round("click_value", 2).alias("last_click_value"),
    )


_JOIN_ASOF_SQL = """
WITH purchases AS (
  SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, ts, MAX(value) AS click_value
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
)
SELECT
  p.user_id,
  p.event_id,
  ROUND(p.value, 2) AS purchase_value,
  ROUND(c.click_value, 2) AS last_click_value
FROM purchases p
ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


ASOF_TOL_S = 3600


def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a match tolerance (pandas merge_asof parity):
    each purchase takes the user's most recent prior click value, but
    only if that click is within the last hour — older matches null
    out. Tolerance rides the same LOCF window as the value columns
    (one extra carried column, no second join); the staleness test is
    integer-microsecond arithmetic, exact on both engines."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    joined = asof_join(
        purchases,
        clicks,
        on="ts",
        by=["user_id"],
        right_values=["click_value"],
        suffix="",
        tolerance_seconds=ASOF_TOL_S,
    )
    return joined.select(
        "user_id",
        "event_id",
        F.round("value", 2).alias("purchase_value"),
        F.round("click_value", 2).alias("recent_click_value"),
    )


_JOIN_ASOF_TOLERANCE_SQL = f"""
WITH purchases AS (
  SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, ts, MAX(value) AS click_value
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
)
SELECT
  p.user_id,
  p.event_id,
  ROUND(p.value, 2) AS purchase_value,
  CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= CAST({ASOF_TOL_S} AS BIGINT) * 1000000
       THEN ROUND(c.click_value, 2) END AS recent_click_value
FROM purchases p
ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def q_interval_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless big-big interval join: each purchase matched to ALL
    error events (any user) in the 5 minutes after it, via time-bucket
    banding (operators/joins.py::banded_interval_join) — hash join on
    the bucket id, never a nested-loop. Aggregated per purchase."""
    from ..operators.joins import banded_interval_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("ts").alias("e_ts"), F.col("value").alias("e_value")
    )
    joined = banded_interval_join(
        purchases, errors, "p_ts", "e_ts", after_seconds=300
    )
    return (
        joined.groupBy("purchase_id")
        .agg(
            F.count(F.lit(1)).alias("n_errors"),
            money_sum("e_value").alias("error_value_sum"),
        )
        .orderBy("purchase_id")
    )


_INTERVAL_JOIN_EVENTS_SQL = """
SELECT p.event_id AS purchase_id,
       COUNT(*) AS n_errors,
       ROUND(SUM(CAST(ROUND(e.value * 100, 0) AS BIGINT)) / 100.0, 2) AS error_value_sum
FROM events p
JOIN events e
  ON e.ts >= p.ts AND e.ts <= p.ts + INTERVAL 300 SECOND
WHERE p.event_type = 'purchase' AND e.event_type = 'error'
GROUP BY p.event_id
ORDER BY purchase_id
"""


def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join (``<=>`` / IS NOT DISTINCT FROM): NULL keys
    MATCH each other instead of vanishing — the semantics reconciliation
    jobs need when the join key is itself optional. Spark still plans a
    hash join (the null bucket is one key), unlike an OR-isnull rewrite
    which degenerates to nested-loop.

    Key = order priority with one value nulled out (NULLIF), so the
    null bucket is big enough to prove the match behavior."""
    o = load_table(spark, sf_dir, "orders")
    left = o.groupBy(
        F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("prio")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    right = o.filter(F.col("o_totalprice") > 100000).groupBy(
        F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("prio")
    ).agg(F.count(F.lit(1)).alias("n_big"))
    return (
        left.join(right, left["prio"].eqNullSafe(right["prio"]), "left")
        .select(
            left["prio"].alias("priority_key"),
            "n_orders",
            F.coalesce("n_big", F.lit(0)).alias("n_big"),
        )
        .orderBy(F.col("priority_key").asc_nulls_first())
    )


_JOIN_NULL_SAFE_SQL = """
WITH l AS (
  SELECT NULLIF(o_orderpriority, '1-URGENT') AS prio,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
),
r AS (
  SELECT NULLIF(o_orderpriority, '1-URGENT') AS prio,
         CAST(COUNT(*) AS BIGINT) AS n_big
  FROM orders WHERE o_totalprice > 100000 GROUP BY 1
)
SELECT l.prio AS priority_key, l.n_orders,
       CAST(COALESCE(r.n_big, 0) AS BIGINT) AS n_big
FROM l LEFT JOIN r ON l.prio IS NOT DISTINCT FROM r.prio
ORDER BY priority_key ASC NULLS FIRST
"""


QUERIES = {
    "interval_join_events": q_interval_join_events,
    "join_broadcast_dims": q_join_broadcast_dims,
    "join_big_big": q_join_big_big,
    "join_left_outer": q_join_left_outer,
    "join_full_outer": q_join_full_outer,
    "join_semi": q_join_semi,
    "join_anti": q_join_anti,
    "join_range": q_join_range,
    "join_asof": q_join_asof,
    "join_asof_tolerance": q_join_asof_tolerance,
    "join_null_safe": q_join_null_safe,
}

ORACLE = {
    "interval_join_events": _INTERVAL_JOIN_EVENTS_SQL,
    "join_broadcast_dims": _JOIN_BROADCAST_DIMS_SQL,
    "join_big_big": _JOIN_BIG_BIG_SQL,
    "join_left_outer": _JOIN_LEFT_OUTER_SQL,
    "join_full_outer": _JOIN_FULL_OUTER_SQL,
    "join_semi": _JOIN_SEMI_SQL,
    "join_anti": _JOIN_ANTI_SQL,
    "join_range": _JOIN_RANGE_SQL,
    "join_asof": _JOIN_ASOF_SQL,
    "join_asof_tolerance": _JOIN_ASOF_TOLERANCE_SQL,
    "join_null_safe": _JOIN_NULL_SAFE_SQL,
}
