"""Raw-SQL API surface: queries expressed as ONE ANSI SQL string that
runs VERBATIM on both Spark (``spark.sql`` over temp views) and the
DuckDB oracle — no DataFrame code, no dialect fork.

This proves the engine's SQL front door (the reference exposes no SQL
at all — its "queries" are Mongo aggregation pipelines, SURVEY §2):
a user can point existing ANSI SQL at the engine unchanged.

Portability rules for the shared strings (both engines):
- ``CAST(SUM(...) AS BIGINT)`` — DuckDB sums to HUGEINT, Spark to
  BIGINT; the cast converges them.
- ``CAST(EXTRACT(year FROM ts) AS INT)`` — DuckDB EXTRACT yields
  BIGINT, Spark INT.
- integer cents for money (exact, order-independent), ROUND only at
  the end, every computed column aliased once.
- no dialect-only functions (no date_diff/datediff, no ``//``/div);
- ``CAST(x AS DOUBLE)`` before any division: Spark SQL parses the
  literal ``100.0`` as DECIMAL and would return DECIMAL columns
  (stringifying as '64377.50' vs the oracle's float '64377.5').

Scale note: the NTILE segmentation query's unpartitioned window
ranks the per-customer AGGREGATE (|customers| rows, not fact rows)
on one partition — fine into the tens of millions, and kept as the
portable-SQL showcase — but |customers| grows with the corpus, so
the scale path is ``sql_customer_segments_scalable`` below: the same
output contract computed as a TWO-PASS percentile cut (1-row
PERCENTILE_DISC aggregate of the spend distribution, cross-joined
back and range-bucketed), whose plan has NO global window — the
1-row cut frame broadcasts and every heavy node stays partitioned.
Boundary tie rule (both engines, documented because it is where the
two queries may differ): a customer whose spend equals a cut value
goes to the LOWER-spend (higher-numbered) segment — NTILE instead
splits ties by o_custkey to equalize counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table

# Revenue by region and year, with each region's share of the year's
# total and its rank within the year — CTEs, a 4-way join, window
# aggregate and window rank, all in one portable statement.
_REGION_SHARE_SQL = """
WITH rev AS (
  SELECT r_name AS region,
         CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS ticks
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name, CAST(EXTRACT(year FROM o_orderdate) AS INT)
)
SELECT region, yr,
       ROUND(CAST(ticks AS DOUBLE) / 100.0, 2) AS revenue,
       ROUND(CAST(ticks AS DOUBLE) / CAST(SUM(ticks) OVER (PARTITION BY yr) AS BIGINT), 6)
         AS year_share,
       CAST(RANK() OVER (PARTITION BY yr ORDER BY ticks DESC) AS INT) AS yr_rank
FROM rev
ORDER BY yr, yr_rank, region
"""

# Customer value segmentation: NTILE quartiles over lifetime spend,
# then per-segment stats — portable window + re-aggregation.
_CUSTOMER_SEGMENTS_SQL = """
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS ticks,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY o_custkey
),
tiled AS (
  SELECT o_custkey, ticks, n_orders,
         CAST(NTILE(4) OVER (ORDER BY ticks DESC, o_custkey) AS INT) AS segment
  FROM spend
)
SELECT segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(CAST(SUM(ticks) AS DOUBLE) / 100.0, 2) AS segment_revenue,
       CAST(SUM(n_orders) AS BIGINT) AS segment_orders,
       ROUND(CAST(MIN(ticks) AS DOUBLE) / 100.0, 2) AS min_spend,
       ROUND(CAST(MAX(ticks) AS DOUBLE) / 100.0, 2) AS max_spend
FROM tiled
GROUP BY segment
ORDER BY segment
"""

# Scale-safe segmentation twin (module docstring "Scale note"): same
# per-segment output columns as _CUSTOMER_SEGMENTS_SQL, but the
# quartile boundaries come from a 1-row PERCENTILE_DISC aggregate
# that Spark broadcasts (BroadcastNestedLoopJoin over a
# zero-grouping aggregate — the exact shape the cross-join lint
# proves bounded), so no node ever single-tasks the |customers|-row
# spend table. Cuts are CAST to BIGINT on both engines (Spark's
# percentile_disc returns DOUBLE, DuckDB's BIGINT; ticks < 2^53 so
# the round-trip is exact). Segment k = number of cuts strictly
# below the customer's spend, counted from the top — ties at a cut
# land in the lower-spend segment (see module docstring).
_CUSTOMER_SEGMENTS_SCALABLE_SQL = """
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS ticks,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY o_custkey
),
cuts AS (
  SELECT CAST(PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY ticks) AS BIGINT) AS q1,
         CAST(PERCENTILE_DISC(0.50) WITHIN GROUP (ORDER BY ticks) AS BIGINT) AS q2,
         CAST(PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY ticks) AS BIGINT) AS q3
  FROM spend
),
seg AS (
  SELECT s.o_custkey, s.ticks, s.n_orders,
         CAST(4 - (CASE WHEN s.ticks > c.q1 THEN 1 ELSE 0 END
                 + CASE WHEN s.ticks > c.q2 THEN 1 ELSE 0 END
                 + CASE WHEN s.ticks > c.q3 THEN 1 ELSE 0 END) AS INT) AS segment
  FROM spend s CROSS JOIN cuts c
)
SELECT segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(CAST(SUM(ticks) AS DOUBLE) / 100.0, 2) AS segment_revenue,
       CAST(SUM(n_orders) AS BIGINT) AS segment_orders,
       ROUND(CAST(MIN(ticks) AS DOUBLE) / 100.0, 2) AS min_spend,
       ROUND(CAST(MAX(ticks) AS DOUBLE) / 100.0, 2) AS max_spend
FROM seg
GROUP BY segment
ORDER BY segment
"""

_TABLES = ["region", "nation", "customer", "orders"]


def _run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    for t in _TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(sql)


def q_sql_region_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable-SQL regional revenue share (the oracle runs the SAME
    string)."""
    return _run_sql(spark, sf_dir, _REGION_SHARE_SQL)


def q_sql_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable-SQL NTILE customer segmentation (the oracle runs the
    SAME string)."""
    return _run_sql(spark, sf_dir, _CUSTOMER_SEGMENTS_SQL)


def q_sql_customer_segments_scalable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two-pass percentile-cut segmentation — the 100x-safe twin of
    ``sql_customer_segments`` (no global window in the plan; the
    quartile cuts broadcast as a 1-row aggregate)."""
    return _run_sql(spark, sf_dir, _CUSTOMER_SEGMENTS_SCALABLE_SQL)


QUERIES = {
    "sql_region_share": q_sql_region_share,
    "sql_customer_segments": q_sql_customer_segments,
    "sql_customer_segments_scalable": q_sql_customer_segments_scalable,
}

ORACLE = {
    "sql_region_share": _REGION_SHARE_SQL,
    "sql_customer_segments": _CUSTOMER_SEGMENTS_SQL,
    "sql_customer_segments_scalable": _CUSTOMER_SEGMENTS_SCALABLE_SQL,
}
