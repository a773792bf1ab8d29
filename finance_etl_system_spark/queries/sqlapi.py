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

Scale note: the segmentation query's unpartitioned NTILE ranks the
per-customer AGGREGATE (|customers| rows, not fact rows) on one
partition — fine into the tens of millions; beyond that swap in the
two-pass percentile-cut pattern (approx quantiles of spend → range
bucketing), which operators/sampling.py::stratified_sample shows.
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


QUERIES = {
    "sql_region_share": q_sql_region_share,
    "sql_customer_segments": q_sql_customer_segments,
}

ORACLE = {
    "sql_region_share": _REGION_SHARE_SQL,
    "sql_customer_segments": _CUSTOMER_SEGMENTS_SQL,
}
