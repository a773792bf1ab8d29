"""Subquery forms (SURVEY §4: Catalyst decorrelation coverage).

The reference's only declarative IR is Mongo aggregation pipelines;
real engines must also handle scalar and correlated subqueries — this
module pins Catalyst's rewrite of both into joins (decorrelation),
oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_views


def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above the global average price — scalar subquery becomes
    a broadcast of a 1-row aggregate."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice
        FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
        """
    )


_SCALAR_SUBQUERY_SQL = """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice
FROM orders
WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
"""


def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each customer's orders above THEIR OWN average — correlated
    scalar subquery; Catalyst decorrelates into an aggregate + join."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o.o_custkey, o.o_orderkey, ROUND(o.o_totalprice, 2) AS totalprice
        FROM orders o
        WHERE o.o_totalprice > 1.8 * (
          SELECT AVG(o2.o_totalprice) FROM orders o2
          WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


_CORRELATED_SUBQUERY_SQL = """
SELECT o.o_custkey, o.o_orderkey, ROUND(o.o_totalprice, 2) AS totalprice
FROM orders o
WHERE o.o_totalprice > 1.8 * (
  SELECT AVG(o2.o_totalprice) FROM orders o2
  WHERE o2.o_custkey = o.o_custkey
)
"""


def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / NOT IN over a derived key set (semi/anti-join rewrite)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment
        FROM customer
        WHERE c_custkey IN (
          SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        )
        AND c_custkey NOT IN (
          SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0
        )
        """
    )


_IN_SUBQUERY_SQL = """
SELECT c_custkey, c_mktsegment
FROM customer
WHERE c_custkey IN (
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
AND c_custkey NOT IN (
  SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0
)
"""


def q_datetime_view_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime function family THROUGH a view-on-view chain — the
    Spark form of the reference's Mongo logical view
    (reference mongo-setup/mongo_init.py:112-137): a derived view over
    orders, then an aggregate view over it."""
    register_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMP VIEW order_dates AS
        SELECT o_orderkey, o_totalprice,
               year(o_orderdate) AS y,
               month(o_orderdate) AS m,
               day(o_orderdate) AS d,
               quarter(o_orderdate) AS q,
               date_format(date_trunc('MONTH', o_orderdate), 'yyyy-MM-dd') AS month_start,
               datediff(o_orderdate, to_date('1995-01-01')) AS days_since_epoch_start
        FROM orders
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMP VIEW monthly_orders AS
        SELECT y, q, m, month_start,
               COUNT(*) AS n_orders,
               ROUND(CAST(SUM(CAST(ROUND(o_totalprice * 10000, 0) AS BIGINT))
                          AS DOUBLE) / 10000.0, 2) AS revenue,
               MAX(days_since_epoch_start) AS max_day_offset
        FROM order_dates
        GROUP BY y, q, m, month_start
        """
    )
    return spark.sql("SELECT * FROM monthly_orders")


_DATETIME_VIEW_CHAIN_SQL = """
WITH order_dates AS (
  SELECT o_orderkey, o_totalprice,
         year(o_orderdate) AS y,
         month(o_orderdate) AS m,
         day(o_orderdate) AS d,
         quarter(o_orderdate) AS q,
         strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
         datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch_start
  FROM orders
)
SELECT y, q, m, month_start,
       COUNT(*) AS n_orders,
       ROUND(CAST(SUM(CAST(ROUND(o_totalprice * 10000, 0) AS BIGINT))
                          AS DOUBLE) / 10000.0, 2) AS revenue,
       MAX(days_since_epoch_start) AS max_day_offset
FROM order_dates
GROUP BY y, q, m, month_start
"""


QUERIES = {
    "datetime_view_chain": q_datetime_view_chain,
    "scalar_subquery": q_scalar_subquery,
    "correlated_subquery": q_correlated_subquery,
    "in_subquery": q_in_subquery,
}

ORACLE = {
    "datetime_view_chain": _DATETIME_VIEW_CHAIN_SQL,
    "scalar_subquery": _SCALAR_SUBQUERY_SQL,
    "correlated_subquery": _CORRELATED_SUBQUERY_SQL,
    "in_subquery": _IN_SUBQUERY_SQL,
}
