"""CDC merge-apply query: a deterministic change feed derived from
the orders table (upserts, deletes, and fresh inserts, sequenced by
o_orderkey) applied onto the customer snapshot via
operators/merge.py — MERGE INTO semantics, oracle-checked against the
equivalent FULL OUTER JOIN + arg_max SQL.

Feed semantics (all pure integer arithmetic — replay-stable):
- every order is a change to its customer, sequence = o_orderkey;
- o_orderkey % 10 == 0 → 'D' (delete the customer), else 'U'
  (set c_acctbal := round(o_totalprice, 2));
- orders with o_orderkey % 7 == 0 also insert a NEW key
  (o_custkey + 10_000_000 — guaranteed absent from the snapshot);
- latest change per key wins (max o_orderkey).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.merge import merge_apply

INSERT_OFFSET = 10_000_000


def _change_feed(orders: DataFrame) -> DataFrame:
    upd = orders.select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderkey") % 10 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.round("o_totalprice", 2).alias("new_bal"),
    )
    ins = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        (F.col("o_custkey") + INSERT_OFFSET).alias("c_custkey"),
        F.col("o_orderkey").alias("seq"),
        F.lit("U").alias("op"),
        F.round("o_totalprice", 2).alias("new_bal"),
    )
    return upd.unionByName(ins)


def q_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the synthetic change feed to the customer snapshot."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    merged = merge_apply(
        cust,
        _change_feed(orders),
        key="c_custkey",
        set_cols={"c_acctbal": "new_bal"},
    )
    return merged.orderBy("c_custkey")


_CDC_MERGE_SQL = f"""
WITH changes AS (
  SELECT o_custkey AS k, o_orderkey AS seq,
         CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op,
         ROUND(o_totalprice, 2) AS new_bal
  FROM orders
  UNION ALL
  SELECT o_custkey + {INSERT_OFFSET}, o_orderkey, 'U', ROUND(o_totalprice, 2)
  FROM orders WHERE o_orderkey % 7 = 0
),
latest AS (
  SELECT k, arg_max(op, seq) AS op, arg_max(new_bal, seq) AS new_bal
  FROM changes GROUP BY k
),
merged AS (
  SELECT COALESCE(c.c_custkey, l.k) AS c_custkey,
         c.c_name, c.c_nationkey,
         CASE WHEN l.op = 'U' THEN l.new_bal ELSE c.c_acctbal END AS c_acctbal,
         c.c_mktsegment,
         CASE WHEN c.c_custkey IS NULL THEN 'inserted'
              WHEN l.op = 'U' THEN 'updated'
              ELSE 'kept' END AS merge_action,
         l.op
  FROM customer c FULL OUTER JOIN latest l ON c.c_custkey = l.k
)
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment, merge_action
FROM merged WHERE op IS NULL OR op <> 'D'
ORDER BY c_custkey
"""


QUERIES = {"cdc_merge": q_cdc_merge}
ORACLE = {"cdc_merge": _CDC_MERGE_SQL}
