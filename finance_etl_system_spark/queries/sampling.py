"""Deterministic-sampling queries (training-data pipeline tier).

Membership is a pure function of the row key (md5-prefix threshold,
operators/sampling.py), so the SAME rows are sampled by Spark and
DuckDB — these are full value-hash oracle checks, not rows-only, which
is the point: sampling that an independent engine can reproduce is
sampling you can audit at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import money_sum
from ..operators.sampling import hash_sample, stratified_hash_sample


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% key-hash sample of lineitem, summarized per returnflag.
    The summary (not the raw sample) keeps the oracle payload small
    while still hashing every sampled row into the result."""
    l = load_table(spark, sf_dir, "lineitem")
    sampled = hash_sample(l, ["l_orderkey", "l_linenumber"], 0.10)
    return (
        sampled.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            money_sum("l_extendedprice").alias("sum_price"),
        )
        .orderBy("l_returnflag")
    )


# 0.10 * 65536 = 6553 = 0x1999
_HASH_SAMPLE_SQL = """
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
       ROUND(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) / 100.0, 2) AS sum_price
FROM lineitem
WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || '§' || CAST(l_linenumber AS VARCHAR)), 1, 4) < '1999'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class rebalancing: keep all urgent orders, 20% of high, 5% of
    the rest-of-world strata. Deterministic per-stratum thresholds."""
    o = load_table(spark, sf_dir, "orders")
    sampled = stratified_hash_sample(
        o,
        "o_orderpriority",
        {"1-URGENT": 1.0, "2-HIGH": 0.20, "5-LOW": 0.05},
        key_cols=["o_orderkey"],
    )
    return (
        sampled.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum("o_totalprice", 10_000).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


# 1.0 -> 'g' (sorts above every hex prefix), 0.20 -> 0x3333, 0.05 -> 0x0ccc
_STRATIFIED_SAMPLE_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(SUM(CAST(ROUND(o_totalprice * 10000, 0) AS BIGINT)) / 10000.0, 2) AS total_price
FROM orders
WHERE (o_orderpriority = '1-URGENT' AND substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4) < 'g')
   OR (o_orderpriority = '2-HIGH'   AND substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4) < '3333')
   OR (o_orderpriority = '5-LOW'    AND substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4) < '0ccc')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


QUERIES = {
    "hash_sample": q_hash_sample,
    "stratified_sample": q_stratified_sample,
}

ORACLE = {
    "hash_sample": _HASH_SAMPLE_SQL,
    "stratified_sample": _STRATIFIED_SAMPLE_SQL,
}
