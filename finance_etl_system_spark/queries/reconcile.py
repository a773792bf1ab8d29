"""Snapshot reconciliation + weighted sampling queries.

- ``snapshot_diff``: keyed data-diff (operators/diff.py) between the
  customer snapshot and a deterministically perturbed "today" copy —
  the migration-verification report (added/removed/changed rows with
  per-column change lists).
- ``weighted_sample``: deterministic weighted sampling without
  replacement (Efraimidis–Spirakis): score = ln(u)/w with u a
  Knuth-multiplicative-hash uniform of the key — pure integer + double
  arithmetic, bit-identical across engines, so even the sampled SET is
  oracle-checked. The scale shape is a TakeOrderedAndProject top-k
  (per-partition heaps), never a global sort; weights ∝ o_totalprice
  give the premium-upsampling a training-mix pipeline wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.frames import ranked_topk
from ..operators.diff import table_diff

ADD_OFFSET = 20_000_000
_CMP = ["c_acctbal", "c_mktsegment", "c_nationkey"]

KNUTH = 2654435761
MOD = 4294967296
# reduce keys mod 2^31 BEFORE the Knuth multiply: 2^31 * KNUTH < 2^63,
# so the product never overflows int64 (Spark would wrap silently while
# DuckDB raises — the oracle pair must stay exact at any sf)
PREMOD = 2147483648
SAMPLE_K = 20


def _new_snapshot(cust: DataFrame) -> DataFrame:
    """Deterministic 'today' snapshot: drop key%13, bump acctbal on
    key%5, shift segment on key%11, add key%17 under a new key."""
    k = F.col("c_custkey")
    base = (
        cust.filter(k % 13 != 0)
        .withColumn(
            "c_acctbal",
            F.when(k % 5 == 0, F.round(F.col("c_acctbal") + 10, 2)).otherwise(
                F.col("c_acctbal")
            ),
        )
        .withColumn(
            "c_mktsegment",
            F.when(k % 11 == 0, F.lit("SHIFTED")).otherwise(
                F.col("c_mktsegment")
            ),
        )
    )
    added = cust.filter(k % 17 == 0).withColumn(
        "c_custkey", k + ADD_OFFSET
    )
    return base.unionByName(added)


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return table_diff(
        cust, _new_snapshot(cust), key="c_custkey", compare_cols=_CMP
    ).orderBy("c_custkey")


_SNAPSHOT_DIFF_SQL = f"""
WITH new_snap AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 5 = 0 THEN ROUND(c_acctbal + 10, 2)
              ELSE c_acctbal END AS c_acctbal,
         CASE WHEN c_custkey % 11 = 0 THEN 'SHIFTED'
              ELSE c_mktsegment END AS c_mktsegment,
         c_nationkey
  FROM customer WHERE c_custkey % 13 <> 0
  UNION ALL
  SELECT c_custkey + {ADD_OFFSET}, c_acctbal, c_mktsegment, c_nationkey
  FROM customer WHERE c_custkey % 17 = 0
),
j AS (
  SELECT o.c_custkey AS ok, n.c_custkey AS nk,
         list_filter([
           CASE WHEN o.c_acctbal    IS DISTINCT FROM n.c_acctbal    THEN 'c_acctbal' END,
           CASE WHEN o.c_mktsegment IS DISTINCT FROM n.c_mktsegment THEN 'c_mktsegment' END,
           CASE WHEN o.c_nationkey  IS DISTINCT FROM n.c_nationkey  THEN 'c_nationkey' END
         ], x -> x IS NOT NULL) AS diffs
  FROM customer o FULL OUTER JOIN new_snap n ON o.c_custkey = n.c_custkey
)
SELECT COALESCE(ok, nk) AS c_custkey,
       CASE WHEN ok IS NULL THEN 'added'
            WHEN nk IS NULL THEN 'removed'
            WHEN len(diffs) > 0 THEN 'changed'
            ELSE 'unchanged' END AS change_type,
       CASE WHEN ok IS NOT NULL AND nk IS NOT NULL
            THEN len(diffs) ELSE 0 END AS n_cols_changed,
       CASE WHEN ok IS NOT NULL AND nk IS NOT NULL
            THEN array_to_string(diffs, ',') ELSE '' END AS changed_cols
FROM j
WHERE NOT (ok IS NOT NULL AND nk IS NOT NULL AND len(diffs) = 0)
ORDER BY c_custkey
"""


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{SAMPLE_K} weighted sample of orders, weight ∝ o_totalprice
    (Efraimidis–Spirakis A-ES, deterministic hash uniform)."""
    o = load_table(spark, sf_dir, "orders")
    u = (
        ((F.col("o_orderkey") % F.lit(PREMOD)) * F.lit(KNUTH)) % F.lit(MOD) + 1
    ) / F.lit(float(MOD + 1))
    score = F.log(u) / F.col("o_totalprice")
    scored = o.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        # +0.0 folds IEEE -0.0 (a round()ed tiny negative) to 0.0 —
        # DuckDB keeps the sign bit, pandas formats it differently
        (F.round(score, 9) + F.lit(0.0)).alias("score"),
    )
    key = [F.col("score").desc(), F.col("o_orderkey").asc()]
    return ranked_topk(scored, key, SAMPLE_K).select(
        "rnk", "o_orderkey", "o_totalprice", "score"
    )


_WEIGHTED_SAMPLE_SQL = f"""
WITH scored AS (
  SELECT o_orderkey,
         ROUND(o_totalprice, 2) AS o_totalprice,
         ROUND(ln((((o_orderkey % {PREMOD}) * {KNUTH}) % {MOD} + 1)
                  / CAST({MOD + 1} AS DOUBLE)) / o_totalprice, 9) + 0.0 AS score
  FROM orders
)
SELECT * FROM (
  SELECT ROW_NUMBER() OVER (ORDER BY score DESC, o_orderkey ASC) AS rnk,
         o_orderkey, o_totalprice, score
  FROM scored
) WHERE rnk <= {SAMPLE_K}
"""

STRATUM_K = 5


def q_weighted_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic weighted sampling: top-{STRATUM_K}
    orders PER market segment, weight ∝ o_totalprice (Efraimidis–
    Spirakis A-ES with the Knuth-hash uniform) — the per-stratum twin
    of weighted_sample, i.e. the 'balanced eval slice per domain'
    draw a training-data pipeline runs.

    Scale shape: the segment lookup is the audited broadcast dim
    join; ranking is ONE window partitioned by segment (parallel
    across strata, unlike the global sample's rank-limit top-k)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    u = (
        ((F.col("o_orderkey") % F.lit(PREMOD)) * F.lit(KNUTH)) % F.lit(MOD) + 1
    ) / F.lit(float(MOD + 1))
    scored = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "c_mktsegment",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        (F.round(F.log(u) / F.col("o_totalprice"), 9) + F.lit(0.0)).alias(
            "score"
        ),
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("score").desc(), F.col("o_orderkey").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= STRATUM_K)
        .select("c_mktsegment", "rnk", "o_orderkey", "o_totalprice", "score")
    )


_WEIGHTED_SAMPLE_STRATIFIED_SQL = f"""
WITH scored AS (
  SELECT c_mktsegment, o_orderkey,
         ROUND(o_totalprice, 2) AS o_totalprice,
         ROUND(ln((((o_orderkey % {PREMOD}) * {KNUTH}) % {MOD} + 1)
                  / CAST({MOD + 1} AS DOUBLE)) / o_totalprice, 9) + 0.0 AS score
  FROM orders JOIN customer ON o_custkey = c_custkey
)
SELECT c_mktsegment, rnk, o_orderkey, o_totalprice, score FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY c_mktsegment ORDER BY score DESC, o_orderkey ASC) AS rnk
  FROM scored
) WHERE rnk <= {STRATUM_K}
"""

QUERIES = {
    "snapshot_diff": q_snapshot_diff,
    "weighted_sample": q_weighted_sample,
    "weighted_sample_stratified": q_weighted_sample_stratified,
}
ORACLE = {
    "snapshot_diff": _SNAPSHOT_DIFF_SQL,
    "weighted_sample": _WEIGHTED_SAMPLE_SQL,
    "weighted_sample_stratified": _WEIGHTED_SAMPLE_STRATIFIED_SQL,
}
