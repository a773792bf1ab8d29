"""Fourth tier of classic analytic shapes — TPC-H Q2 / Q11 / Q20,
adapted to the fixture star schema (no partsupp table, so supply cost
and stock quantities are derived from lineitem itself).

The reference has no joins (SURVEY §2.3); these shapes extend the
warehouse-grade planning coverage of queries/analytics*.py:
- Q2:  correlated argmin — per part, the supplier offering the lowest
  unit price, restricted by dims (region) and ordered by account
  balance. Classic "min-cost supplier" with a per-part window argmin.
- Q11: group total vs a global-total threshold. Implemented with a
  single fact scan: the global total re-aggregates the ALREADY-
  AGGREGATED per-supplier frame to one broadcast scalar, not a second
  scan of lineitem — at 100 TB that saves a full pass.
- Q20: nested excess-quantity predicate — suppliers that shipped an
  outsized share of some part's annual volume. Window share-of-total
  over the (supplier, part) aggregate.

Determinism policy (CLAUDE.md / SCALE.md):
- unit cost = MIN of the per-row rounded price — MIN is accumulation-
  order independent, unlike AVG, so the argmin pick can't flip between
  engines.
- money totals are summed as integer cents (exact in any order), and
  threshold comparisons are pure integer predicates (ticks * 10000 >
  105 * total_ticks), never float-vs-float.
- quantity sums are integer-valued doubles cast to BIGINT; the 30 %
  share test is ``10*qty > 3*total`` on longs.
- every ORDER BY carries a unique-key tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

_CENTS = lambda c: F.round(F.col(c) * 100).cast("long")  # noqa: E731


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: for each SMALL/ECONOMY part under size 15, the
    EUROPE supplier with the lowest observed unit price.

    Plan: part filter broadcast-joined into lineitem BEFORE the
    (partkey, suppkey) aggregate (prunes the agg input ~4x); supplier,
    nation, region are broadcast; the per-part argmin is one window
    over the aggregated frame. Two shuffles total (agg key, window
    key) regardless of fact size.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") < 15) & F.col("p_type").isin("SMALL", "ECONOMY")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")

    # Per-row unit price rounded to cents first: MIN of rounded values
    # is deterministic across engines/partitionings; AVG would not be.
    unit = F.round(F.col("l_extendedprice") / F.col("l_quantity"), 2)
    cost = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .select("l_partkey", "l_suppkey", "p_name", unit.alias("unit_price"))
        .groupBy("l_partkey", "l_suppkey", "p_name")
        .agg(F.min("unit_price").alias("unit_cost"))
    )
    eu_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    j = cost.join(F.broadcast(eu_supp), cost.l_suppkey == eu_supp.s_suppkey)
    w = Window.partitionBy("l_partkey").orderBy(
        F.col("unit_cost").asc(), F.col("s_acctbal").desc(), F.col("s_suppkey").asc()
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("s_acctbal"),
            F.col("s_name"),
            F.col("n_name"),
            F.col("l_partkey").alias("p_partkey"),
            F.col("p_name"),
            F.col("unit_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


_MIN_COST_SUPPLIER_SQL = """
WITH cost AS (
  SELECT l_partkey, l_suppkey, p_name,
         MIN(ROUND(l_extendedprice / l_quantity, 2)) AS unit_cost
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_size < 15 AND p_type IN ('SMALL', 'ECONOMY')
  GROUP BY l_partkey, l_suppkey, p_name
),
eu_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
ranked AS (
  SELECT s_acctbal, s_name, n_name, l_partkey AS p_partkey, p_name, unit_cost,
         ROW_NUMBER() OVER (
           PARTITION BY l_partkey
           ORDER BY unit_cost ASC, s_acctbal DESC, s_suppkey ASC
         ) AS rn
  FROM cost JOIN eu_supp ON l_suppkey = s_suppkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
FROM ranked WHERE rn = 1
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q_important_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: suppliers whose shipped value exceeds 1.05 % of the
    global shipped value.

    Single fact scan: per-supplier cent totals first (map-side
    combine); the global total re-aggregates those ~|supplier| rows to
    one scalar that is broadcast back (no second fact scan, and no
    whole-frame window that would single-partition a large supplier
    dimension). The threshold is the integer predicate
    ``ticks * 10000 > 105 * total_ticks`` — no float comparison.
    """
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    per_supp = (
        l.select("l_suppkey", _CENTS("l_extendedprice").alias("cents"))
        .groupBy("l_suppkey")
        .agg(F.sum("cents").alias("ticks"))
    )
    total = per_supp.agg(F.sum("ticks").alias("total_ticks"))
    return (
        per_supp.crossJoin(F.broadcast(total))
        .filter(F.col("ticks") * 10000 > F.col("total_ticks") * 105)
        .join(F.broadcast(s), per_supp.l_suppkey == s.s_suppkey)
        .select(
            F.col("s_suppkey"),
            F.col("s_name"),
            F.round(F.col("ticks") / 100.0, 2).alias("total_value"),
            F.round(F.col("ticks") / F.col("total_ticks"), 6).alias("value_share"),
        )
        .orderBy(F.col("total_value").desc(), "s_suppkey")
    )


_IMPORTANT_SUPPLIERS_SQL = """
WITH per_supp AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS ticks
  FROM lineitem GROUP BY l_suppkey
),
total AS (
  SELECT CAST(SUM(ticks) AS BIGINT) AS total_ticks FROM per_supp
)
SELECT s_suppkey, s_name,
       ROUND(ticks / 100.0, 2) AS total_value,
       ROUND(CAST(ticks AS DOUBLE) / total_ticks, 6) AS value_share
FROM per_supp CROSS JOIN total JOIN supplier ON l_suppkey = s_suppkey
WHERE ticks * 10000 > total_ticks * 105
ORDER BY total_value DESC, s_suppkey
"""


def q_excess_qty_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers that shipped more than 30 % of a red
    part's total 1996 volume, with how many such parts each has.

    Plan: scan predicates (shipdate year) pushed to parquet; part
    name filter broadcast-semi-joined before the aggregate; the
    excess test is a share-of-total window over the (supp, part)
    aggregate; the final count collapses to ~|supplier| rows.
    Quantities are integer-valued — compared as longs (10*q > 3*tot).
    """
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    qty = (
        l.join(F.broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").cast("long").alias("qty"))
    )
    w_part = Window.partitionBy("l_partkey")
    excess = (
        qty.withColumn("part_total", F.sum("qty").over(w_part))
        .filter(F.col("qty") * 10 > F.col("part_total") * 3)
    )
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "s_name", "n_name"
    )
    return (
        excess.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_excess_parts"),
            F.sum("qty").alias("excess_qty"),
        )
        .join(F.broadcast(sn), F.col("l_suppkey") == sn.s_suppkey)
        .select("s_suppkey", "s_name", "n_name", "n_excess_parts", "excess_qty")
        .orderBy(F.col("n_excess_parts").desc(), "s_suppkey")
    )


_EXCESS_QTY_SUPPLIERS_SQL = """
WITH qty AS (
  SELECT l_partkey, l_suppkey, CAST(SUM(l_quantity) AS BIGINT) AS qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    AND p_name LIKE 'red%'
  GROUP BY l_partkey, l_suppkey
),
excess AS (
  SELECT l_suppkey, qty
  FROM (SELECT l_partkey, l_suppkey, qty,
               CAST(SUM(qty) OVER (PARTITION BY l_partkey) AS BIGINT) AS part_total
        FROM qty)
  WHERE qty * 10 > part_total * 3
)
SELECT s_suppkey, s_name, n_name,
       CAST(COUNT(*) AS BIGINT) AS n_excess_parts,
       CAST(SUM(qty) AS BIGINT) AS excess_qty
FROM excess
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY s_suppkey, s_name, n_name
ORDER BY n_excess_parts DESC, s_suppkey
"""


QUERIES = {
    "min_cost_supplier": q_min_cost_supplier,
    "important_suppliers": q_important_suppliers,
    "excess_qty_suppliers": q_excess_qty_suppliers,
}

ORACLE = {
    "min_cost_supplier": _MIN_COST_SUPPLIER_SQL,
    "important_suppliers": _IMPORTANT_SUPPLIERS_SQL,
    "excess_qty_suppliers": _EXCESS_QTY_SUPPLIERS_SQL,
}
