"""Declarative data-quality expectation suite (Deequ-style) — the
contract-enforcement layer a production ingest runs before publishing
a table (extends SURVEY §1.2 / operators/validate.py, which checks the
schema contract; this checks the *values*).

Six expectations over the orders/lineitem pair, computed as TWO Spark
jobs regardless of how many checks are registered:

- one single-pass aggregate over ``orders`` carrying every per-column
  metric at once (completeness, uniqueness, domain violations, range
  violations) — adding a check adds a column to the same HashAggregate,
  not a scan;
- one broadcast-anti-join count for referential integrity
  (lineitem.l_orderkey ⊆ orders.o_orderkey).

At 100 TB this is the shape you want: metrics ride one map-side
combinable pass over the fact table, the verdict frame is rows =
number-of-checks (driver-sized), and the only join broadcasts the
key set's bloom-filter-sized side... here the dimension IS orders'
key set, so the anti-join shuffles on the join key like any big-big
equi join (AQE handles skew).

Output: one row per check — (check_name, metric, passed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

STATUS_DOMAIN = ["O", "F", "P"]


def q_data_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    one = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_custkey").alias("nn_cust"),
        F.countDistinct("o_orderkey").alias("uniq_ok"),
        F.min("o_totalprice").alias("min_price"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin(STATUS_DOMAIN), 1).otherwise(0)
        ).alias("bad_status"),
        F.sum(F.when(F.col("o_totalprice") < 0, 1).otherwise(0)).alias(
            "neg_price"
        ),
    )
    orphans = (
        li.join(o.select("o_orderkey"), li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orphan_li"))
    )
    m = one.crossJoin(orphans)

    checks = [
        ("completeness_o_custkey", F.col("nn_cust") / F.col("n"), "m = 1.0"),
        ("uniqueness_o_orderkey", F.col("uniq_ok") / F.col("n"), "m = 1.0"),
        ("min_o_totalprice_nonneg", F.col("min_price"), "m >= 0"),
        ("status_in_domain", F.col("bad_status").cast("double"), "m = 0"),
        ("nonnegative_totalprice", F.col("neg_price").cast("double"), "m = 0"),
        ("no_orphan_lineitems", F.col("orphan_li").cast("double"), "m = 0"),
    ]
    # melt via explode(array(struct...)), NOT a per-check unionAll of
    # `m` — a union would recompute the aggregate (and the anti-join)
    # once per check; the explode keeps the promised two-job shape
    structs = []
    for name, metric, rule in checks:
        passed = {
            "m = 1.0": metric == 1.0,
            "m >= 0": metric >= 0,
            "m = 0": metric == 0,
        }[rule]
        structs.append(
            F.struct(
                F.lit(name).alias("check_name"),
                F.round(metric, 6).alias("metric"),
                passed.alias("passed"),
            )
        )
    return (
        m.select(F.explode(F.array(*structs)).alias("c"))
        .select("c.*")
        .orderBy("check_name")
    )


_DATA_EXPECTATIONS_SQL = f"""
WITH m AS (
  SELECT COUNT(*) AS n,
         COUNT(o_custkey) AS nn_cust,
         COUNT(DISTINCT o_orderkey) AS uniq_ok,
         MIN(o_totalprice) AS min_price,
         SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END)
           AS bad_status,
         SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS neg_price
  FROM orders
),
orph AS (
  SELECT COUNT(*) AS orphan_li FROM lineitem
  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
)
SELECT check_name, metric, passed FROM (
  SELECT 'completeness_o_custkey' AS check_name,
         ROUND(CAST(nn_cust AS DOUBLE) / n, 6) AS metric,
         CAST(nn_cust AS DOUBLE) / n = 1.0 AS passed FROM m
  UNION ALL
  SELECT 'uniqueness_o_orderkey',
         ROUND(CAST(uniq_ok AS DOUBLE) / n, 6),
         CAST(uniq_ok AS DOUBLE) / n = 1.0 FROM m
  UNION ALL
  SELECT 'min_o_totalprice_nonneg', ROUND(min_price, 6), min_price >= 0 FROM m
  UNION ALL
  SELECT 'status_in_domain', CAST(bad_status AS DOUBLE), bad_status = 0 FROM m
  UNION ALL
  SELECT 'nonnegative_totalprice', CAST(neg_price AS DOUBLE), neg_price = 0
  FROM m
  UNION ALL
  SELECT 'no_orphan_lineitems', CAST(orphan_li AS DOUBLE), orphan_li = 0
  FROM orph
) ORDER BY check_name
"""

APPROX_RSD = 0.05   # HLL relative standard deviation
APPROX_TOL = 0.15   # pass tolerance = 3×rsd: an exact-unique column
                    # cannot fail, a >15%-duplicated one cannot pass


def q_data_expectations_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_data_expectations with the uniqueness check's exact
    ``countDistinct`` swapped for ``approx_count_distinct`` (HLL) —
    the 100-TB form of the suite. Exact distinct on a near-unique key
    shuffles every distinct value (state grows with the data — the
    one >2× row in the 10× scale table); the HLL sketch is fixed-size
    (~1.5 KB at rsd 0.05), map-side mergeable, and rides the SAME
    single HashAggregate as the other metrics, so the whole suite
    stays two jobs with O(1) aggregation state per metric.

    The trade is surfaced in the contract, not hidden: the
    uniqueness row reports a NULL metric (the estimate is
    engine-specific — publishing it would invite cross-engine
    comparison of sketch internals) and a TOLERANCE verdict
    ``est/n ≥ 1 − 3·rsd``; the estimate sits within rsd of truth
    w.h.p., so an exactly-unique key always passes and a heavily
    duplicated one always fails — borderline (~15% dup) columns are
    the documented gray zone, use the exact suite there. Accuracy of
    the estimate itself is pinned in tests/test_validate.py. The
    other five checks are unchanged and exact."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    one = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_custkey").alias("nn_cust"),
        F.approx_count_distinct("o_orderkey", APPROX_RSD).alias("uniq_ok"),
        F.min("o_totalprice").alias("min_price"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin(STATUS_DOMAIN), 1).otherwise(0)
        ).alias("bad_status"),
        F.sum(F.when(F.col("o_totalprice") < 0, 1).otherwise(0)).alias(
            "neg_price"
        ),
    )
    orphans = (
        li.join(o.select("o_orderkey"), li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orphan_li"))
    )
    m = one.crossJoin(orphans)

    null_d = F.lit(None).cast("double")
    checks = [
        (
            "completeness_o_custkey",
            F.round(F.col("nn_cust") / F.col("n"), 6),
            F.col("nn_cust") / F.col("n") == 1.0,
        ),
        (
            "uniqueness_o_orderkey_approx",
            null_d,
            F.col("uniq_ok") / F.col("n") >= 1.0 - APPROX_TOL,
        ),
        ("min_o_totalprice_nonneg", F.round(F.col("min_price"), 6),
         F.col("min_price") >= 0),
        ("status_in_domain", F.col("bad_status").cast("double"),
         F.col("bad_status") == 0),
        ("nonnegative_totalprice", F.col("neg_price").cast("double"),
         F.col("neg_price") == 0),
        ("no_orphan_lineitems", F.col("orphan_li").cast("double"),
         F.col("orphan_li") == 0),
    ]
    structs = [
        F.struct(
            F.lit(name).alias("check_name"),
            metric.alias("metric"),
            passed.alias("passed"),
        )
        for name, metric, passed in checks
    ]
    return (
        m.select(F.explode(F.array(*structs)).alias("c"))
        .select("c.*")
        .orderBy("check_name")
    )


# the oracle computes the uniqueness verdict from the EXACT distinct
# count: both engines must agree on pass/fail (the estimate is within
# rsd ≪ the tolerance), while the engine-specific estimate itself is
# excluded from the hashed output (NULL metric on both sides)
_DATA_EXPECTATIONS_APPROX_SQL = f"""
WITH m AS (
  SELECT COUNT(*) AS n,
         COUNT(o_custkey) AS nn_cust,
         COUNT(DISTINCT o_orderkey) AS uniq_ok,
         MIN(o_totalprice) AS min_price,
         SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END)
           AS bad_status,
         SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS neg_price
  FROM orders
),
orph AS (
  SELECT COUNT(*) AS orphan_li FROM lineitem
  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
)
SELECT check_name, metric, passed FROM (
  SELECT 'completeness_o_custkey' AS check_name,
         ROUND(CAST(nn_cust AS DOUBLE) / n, 6) AS metric,
         CAST(nn_cust AS DOUBLE) / n = 1.0 AS passed FROM m
  UNION ALL
  SELECT 'uniqueness_o_orderkey_approx',
         CAST(NULL AS DOUBLE),
         CAST(uniq_ok AS DOUBLE) / n >= 1.0 - {APPROX_TOL} FROM m
  UNION ALL
  SELECT 'min_o_totalprice_nonneg', ROUND(min_price, 6), min_price >= 0 FROM m
  UNION ALL
  SELECT 'status_in_domain', CAST(bad_status AS DOUBLE), bad_status = 0 FROM m
  UNION ALL
  SELECT 'nonnegative_totalprice', CAST(neg_price AS DOUBLE), neg_price = 0
  FROM m
  UNION ALL
  SELECT 'no_orphan_lineitems', CAST(orphan_li AS DOUBLE), orphan_li = 0
  FROM orph
) ORDER BY check_name
"""


def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of ``orders`` in one aggregate pass
    (operators/profile.py): per column — row/null/distinct counts,
    numeric min/max/avg (6dp) or lexical min/max. The report a
    pipeline runs to PICK the expectation thresholds."""
    from ..operators.profile import profile_columns

    o = load_table(spark, sf_dir, "orders")
    return profile_columns(
        o,
        [
            ("o_orderkey", "num"),
            ("o_custkey", "num"),
            ("o_totalprice", "num"),
            ("o_orderdate", "str"),
            ("o_orderstatus", "str"),
            ("o_orderpriority", "str"),
        ],
    )


def _profile_col_sql(c: str, kind: str) -> str:
    base = f"""SELECT '{c}' AS column_name,
  COUNT(*) AS n,
  CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_count,
  COUNT(DISTINCT {c}) AS n_distinct,"""
    if kind == "num":
        return base + f"""
  ROUND(CAST(MIN({c}) AS DOUBLE), 6) AS min_num,
  ROUND(CAST(MAX({c}) AS DOUBLE), 6) AS max_num,
  ROUND(CAST(SUM(CAST({c} AS DECIMAL(28,6))) AS DOUBLE)
        / COUNT({c}), 6) AS avg_num,
  CAST(NULL AS VARCHAR) AS min_str,
  CAST(NULL AS VARCHAR) AS max_str
FROM orders"""
    return base + f"""
  CAST(NULL AS DOUBLE) AS min_num,
  CAST(NULL AS DOUBLE) AS max_num,
  CAST(NULL AS DOUBLE) AS avg_num,
  MIN(CAST({c} AS VARCHAR)) AS min_str,
  MAX(CAST({c} AS VARCHAR)) AS max_str
FROM orders"""


_PROFILE_ORDERS_SQL = (
    "\nUNION ALL\n".join(
        _profile_col_sql(c, k)
        for c, k in [
            ("o_orderkey", "num"),
            ("o_custkey", "num"),
            ("o_totalprice", "num"),
            ("o_orderdate", "str"),
            ("o_orderstatus", "str"),
            ("o_orderpriority", "str"),
        ]
    )
    + "\nORDER BY column_name"
)


N_HIST_BINS = 12


def q_histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of o_totalprice with data-derived bounds —
    the distribution view the profiler's min/max alone can't give.

    Two-pass shape: a one-row (lo, hi) bounds aggregate broadcast
    onto the scan, then ONE groupBy on the bucket index (map-side
    combinable; at most N_HIST_BINS groups survive the shuffle).
    Bucket arithmetic is floor((x-lo)/width) clamped to the top bin —
    pure double ops identical in every engine, no width_bucket
    dependency. Edges are rounded 2dp (money)."""
    o = load_table(spark, sf_dir, "orders").select("o_totalprice")
    bounds = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    nb = F.lit(N_HIST_BINS)
    width = (F.col("hi") - F.col("lo")) / nb
    binned = (
        o.crossJoin(F.broadcast(bounds))
        .select(
            F.least(
                F.floor((F.col("o_totalprice") - F.col("lo")) / width).cast(
                    "int"
                ),
                nb - 1,
            ).alias("bin"),
            F.col("lo"),
            width.alias("w"),
        )
        .groupBy("bin", "lo", "w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return binned.select(
        "bin",
        F.round(F.col("lo") + F.col("bin") * F.col("w"), 2).alias("lo_edge"),
        F.round(F.col("lo") + (F.col("bin") + 1) * F.col("w"), 2).alias(
            "hi_edge"
        ),
        "n",
    ).orderBy("bin")


_HISTOGRAM_SQL = f"""
WITH bounds AS (
  SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders
),
binned AS (
  SELECT LEAST(CAST(FLOOR((o_totalprice - lo) / ((hi - lo) / {N_HIST_BINS}))
                    AS INT), {N_HIST_BINS} - 1) AS bin,
         lo, (hi - lo) / {N_HIST_BINS} AS w
  FROM orders CROSS JOIN bounds
)
SELECT bin,
       ROUND(lo + bin * w, 2) AS lo_edge,
       ROUND(lo + (bin + 1) * w, 2) AS hi_edge,
       COUNT(*) AS n
FROM binned GROUP BY bin, lo, w ORDER BY bin
"""


def q_benford_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of o_totalprice: observed first-significant-
    digit frequencies vs the expected log10(1 + 1/d) — the classic
    forensic-accounting screen for fabricated amounts.

    The first digit comes from the STRING of floor(x) as a bigint
    (portable across engines, unlike double formatting); one
    9-group aggregate, map-side combinable."""
    o = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor("o_totalprice").cast("long").cast("string"), 1, 1
    ).cast("int")
    per = (
        o.filter(F.col("o_totalprice") >= 1)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = per.agg(F.sum("n").alias("total"))
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            F.round(F.col("n") / F.col("total"), 6).alias("obs_freq"),
            F.round(F.log10(1 + 1 / F.col("digit")), 6).alias("exp_freq"),
        )
        .orderBy("digit")
    )


_BENFORD_SQL = """
WITH per AS (
  SELECT CAST(SUBSTRING(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR),
                        1, 1) AS INT) AS digit,
         COUNT(*) AS n
  FROM orders WHERE o_totalprice >= 1
  GROUP BY 1
),
tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS total FROM per)
SELECT digit, n,
       ROUND(n / total, 6) AS obs_freq,
       ROUND(log10(1 + 1.0 / digit), 6) AS exp_freq
FROM per CROSS JOIN tot ORDER BY digit
"""



_QR_BINS = 128


def q_quantile_histogram_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE quantile sketch as a table: per-month equi-width
    histograms of o_totalprice (fixed global bins) and the median read
    off each month's histogram — estimate by in-bin linear
    interpolation plus the EXACT bracket [bin_lo, bin_hi] the true
    median provably lies in (bin counts are exact).

    Why a histogram and not percentile_approx: fixed-bin counts MERGE
    by addition — a quarter's (or year's, or fleet's) median comes
    from summing monthly rows with NO re-scan, the property every
    rollup store needs (tested: merged months ≡ direct quarter).
    Scale: one pass for global bounds (broadcast 1-row), one
    map-combinable groupBy(month, bin); per-month windows run over
    ≤{bins}-row frames."""
    o = load_table(spark, sf_dir, "orders").select(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month"),
        "o_totalprice",
    )
    bounds = F.broadcast(
        o.agg(
            F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
        )
    )
    # epsilon guard: a degenerate all-equal column makes width 0 and
    # 0/0 = NaN, which the engines cast to DIFFERENT bins
    width = F.greatest(
        (F.col("mx") - F.col("mn")) / _QR_BINS, F.lit(1e-12)
    )
    b = o.crossJoin(bounds).select(
        "month",
        "mn",
        "mx",
        F.least(
            F.lit(_QR_BINS - 1),
            F.floor((F.col("o_totalprice") - F.col("mn")) / width).cast("int"),
        ).alias("bin"),
    )
    counts = b.groupBy("month", "mn", "mx", "bin").agg(
        F.count(F.lit(1)).alias("n")
    )
    from pyspark.sql import Window

    wcum = (
        Window.partitionBy("month")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("month")
    cum = counts.withColumn("cum", F.sum("n").over(wcum)).withColumn(
        "total", F.sum("n").over(wall)
    )
    half = F.col("total") / 2.0
    med = cum.filter(
        ((F.col("cum") - F.col("n")) < half) & (F.col("cum") >= half)
    )
    w2 = (F.col("mx") - F.col("mn")) / _QR_BINS
    lo = F.col("mn") + w2 * F.col("bin")
    est = lo + w2 * ((half - (F.col("cum") - F.col("n"))) / F.col("n"))
    return med.select(
        "month",
        F.col("total").alias("n_rows"),
        F.col("bin").alias("median_bin"),
        F.round(lo, 2).alias("bracket_lo"),
        F.round(lo + w2, 2).alias("bracket_hi"),
        F.round(est, 2).alias("est_median"),
    ).orderBy("month")


_QUANTILE_HISTOGRAM_ROLLUP_SQL = f"""
WITH src AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         o_totalprice
  FROM orders
),
bounds AS (
  SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx FROM src
),
binned AS (
  SELECT month, mn, mx,
         LEAST({_QR_BINS - 1},
               CAST(FLOOR((o_totalprice - mn)
                          / GREATEST((mx - mn) / {_QR_BINS}, 1e-12))
                    AS INT)) AS bin
  FROM src CROSS JOIN bounds
),
counts AS (
  SELECT month, mn, mx, bin, COUNT(*) AS n
  FROM binned GROUP BY month, mn, mx, bin
),
cum AS (
  SELECT *,
         SUM(n) OVER (PARTITION BY month ORDER BY bin
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(n) OVER (PARTITION BY month) AS total
  FROM counts
)
SELECT month,
       CAST(total AS BIGINT) AS n_rows,
       bin AS median_bin,
       ROUND(mn + (mx - mn) / {_QR_BINS} * bin, 2) AS bracket_lo,
       ROUND(mn + (mx - mn) / {_QR_BINS} * (bin + 1), 2) AS bracket_hi,
       ROUND(mn + (mx - mn) / {_QR_BINS} * bin
             + (mx - mn) / {_QR_BINS}
               * ((total / 2.0 - (cum - n)) / n), 2) AS est_median
FROM cum
WHERE (cum - n) < total / 2.0 AND cum >= total / 2.0
ORDER BY month
"""



_FK_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def q_fk_integrity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit of EVERY foreign-key edge in the
    star schema in one result: per edge, child row count, orphan rows
    (no matching parent), and distinct orphan keys — the whole-schema
    expectation a warehouse gate runs nightly.

    Scale: each edge is one left-anti join against its parent's key
    projection (dim parents broadcast; the two fact-fact edges are
    key-projected equi joins). Edges evaluate independently and union
    |edges| 1-row frames — no cross-edge shuffle."""
    rows = []
    for child, fk, parent, pk in _FK_EDGES:
        c = load_table(spark, sf_dir, child).select(F.col(fk).alias("k"))
        pkeys = (
            load_table(spark, sf_dir, parent)
            .select(F.col(pk).alias("k"))
            .distinct()
            .withColumn("_hit", F.lit(1))
        )
        # ONE child scan per edge: left join + conditional counts give
        # child_rows and both orphan stats together (a NULL fk never
        # matches -> counted as an orphan, like left_anti would)
        j = c.join(pkeys, "k", "left")
        miss = F.col("_hit").isNull()
        rows.append(
            j.agg(
                F.count(F.lit(1)).alias("child_rows"),
                F.sum(miss.cast("long")).alias("orphan_rows"),
                F.countDistinct(F.when(miss, F.col("k"))).alias(
                    "orphan_keys"
                ),
            ).select(
                F.lit(f"{child}.{fk}->{parent}.{pk}").alias("edge"),
                "child_rows",
                "orphan_rows",
                "orphan_keys",
                (F.col("orphan_rows") == 0).alias("intact"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("edge")


# NOT IN would silently mask orphans under NULL keys (NULL NOT IN
# (...) is never true, and one NULL parent poisons every row); the
# left-join formulation matches Spark: a NULL fk is an orphan.
_FK_INTEGRITY_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{c}.{fk}->{p}.{pk}' AS edge,
       CAST(COUNT(*) AS BIGINT) AS child_rows,
       CAST(SUM(CASE WHEN hit IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS orphan_rows,
       CAST(COUNT(DISTINCT CASE WHEN hit IS NULL THEN {fk} END) AS BIGINT)
         AS orphan_keys,
       SUM(CASE WHEN hit IS NULL THEN 1 ELSE 0 END) = 0 AS intact
FROM {c} LEFT JOIN (SELECT DISTINCT {pk} AS pkk, 1 AS hit FROM {p}) par
  ON {c}.{fk} = par.pkk"""
    for c, fk, p, pk in _FK_EDGES
) + "\nORDER BY edge"


QUERIES = {
    "fk_integrity_report": q_fk_integrity_report,
    "quantile_histogram_rollup": q_quantile_histogram_rollup,
    "data_expectations": q_data_expectations,
    "data_expectations_approx": q_data_expectations_approx,
    "profile_orders": q_profile_orders,
    "histogram_totalprice": q_histogram_totalprice,
    "benford_totalprice": q_benford_totalprice,
}
ORACLE = {
    "fk_integrity_report": _FK_INTEGRITY_SQL,
    "quantile_histogram_rollup": _QUANTILE_HISTOGRAM_ROLLUP_SQL,
    "data_expectations": _DATA_EXPECTATIONS_SQL,
    "data_expectations_approx": _DATA_EXPECTATIONS_APPROX_SQL,
    "profile_orders": _PROFILE_ORDERS_SQL,
    "histogram_totalprice": _HISTOGRAM_SQL,
    "benford_totalprice": _BENFORD_SQL,
}
