"""Distribution-drift monitoring: PSI and grid-KS between a reference
and a current population — the ML-ops layer over the model tier
(pipeline/ml.py monitors residuals per model; this monitors the
FEATURE distribution itself, the earlier warning).

Populations: orders before/after 1997-01-01 (chronological split, the
same convention as ml_chrono_split).

- ``drift_psi``: Population Stability Index over the REFERENCE's
  decile edges — Σ (q_i − p_i)·ln(q_i / p_i). The canonical
  "has the input shifted" score (>0.2 = action).
- ``drift_ks``: Kolmogorov–Smirnov statistic evaluated on the
  reference's vigintile grid — max_e |F_ref(e) − F_cur(e)|. Exact KS
  needs a global sort over the union (data-sized single-partition
  window — forbidden shape at 100 TB); the grid form is pure
  aggregates and lower-bounds exact KS, tight when the grid is the
  reference's own quantiles.

Scale shape: edges are ONE interpolated-percentile aggregate over the
reference (Spark ``percentile`` ≡ DuckDB ``quantile_cont``, the
engine-portable pair proven by q_percentiles), broadcast as a 1-row
frame; each population then contributes one map-side-combinable
aggregate (bucket counts / 19 conditional fractions). Nothing
driver-side, nothing data-sized shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

SPLIT_DATE = "1997-01-01"
N_PSI_BUCKETS = 10
_PSI_QS = [i / N_PSI_BUCKETS for i in range(1, N_PSI_BUCKETS)]  # 9 edges
_KS_QS = [i / 20 for i in range(1, 20)]  # 19 vigintile edges


def _populations(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    o = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    ref = o.filter(F.col("o_orderdate") < SPLIT_DATE)
    cur = o.filter(F.col("o_orderdate") >= SPLIT_DATE)
    return ref, cur


def _bucket_counts(
    spark: SparkSession, sf_dir: str, edges: DataFrame
) -> DataFrame:
    """ONE scan produces BOTH populations' bucket counts (the is_ref
    flag rides the row instead of two filtered scans), and the totals
    come from re-aggregating the ≤|edges|+1-row bucket table — so a
    drift query costs exactly two scans (edges + counts) regardless of
    how many derived frames it builds."""
    o = load_table(spark, sf_dir, "orders").select(
        (F.col("o_orderdate") < SPLIT_DATE).alias("is_ref"), "o_totalprice"
    )
    b = o.crossJoin(F.broadcast(edges)).select(
        "is_ref",
        F.aggregate(
            F.col("e"),
            F.lit(1),
            lambda acc, e: acc
            + F.when(F.col("o_totalprice") > e, 1).otherwise(0),
        ).alias("bucket"),
    )
    counts = b.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("ref_n"),
        F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)).alias("cur_n"),
    )
    totals = counts.agg(
        F.sum("ref_n").alias("n_ref"), F.sum("cur_n").alias("n_cur")
    )
    return counts.crossJoin(F.broadcast(totals))


def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    ref, _cur = _populations(spark, sf_dir)
    qs = ", ".join(str(q) for q in _PSI_QS)
    edges = ref.agg(
        F.expr(f"percentile(o_totalprice, array({qs}))").alias("e")
    )
    tot = _bucket_counts(spark, sf_dir, edges).withColumnsRenamed(
        {"n_ref": "ref_total", "n_cur": "cur_total"}
    )
    p = F.col("ref_n") / F.col("ref_total")
    q = F.col("cur_n") / F.col("cur_total")
    return tot.select(
        "bucket",
        "ref_n",
        "cur_n",
        F.round(p, 6).alias("ref_frac"),
        F.round(q, 6).alias("cur_frac"),
        F.round(
            F.when((p > 0) & (q > 0), (q - p) * F.log(q / p)).otherwise(
                F.lit(None)
            ),
            6,
        ).alias("psi_contrib"),
    ).orderBy("bucket")


_DRIFT_PSI_SQL = f"""
WITH src AS (
  SELECT o_orderdate, o_totalprice FROM orders
),
edges AS (
  SELECT quantile_cont(o_totalprice, [{", ".join(str(q) for q in _PSI_QS)}]) AS e
  FROM src WHERE o_orderdate < DATE '{SPLIT_DATE}'
),
ref_b AS (
  SELECT 1 + len(list_filter(e, x -> o_totalprice > x)) AS bucket,
         COUNT(*) AS ref_n
  FROM src CROSS JOIN edges WHERE o_orderdate < DATE '{SPLIT_DATE}'
  GROUP BY 1
),
cur_b AS (
  SELECT 1 + len(list_filter(e, x -> o_totalprice > x)) AS bucket,
         COUNT(*) AS cur_n
  FROM src CROSS JOIN edges WHERE o_orderdate >= DATE '{SPLIT_DATE}'
  GROUP BY 1
),
tot AS (
  SELECT COALESCE(r.bucket, c.bucket) AS bucket,
         COALESCE(ref_n, 0) AS ref_n, COALESCE(cur_n, 0) AS cur_n,
         (SELECT COUNT(*) FROM src WHERE o_orderdate < DATE '{SPLIT_DATE}')
           AS ref_total,
         (SELECT COUNT(*) FROM src WHERE o_orderdate >= DATE '{SPLIT_DATE}')
           AS cur_total
  FROM ref_b r FULL OUTER JOIN cur_b c ON r.bucket = c.bucket
)
SELECT bucket, ref_n, cur_n,
  ROUND(ref_n / CAST(ref_total AS DOUBLE), 6) AS ref_frac,
  ROUND(cur_n / CAST(cur_total AS DOUBLE), 6) AS cur_frac,
  ROUND(CASE WHEN ref_n > 0 AND cur_n > 0
        THEN (cur_n / CAST(cur_total AS DOUBLE)
              - ref_n / CAST(ref_total AS DOUBLE))
             * ln((cur_n / CAST(cur_total AS DOUBLE))
                  / (ref_n / CAST(ref_total AS DOUBLE)))
        END, 6) AS psi_contrib
FROM tot ORDER BY bucket
"""


def q_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ref, cur = _populations(spark, sf_dir)
    qs = ", ".join(str(q) for q in _KS_QS)
    edges = ref.agg(
        F.expr(f"percentile(o_totalprice, array({qs}))").alias("e")
    )

    def cdf(df: DataFrame, name: str) -> DataFrame:
        return df.crossJoin(F.broadcast(edges)).agg(
            *[
                F.avg(
                    F.when(F.col("o_totalprice") <= F.col("e")[i], 1.0).otherwise(0.0)
                ).alias(f"{name}_f{i}")
                for i in range(len(_KS_QS))
            ],
            F.count(F.lit(1)).alias(f"n_{name}"),
        )

    both = cdf(ref, "ref").crossJoin(cdf(cur, "cur"))
    diffs = [
        F.abs(F.col(f"ref_f{i}") - F.col(f"cur_f{i}"))
        for i in range(len(_KS_QS))
    ]
    return both.select(
        F.round(F.greatest(*diffs), 6).alias("ks_grid"),
        F.col("n_ref"),
        F.col("n_cur"),
    )


_DRIFT_KS_SQL = f"""
WITH src AS (SELECT o_orderdate, o_totalprice FROM orders),
edges AS (
  SELECT quantile_cont(o_totalprice, [{", ".join(str(q) for q in _KS_QS)}]) AS e
  FROM src WHERE o_orderdate < DATE '{SPLIT_DATE}'
),
ref_f AS (
  SELECT {", ".join(f"AVG(CASE WHEN o_totalprice <= e[{i + 1}] THEN 1.0 ELSE 0.0 END) AS ref_f{i}" for i in range(len(_KS_QS)))},
         COUNT(*) AS n_ref
  FROM src CROSS JOIN edges WHERE o_orderdate < DATE '{SPLIT_DATE}'
),
cur_f AS (
  SELECT {", ".join(f"AVG(CASE WHEN o_totalprice <= e[{i + 1}] THEN 1.0 ELSE 0.0 END) AS cur_f{i}" for i in range(len(_KS_QS)))},
         COUNT(*) AS n_cur
  FROM src CROSS JOIN edges WHERE o_orderdate >= DATE '{SPLIT_DATE}'
)
SELECT ROUND(GREATEST({", ".join(f"ABS(ref_f{i} - cur_f{i})" for i in range(len(_KS_QS)))}), 6) AS ks_grid,
       n_ref, n_cur
FROM ref_f CROSS JOIN cur_f
"""

N_KS_BINS = 100
_KSR_QS = [i / N_KS_BINS for i in range(1, N_KS_BINS)]  # 99 centile edges


def q_drift_ks_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KS with a PROVABLE two-sided bracket from mergeable histogram
    counts — the refinement of drift_ks's lower bound: inside any bin,
    |F_ref − F_cur| can move at most max(p_bin, q_bin) away from its
    value at the bin's left edge, so

        ks_lower = max_edges |D(e)|   ≤   KS_exact   ≤
        ks_upper = max_bins (|D(left edge)| + max(p_bin, q_bin)).

    With the reference's own centile grid p_bin = 1/N_KS_BINS exactly,
    so the bracket width is ≤ 0.01 + max_bin q_bin — an alarm
    thresholded anywhere outside [ks_lower, ks_upper] is decided
    EXACTLY, no global sort needed (the forbidden shape exact KS
    would take at 100 TB).

    Scale shape: one interpolated-percentile aggregate over the
    reference (broadcast 1-row edge frame), one map-side-combinable
    bucket-count aggregate per population, then cumulative sums over
    the ≤N_KS_BINS-row bucket table — the unpartitioned window runs
    on an aggregate-sized frame, never on data. All fractions derive
    from exact integer counts, so both engines compute identical
    doubles.
    """
    from pyspark.sql import Window

    ref, _cur = _populations(spark, sf_dir)
    qs = ", ".join(str(q) for q in _KSR_QS)
    edges = ref.agg(
        F.expr(f"percentile(o_totalprice, array({qs}))").alias("e")
    )
    tot = _bucket_counts(spark, sf_dir, edges)
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = tot.select(
        "bucket",
        "n_ref",
        "n_cur",
        (F.col("ref_n") / F.col("n_ref")).alias("p_b"),
        (F.col("cur_n") / F.col("n_cur")).alias("q_b"),
        (F.sum("ref_n").over(w) / F.col("n_ref")).alias("cum_p"),
        (F.sum("cur_n").over(w) / F.col("n_cur")).alias("cum_q"),
    )
    wl = Window.orderBy("bucket")
    d = cum.select(
        "n_ref",
        "n_cur",
        "p_b",
        "q_b",
        F.abs(F.col("cum_p") - F.col("cum_q")).alias("d_right"),
        F.lag(F.abs(F.col("cum_p") - F.col("cum_q")), 1, 0.0)
        .over(wl)
        .alias("d_left"),
    )
    return d.groupBy("n_ref", "n_cur").agg(
        F.round(F.max("d_right"), 6).alias("ks_lower"),
        F.round(
            F.max(F.col("d_left") + F.greatest("p_b", "q_b")), 6
        ).alias("ks_upper"),
    ).select("ks_lower", "ks_upper", "n_ref", "n_cur")


_DRIFT_KS_REFINED_SQL = f"""
WITH src AS (SELECT o_orderdate, o_totalprice FROM orders),
edges AS (
  SELECT quantile_cont(o_totalprice, [{", ".join(str(q) for q in _KSR_QS)}]) AS e
  FROM src WHERE o_orderdate < DATE '{SPLIT_DATE}'
),
ref_b AS (
  SELECT 1 + len(list_filter(e, x -> o_totalprice > x)) AS bucket,
         COUNT(*) AS ref_n
  FROM src CROSS JOIN edges WHERE o_orderdate < DATE '{SPLIT_DATE}'
  GROUP BY 1
),
cur_b AS (
  SELECT 1 + len(list_filter(e, x -> o_totalprice > x)) AS bucket,
         COUNT(*) AS cur_n
  FROM src CROSS JOIN edges WHERE o_orderdate >= DATE '{SPLIT_DATE}'
  GROUP BY 1
),
tot AS (
  SELECT COALESCE(r.bucket, c.bucket) AS bucket,
         COALESCE(ref_n, 0) AS ref_n, COALESCE(cur_n, 0) AS cur_n,
         (SELECT COUNT(*) FROM src WHERE o_orderdate < DATE '{SPLIT_DATE}')
           AS n_ref,
         (SELECT COUNT(*) FROM src WHERE o_orderdate >= DATE '{SPLIT_DATE}')
           AS n_cur
  FROM ref_b r FULL OUTER JOIN cur_b c ON r.bucket = c.bucket
),
cum AS (
  SELECT bucket, n_ref, n_cur,
         ref_n / CAST(n_ref AS DOUBLE) AS p_b,
         cur_n / CAST(n_cur AS DOUBLE) AS q_b,
         SUM(ref_n) OVER (ORDER BY bucket) / CAST(n_ref AS DOUBLE) AS cum_p,
         SUM(cur_n) OVER (ORDER BY bucket) / CAST(n_cur AS DOUBLE) AS cum_q
  FROM tot
),
d AS (
  SELECT n_ref, n_cur, p_b, q_b,
         ABS(cum_p - cum_q) AS d_right,
         COALESCE(LAG(ABS(cum_p - cum_q)) OVER (ORDER BY bucket), 0.0)
           AS d_left
  FROM cum
)
SELECT ROUND(MAX(d_right), 6) AS ks_lower,
       ROUND(MAX(d_left + GREATEST(p_b, q_b)), 6) AS ks_upper,
       n_ref, n_cur
FROM d GROUP BY n_ref, n_cur
"""

def q_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical drift: chi-square of the CURRENT o_orderpriority
    mix against expectations scaled from the REFERENCE mix — the
    categorical sibling of PSI (numeric) and KS (continuous), closing
    the drift-monitor family. contrib_k = (cur_k − n_cur·ref_k/n_ref)²
    / (n_cur·ref_k/n_ref).

    Scale shape: two category-keyed map-combinable counts + a 1-row
    totals broadcast; |categories| rows ever cross a shuffle. All
    inputs are exact integer counts → engine-identical doubles."""
    o = load_table(spark, sf_dir, "orders").select(
        (F.col("o_orderdate") < SPLIT_DATE).alias("is_ref"),
        "o_orderpriority",
    )
    counts = o.groupBy("o_orderpriority").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("ref_n"),
        F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)).alias("cur_n"),
    )
    totals = counts.agg(
        F.sum("ref_n").alias("n_ref"), F.sum("cur_n").alias("n_cur")
    )
    j = counts.crossJoin(F.broadcast(totals))
    exp = F.col("n_cur") * F.col("ref_n") / F.col("n_ref")
    contrib = F.when(
        F.col("ref_n") > 0, (F.col("cur_n") - exp) * (F.col("cur_n") - exp) / exp
    ).otherwise(F.lit(None))
    return j.select(
        "o_orderpriority",
        "ref_n",
        "cur_n",
        F.round(exp, 6).alias("expected_n"),
        F.round(contrib, 6).alias("chi2_contrib"),
    ).orderBy("o_orderpriority")


_DRIFT_CHI2_SQL = f"""
WITH src AS (SELECT o_orderdate, o_orderpriority FROM orders),
r AS (
  SELECT o_orderpriority, COUNT(*) AS ref_n FROM src
  WHERE o_orderdate < DATE '{SPLIT_DATE}' GROUP BY 1
),
c AS (
  SELECT o_orderpriority, COUNT(*) AS cur_n FROM src
  WHERE o_orderdate >= DATE '{SPLIT_DATE}' GROUP BY 1
),
j AS (
  SELECT COALESCE(r.o_orderpriority, c.o_orderpriority) AS o_orderpriority,
         COALESCE(ref_n, 0) AS ref_n, COALESCE(cur_n, 0) AS cur_n,
         (SELECT COUNT(*) FROM src WHERE o_orderdate < DATE '{SPLIT_DATE}')
           AS n_ref,
         (SELECT COUNT(*) FROM src WHERE o_orderdate >= DATE '{SPLIT_DATE}')
           AS n_cur
  FROM r FULL OUTER JOIN c ON r.o_orderpriority = c.o_orderpriority
)
SELECT o_orderpriority, ref_n, cur_n,
  ROUND(n_cur * ref_n / CAST(n_ref AS DOUBLE), 6) AS expected_n,
  ROUND(CASE WHEN ref_n > 0 THEN
    (cur_n - n_cur * ref_n / CAST(n_ref AS DOUBLE))
    * (cur_n - n_cur * ref_n / CAST(n_ref AS DOUBLE))
    / (n_cur * ref_n / CAST(n_ref AS DOUBLE)) END, 6) AS chi2_contrib
FROM j ORDER BY o_orderpriority
"""

QUERIES = {
    "drift_psi": q_drift_psi,
    "drift_ks": q_drift_ks,
    "drift_ks_refined": q_drift_ks_refined,
    "drift_chi2": q_drift_chi2,
}
ORACLE = {
    "drift_psi": _DRIFT_PSI_SQL,
    "drift_ks": _DRIFT_KS_SQL,
    "drift_ks_refined": _DRIFT_KS_REFINED_SQL,
    "drift_chi2": _DRIFT_CHI2_SQL,
}
