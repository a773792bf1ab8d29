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


def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    ref, cur = _populations(spark, sf_dir)
    qs = ", ".join(str(q) for q in _PSI_QS)
    edges = ref.agg(
        F.expr(f"percentile(o_totalprice, array({qs}))").alias("e")
    )

    def bucketed(df: DataFrame, name: str) -> DataFrame:
        b = df.crossJoin(F.broadcast(edges)).select(
            F.aggregate(
                F.col("e"),
                F.lit(1),
                lambda acc, e: acc
                + F.when(F.col("o_totalprice") > e, 1).otherwise(0),
            ).alias("bucket")
        )
        return b.groupBy("bucket").agg(F.count(F.lit(1)).alias(f"{name}_n"))

    r = bucketed(ref, "ref")
    c = bucketed(cur, "cur")
    tot = (
        r.join(c, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("ref_n", F.lit(0)).alias("ref_n"),
            F.coalesce("cur_n", F.lit(0)).alias("cur_n"),
        )
        .crossJoin(
            F.broadcast(
                ref.agg(F.count(F.lit(1)).alias("ref_total")).crossJoin(
                    cur.agg(F.count(F.lit(1)).alias("cur_total"))
                )
            )
        )
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

QUERIES = {"drift_psi": q_drift_psi, "drift_ks": q_drift_ks}
ORACLE = {"drift_psi": _DRIFT_PSI_SQL, "drift_ks": _DRIFT_KS_SQL}
