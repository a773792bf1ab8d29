"""Robust outlier detection and feature quantization — the data-QA
operators a training pipeline runs before a table is trusted
(extends SURVEY §2.10's validation tier; the reference's ML monitor
flags model drift hourly — ml-service/ml_scheduler.py monitor job —
this is the engine-native, data-level counterpart).

- ``anomaly_mad``: per-event-type robust z-score via median/MAD
  (median absolute deviation), the outlier rule that survives the
  heavy tails that break mean/stddev z-scores. Two exact-percentile
  aggregates + one broadcast join back.
- ``feature_binning``: equal-frequency (decile) quantization of a
  numeric feature with per-bin summary stats — the ntile idiom used
  to bucket continuous features for monotonicity checks / WoE.

Scale shape: anomaly_mad is two groupBy-percentile passes over the
fact (map-side combinable percentile sketch per group) and one
broadcast join of a |event_type|-sized stats table; nothing scales
with row count except the two scans. feature_binning is ONE window
sort — the unavoidable cost of exact equal-frequency bins; the
approx-percentile variant (operators/sketches.py) is the
scan-only alternative at 100 TB.

Determinism: exact interpolated percentiles on both engines
(Spark ``percentile`` ≡ DuckDB ``quantile_cont``), 6dp rounding on
every ratio, 2dp on money, ntile ordered by (value, unique key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

# 1.4826 ≈ 1/Φ⁻¹(3/4): makes MAD a consistent σ estimator for normal
# data, so the 3.5 cut matches the usual robust-z convention.
MAD_SCALE = 1.4826
Z_CUT = 3.5


def q_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value is a robust outlier within its event_type.

    Returns the flagged rows with the rounded robust z-score, plus the
    per-type median/MAD so the thresholds are auditable."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    med = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "absdev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("absdev", F.lit(0.5)).alias("mad")
    )
    flagged = (
        dev.join(F.broadcast(mad), "event_type")
        .filter(
            (F.col("mad") > 0)
            & (F.col("absdev") > F.lit(Z_CUT * MAD_SCALE) * F.col("mad"))
        )
        .select(
            "event_id",
            "event_type",
            F.round("value", 2).alias("value"),
            F.round(F.col("absdev") / (F.lit(MAD_SCALE) * F.col("mad")), 6).alias(
                "robust_z"
            ),
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
        )
    )
    return flagged


_ANOMALY_MAD_SQL = f"""
WITH e AS (SELECT * FROM events WHERE value IS NOT NULL),
med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM e GROUP BY event_type
),
dev AS (
  SELECT e.event_id, e.event_type, e.value, med.med,
         abs(e.value - med.med) AS absdev
  FROM e JOIN med USING (event_type)
),
mad AS (
  SELECT event_type, quantile_cont(absdev, 0.5) AS mad
  FROM dev GROUP BY event_type
)
SELECT dev.event_id,
       dev.event_type,
       ROUND(dev.value, 2) AS value,
       ROUND(dev.absdev / ({MAD_SCALE} * mad.mad), 6) AS robust_z,
       ROUND(dev.med, 6) AS med,
       ROUND(mad.mad, 6) AS mad
FROM dev
JOIN mad USING (event_type)
WHERE mad.mad > 0
  AND dev.absdev > {Z_CUT} * {MAD_SCALE} * mad.mad
"""


N_BINS = 10


def q_feature_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile bins of order totalprice with per-bin stats.

    ntile over (o_totalprice, o_orderkey) — the unique key makes the
    bin assignment deterministic across engines even at ties."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").asc())
    return (
        o.withColumn("bin", F.ntile(N_BINS).over(w))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
    )


_FEATURE_BINNING_SQL = f"""
SELECT bin,
       COUNT(*) AS n,
       ROUND(MIN(o_totalprice), 2) AS lo,
       ROUND(MAX(o_totalprice), 2) AS hi,
       ROUND(AVG(o_totalprice), 2) AS avg_price
FROM (
  SELECT o_totalprice,
         ntile({N_BINS}) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) AS bin
  FROM orders
)
GROUP BY bin
"""

QUERIES = {
    "anomaly_mad": q_anomaly_mad,
    "feature_binning": q_feature_binning,
}
ORACLE = {
    "anomaly_mad": _ANOMALY_MAD_SQL,
    "feature_binning": _FEATURE_BINNING_SQL,
}
