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
from ..functions.columns import tick_avg

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


_MAD_BINS = 256


def q_anomaly_mad_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """anomaly_mad's per-type robust stats with GROUPED medians read
    off per-type integer-tick histograms instead of exact
    percentile — the 100-TB edge path for keyed quantiles (the
    global-quantile twin is drift_psi_histogram; this is the
    per-group form, the shape a per-feature monitor runs at scale).

    Two histogram rounds, each O(bins) state per (type, partition):
    (1) per-type value histogram → median = hi edge of the crossing
    bin; (2) per-type |value − med| histogram → MAD the same way.
    Cumulative windows run over ≤bins-row frames PER TYPE
    (partitioned — never a global sort). Everything is exact integer
    arithmetic until the final rounding, so both engines agree
    bit-for-bit. Output: the per-type audit (n, quantized median/MAD
    in dollars, flagged count under the same 3.5·1.4826 robust-z cut
    as anomaly_mad, evaluated in scaled integers)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = e.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("t")
    )

    def hist_quantile(src: DataFrame, col: str, out: str) -> DataFrame:
        """Per-type median of ``col`` (ticks) via a {bins}-bin
        histogram: returns (event_type, {out}) with the median
        quantized to its crossing bin's hi edge."""
        bounds = src.groupBy("event_type").agg(
            F.min(col).alias("mn"), F.max(col).alias("mx")
        )
        hist = (
            src.join(F.broadcast(bounds), "event_type")
            .select(
                "event_type",
                "mn",
                "mx",
                F.least(
                    F.lit(_MAD_BINS - 1),
                    F.expr(f"(({col} - mn) * {_MAD_BINS}) div (mx - mn + 1)"),
                ).alias("bin"),
            )
            .groupBy("event_type", "mn", "mx", "bin")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        wcum = (
            Window.partitionBy("event_type")
            .orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wall = Window.partitionBy("event_type")
        cum = hist.withColumn("cum", F.sum("n").over(wcum)).withColumn(
            "total", F.sum("n").over(wall)
        )
        med = cum.filter(
            ((F.col("cum") - F.col("n")) * 2 < F.col("total"))
            & (F.col("cum") * 2 >= F.col("total"))
        )
        return med.select(
            "event_type",
            F.expr(f"mn + ((bin + 1) * (mx - mn + 1)) div {_MAD_BINS}").alias(
                out
            ),
        )

    med = hist_quantile(s, "t", "med_tick")
    dev = s.join(F.broadcast(med), "event_type").select(
        "event_type", "med_tick", F.abs(F.col("t") - F.col("med_tick")).alias("d")
    )
    mad = hist_quantile(dev, "d", "mad_tick")
    # robust-z cut in scaled integers: |dev| > 3.5·1.4826·mad
    # ⇔ dev·10000 > 51891·mad — exact longs on both engines
    flagged = (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med_tick", "mad_tick")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    (F.col("mad_tick") > 0)
                    & (F.col("d") * 10000 > F.lit(51891) * F.col("mad_tick")),
                    1,
                ).otherwise(0)
            ).cast("long").alias("n_flagged"),
        )
    )
    return flagged.select(
        "event_type",
        "n",
        F.round(F.col("med_tick") / 100.0, 2).alias("est_median"),
        F.round(F.col("mad_tick") / 100.0, 2).alias("est_mad"),
        "n_flagged",
    ).orderBy("event_type")


def _hist_quantile_sql(src: str, col: str, out: str) -> str:
    """DuckDB CTE chain mirroring hist_quantile over CTE ``src``."""
    return f"""{out}_bounds AS (
  SELECT event_type, MIN({col}) AS mn, MAX({col}) AS mx
  FROM {src} GROUP BY event_type
),
{out}_hist AS (
  SELECT s.event_type, mn, mx,
         LEAST({_MAD_BINS - 1},
               (({col} - mn) * {_MAD_BINS}) // (mx - mn + 1)) AS bin,
         COUNT(*) AS n
  FROM {src} s JOIN {out}_bounds b USING (event_type)
  GROUP BY 1, 2, 3, 4
),
{out}_cum AS (
  SELECT *,
         SUM(n) OVER (PARTITION BY event_type ORDER BY bin
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         SUM(n) OVER (PARTITION BY event_type) AS total
  FROM {out}_hist
),
{out} AS (
  SELECT event_type,
         mn + ((bin + 1) * (mx - mn + 1)) // {_MAD_BINS} AS {out}_tick
  FROM {out}_cum
  WHERE (cum - n) * 2 < total AND cum * 2 >= total
)"""


_ANOMALY_MAD_HISTOGRAM_SQL = f"""
WITH s AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS t
  FROM events WHERE value IS NOT NULL
),
{_hist_quantile_sql("s", "t", "med")},
dev AS (
  SELECT s.event_type, med.med_tick, ABS(s.t - med.med_tick) AS d
  FROM s JOIN med USING (event_type)
),
{_hist_quantile_sql("dev", "d", "mad")}
SELECT dev.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(dev.med_tick / 100.0, 2) AS est_median,
       ROUND(mad.mad_tick / 100.0, 2) AS est_mad,
       CAST(SUM(CASE WHEN mad.mad_tick > 0
                      AND dev.d * 10000 > 51891 * mad.mad_tick
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
FROM dev JOIN mad USING (event_type)
GROUP BY dev.event_type, dev.med_tick, mad.mad_tick
ORDER BY dev.event_type
"""


N_BINS = 10
_BIN_QS = [i / N_BINS for i in range(1, N_BINS)]  # 9 decile edges


def q_feature_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile bins of order totalprice with per-bin stats —
    broadcast-edge bucketing, the scale-safe formulation.

    The previous ntile form was the repo's one single-partition global
    sort (``Exchange SinglePartition`` + full Sort feeding one
    WindowExec task — the forbidden shape at 100 TB, and Catalyst's
    rank-limit rewrite cannot save ntile). This version derives the 9
    decile edges in ONE map-side-combinable percentile aggregate,
    broadcasts the 1-row edge frame, and assigns bins by comparison —
    exactly the drift_psi shape. Bin counts are quantile-edge counts
    (ties at an edge all land in the lower bin) rather than exact
    n/10 splits, which is the standard — and distributable —
    equal-frequency binning semantics.

    Determinism: Spark ``percentile`` ≡ DuckDB ``quantile_cont``
    produce identical interpolated doubles (the engine-portable pair
    proven by drift_psi/q_percentiles), so the > edge comparisons
    agree bit-for-bit."""
    o = load_table(spark, sf_dir, "orders").select("o_totalprice")
    qs = ", ".join(str(q) for q in _BIN_QS)
    edges = o.agg(
        F.expr(f"percentile(o_totalprice, array({qs}))").alias("e")
    )
    binned = o.crossJoin(F.broadcast(edges)).select(
        F.aggregate(
            F.col("e"),
            F.lit(1),
            lambda acc, e: acc
            + F.when(F.col("o_totalprice") > e, 1).otherwise(0),
        ).alias("bin"),
        "o_totalprice",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
            tick_avg("o_totalprice", 10_000, dp=2).alias("avg_price"),
        )
        .orderBy("bin")
    )


_FEATURE_BINNING_SQL = f"""
WITH edges AS (
  SELECT quantile_cont(o_totalprice, [{", ".join(str(q) for q in _BIN_QS)}]) AS e
  FROM orders
)
SELECT 1 + len(list_filter(e, x -> o_totalprice > x)) AS bin,
       COUNT(*) AS n,
       ROUND(MIN(o_totalprice), 2) AS lo,
       ROUND(MAX(o_totalprice), 2) AS hi,
       ROUND(SUM(CAST(ROUND(o_totalprice * 10000, 0) AS BIGINT)) / (10000.0 * COUNT(o_totalprice)), 2) AS avg_price
FROM orders CROSS JOIN edges
GROUP BY 1
ORDER BY bin
"""

_ROLL_FRAME = 10  # current row + 10 preceding


def q_rolling_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-symbol ROLLING median/IQR outlier flag — the windowed
    complement to anomaly_mad's global per-type rule: a price is
    anomalous relative to its own recent history (Tukey fence,
    1.5×IQR around the rolling median), not the whole distribution.

    One shuffle (hashpartitioning symbol); the sliding 11-row frame
    recomputes exact percentiles per row — O(frame) per row, constant
    state, survives any scale-out. Integer ticks keep the
    interpolated quantiles dyadic-exact (multiples of 1/4), so the
    unrounded Tukey comparison is bit-identical on both engines.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~F.isnan("value")
    )
    s = e.select(
        F.col("user_id").alias("symbol"),
        F.unix_micros(F.col("ts")).alias("k"),
        F.col("event_id"),
        F.round(F.col("value") * 100).cast("long").alias("ticks"),
    )
    # event_id is a unique final tiebreak: (symbol, k) is unique in
    # the fixtures, but the frame contents must stay deterministic
    # even if duplicate timestamps ever appear (both engines order
    # identically)
    win = (
        Window.partitionBy("symbol")
        .orderBy(F.col("k").asc(), F.col("event_id").asc())
        .rowsBetween(-_ROLL_FRAME, 0)
    )
    med = F.percentile("ticks", F.lit(0.5)).over(win)
    q1 = F.percentile("ticks", F.lit(0.25)).over(win)
    q3 = F.percentile("ticks", F.lit(0.75)).over(win)
    # quantiles are multiples of ¼ tick; ×4 returns them to EXACT
    # integers (quarter-ticks) — no float rounding, no half-case
    # divergence between engines (SCALE.md integer-tick policy)
    return s.select(
        "symbol",
        "k",
        F.round(F.col("ticks") / 100.0, 2).alias("price"),
        (med * 4).cast("long").alias("med_qticks"),
        ((q3 - q1) * 4).cast("long").alias("iqr_qticks"),
        F.when(
            F.abs(F.col("ticks") - med) > 1.5 * (q3 - q1), F.lit(1)
        ).otherwise(F.lit(0)).cast("int").alias("is_outlier"),
    )


_ROLLING_ROBUST_SQL = f"""
WITH s AS (
  SELECT user_id AS symbol,
         epoch_us(ts) AS k,
         event_id,
         CAST(ROUND(value * 100) AS BIGINT) AS ticks
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)
),
w AS (
  SELECT symbol, k, ticks,
         quantile_cont(ticks, 0.5) OVER win AS med,
         quantile_cont(ticks, 0.25) OVER win AS q1,
         quantile_cont(ticks, 0.75) OVER win AS q3
  FROM s
  WINDOW win AS (PARTITION BY symbol ORDER BY k ASC, event_id ASC
                 ROWS BETWEEN {_ROLL_FRAME} PRECEDING AND CURRENT ROW)
)
SELECT symbol, k,
       ROUND(ticks / 100.0, 2) AS price,
       CAST(med * 4 AS BIGINT) AS med_qticks,
       CAST((q3 - q1) * 4 AS BIGINT) AS iqr_qticks,
       CAST(CASE WHEN abs(ticks - med) > 1.5 * (q3 - q1)
                 THEN 1 ELSE 0 END AS INT) AS is_outlier
FROM w
"""

QUERIES = {
    "anomaly_mad": q_anomaly_mad,
    "anomaly_mad_histogram": q_anomaly_mad_histogram,
    "feature_binning": q_feature_binning,
    "rolling_robust_outliers": q_rolling_robust_outliers,
}
ORACLE = {
    "anomaly_mad": _ANOMALY_MAD_SQL,
    "anomaly_mad_histogram": _ANOMALY_MAD_HISTOGRAM_SQL,
    "feature_binning": _FEATURE_BINNING_SQL,
    "rolling_robust_outliers": _ROLLING_ROBUST_SQL,
}
