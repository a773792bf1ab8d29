"""The reference's flagship analytics — the 15-column technical
indicator suite (SURVEY §2.5) — oracle-checked end to end.

Instantiated on the fixtures' ``events`` table (user_id ≙ symbol,
ts ≙ trading_date, value ≙ close, deterministic derived volume) so the
DuckDB oracle can replay the exact window algebra of
reference spark-job/etl_job.py:271-356, quirks included.

The exact-EMA variant (true recursive EMA via applyInPandas) is not
SQL-expressible → registered without an oracle (rows-only check);
its numeric correctness is covered by golden pytest against pandas
``ewm`` (tests/test_indicators.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..pipeline.indicators import technical_indicators


def _events_as_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        F.col("user_id").alias("symbol"),
        F.col("ts").alias("trading_date"),
        F.col("event_id"),
        F.col("value").alias("close"),
        ((F.col("event_id") % 97) + 1).cast("double").alias("volume"),
    )


_ROUNDED = [
    ("sma_5", 6), ("sma_20", 6), ("sma_50", 6), ("sma_200", 6),
    ("ema_12", 6), ("ema_26", 6),
    ("macd", 6), ("signal_line", 6), ("macd_histogram", 6),
    ("bb_middle", 6), ("bb_upper", 6), ("bb_lower", 6),
    ("rsi", 6), ("obv", 2),
    ("day_change_pct", 6), ("week_change_pct", 6), ("month_change_pct", 6),
]


def q_technical_indicators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-parity indicator suite, one window family, one shuffle."""
    series = _events_as_series(spark, sf_dir)
    out = technical_indicators(
        series,
        symbol_col="symbol",
        date_col="trading_date",
        close_col="close",
        volume_col="volume",
        semantics="reference",
        order_tiebreak="event_id",
        # integer-tick arithmetic: window sums are exact longs, so the
        # result is bit-identical across engines, partitionings, and
        # reruns — floats would drift with accumulation order.
        decimal_exact=True,
    )
    cols = [
        F.col("symbol"),
        F.col("event_id"),
        F.round("close", 4).alias("close"),
    ] + [F.round(c, nd).alias(c) for c, nd in _ROUNDED]
    return out.select(*cols)


_TECHNICAL_INDICATORS_SQL = """
WITH base AS (
  SELECT
    user_id AS symbol,
    ts AS trading_date,
    event_id,
    value AS close,
    CAST(ROUND(value * 100.0, 0) AS BIGINT) AS ticks,
    CAST(event_id % 97 + 1 AS BIGINT) AS volume
  FROM events
),
l1 AS (
  SELECT *,
    CAST(SUM(ticks) OVER (PARTITION BY symbol ORDER BY trading_date, event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE)
      / COUNT(*) OVER (PARTITION BY symbol ORDER BY trading_date, event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) / 100.0 AS sma_5,
    CAST(SUM(ticks) OVER (PARTITION BY symbol ORDER BY trading_date, event_id ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS DOUBLE)
      / COUNT(*) OVER (PARTITION BY symbol ORDER BY trading_date, event_id ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) / 100.0 AS sma_20,
    CAST(SUM(ticks) OVER (PARTITION BY symbol ORDER BY trading_date, event_id ROWS BETWEEN 49 PRECEDING AND CURRENT ROW) AS DOUBLE)
      / COUNT(*) OVER (PARTITION BY symbol ORDER BY trading_date, event_id ROWS BETWEEN 49 PRECEDING AND CURRENT ROW) / 100.0 AS sma_50,
    CAST(SUM(ticks) OVER (PARTITION BY symbol ORDER BY trading_date, event_id ROWS BETWEEN 199 PRECEDING AND CURRENT ROW) AS DOUBLE)
      / COUNT(*) OVER (PARTITION BY symbol ORDER BY trading_date, event_id ROWS BETWEEN 199 PRECEDING AND CURRENT ROW) / 100.0 AS sma_200,
    CAST(SUM(ticks) OVER (PARTITION BY symbol ORDER BY trading_date, event_id ROWS BETWEEN 11 PRECEDING AND CURRENT ROW) AS DOUBLE)
      / COUNT(*) OVER (PARTITION BY symbol ORDER BY trading_date, event_id ROWS BETWEEN 11 PRECEDING AND CURRENT ROW) / 100.0 AS ema_12,
    CAST(SUM(ticks) OVER (PARTITION BY symbol ORDER BY trading_date, event_id ROWS BETWEEN 25 PRECEDING AND CURRENT ROW) AS DOUBLE)
      / COUNT(*) OVER (PARTITION BY symbol ORDER BY trading_date, event_id ROWS BETWEEN 25 PRECEDING AND CURRENT ROW) / 100.0 AS ema_26,
    CAST(SUM(ticks) OVER (PARTITION BY symbol ORDER BY trading_date, event_id ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS DOUBLE)
      / COUNT(*) OVER (PARTITION BY symbol ORDER BY trading_date, event_id ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) / 100.0 AS bb_middle,
    CAST(SUM(ticks) OVER (PARTITION BY symbol ORDER BY trading_date, event_id ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS DOUBLE) AS bb_s,
    CAST(SUM(ticks * ticks) OVER (PARTITION BY symbol ORDER BY trading_date, event_id ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS DOUBLE) AS bb_sq,
    COUNT(*) OVER (PARTITION BY symbol ORDER BY trading_date, event_id ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS bb_c,
    LAG(ticks, 1) OVER (PARTITION BY symbol ORDER BY trading_date, event_id) AS prev_t,
    LAG(close, 1) OVER (PARTITION BY symbol ORDER BY trading_date, event_id) AS prev1,
    LAG(close, 5) OVER (PARTITION BY symbol ORDER BY trading_date, event_id) AS prev5,
    LAG(close, 20) OVER (PARTITION BY symbol ORDER BY trading_date, event_id) AS prev20
  FROM base
),
l2 AS (
  SELECT *,
    ema_12 - ema_26 AS macd,
    CASE WHEN bb_c > 1
         THEN sqrt(greatest((bb_sq - bb_s * bb_s / bb_c) / (bb_c - 1), 0.0)) / 100.0
         ELSE NULL END AS bb_std,
    CASE WHEN ticks - prev_t > 0 THEN ticks - prev_t ELSE 0 END AS gain_t,
    CASE WHEN ticks - prev_t < 0 THEN -(ticks - prev_t) ELSE 0 END AS loss_t,
    CASE WHEN ticks - prev_t > 0 THEN volume
         WHEN ticks - prev_t < 0 THEN -volume
         ELSE 0 END AS signed_vol
  FROM l1
),
l3 AS (
  SELECT *,
    CAST(SUM(gain_t) OVER (PARTITION BY symbol ORDER BY trading_date, event_id ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS DOUBLE)
      / COUNT(*) OVER (PARTITION BY symbol ORDER BY trading_date, event_id ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) / 100.0 AS avg_gain,
    CAST(SUM(loss_t) OVER (PARTITION BY symbol ORDER BY trading_date, event_id ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS DOUBLE)
      / COUNT(*) OVER (PARTITION BY symbol ORDER BY trading_date, event_id ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) / 100.0 AS avg_loss,
    AVG(macd) OVER (PARTITION BY symbol ORDER BY trading_date, event_id ROWS BETWEEN 8 PRECEDING AND CURRENT ROW) AS signal_line,
    CAST(SUM(signed_vol) OVER (PARTITION BY symbol ORDER BY trading_date, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS obv
  FROM l2
)
SELECT
  symbol,
  event_id,
  ROUND(close, 4) AS close,
  ROUND(sma_5, 6) AS sma_5,
  ROUND(sma_20, 6) AS sma_20,
  ROUND(sma_50, 6) AS sma_50,
  ROUND(sma_200, 6) AS sma_200,
  ROUND(ema_12, 6) AS ema_12,
  ROUND(ema_26, 6) AS ema_26,
  ROUND(macd, 6) AS macd,
  ROUND(signal_line, 6) AS signal_line,
  ROUND(macd - signal_line, 6) AS macd_histogram,
  ROUND(bb_middle, 6) AS bb_middle,
  ROUND(bb_middle + 2 * bb_std, 6) AS bb_upper,
  ROUND(bb_middle - 2 * bb_std, 6) AS bb_lower,
  ROUND(100.0 - 100.0 / (1.0 + CASE WHEN avg_loss <> 0 THEN avg_gain / avg_loss ELSE 100.0 END), 6) AS rsi,
  ROUND(obv, 2) AS obv,
  ROUND(CASE WHEN prev1 IS NOT NULL AND prev1 <> 0 THEN (close - prev1) / prev1 * 100.0 ELSE 0.0 END, 6) AS day_change_pct,
  ROUND(CASE WHEN prev5 IS NOT NULL AND prev5 <> 0 THEN (close - prev5) / prev5 * 100.0 ELSE 0.0 END, 6) AS week_change_pct,
  ROUND(CASE WHEN prev20 IS NOT NULL AND prev20 <> 0 THEN (close - prev20) / prev20 * 100.0 ELSE 0.0 END, 6) AS month_change_pct
FROM l3
"""


def q_technical_indicators_exact_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-EMA variant — recursive state via applyInPandas, the one
    indicator a Catalyst window can't express (SURVEY §7). Rows-only
    driver check; numerics covered by golden tests."""
    series = _events_as_series(spark, sf_dir)
    out = technical_indicators(
        series,
        symbol_col="symbol",
        date_col="trading_date",
        close_col="close",
        volume_col="volume",
        semantics="exact",
        order_tiebreak="event_id",
    )
    return out.select(
        "symbol",
        "event_id",
        F.round("close", 4).alias("close"),
        F.round("ema_12", 6).alias("ema_12"),
        F.round("ema_26", 6).alias("ema_26"),
        F.round("macd", 6).alias("macd"),
        F.round("signal_line", 6).alias("signal_line"),
        F.round("macd_histogram", 6).alias("macd_histogram"),
    )


def q_technical_indicators_exact_suite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The full exact-recursion family (pipeline/indicators.py::
    exact_indicator_suite): true EMA 12/26, true-EMA MACD with an
    EMA-9 signal line, and Wilder-smoothed RSI-14 — the formulas the
    reference's ta==0.10.2 pin implements. Recursive smoothing is not
    SQL-expressible → rows-only driver check; parity with
    independently-computed pandas formulas pinned in
    tests/test_indicators.py."""
    from ..pipeline.indicators import exact_indicator_suite

    series = _events_as_series(spark, sf_dir)
    out = exact_indicator_suite(
        series,
        symbol_col="symbol",
        date_col="trading_date",
        close_col="close",
        order_tiebreak="event_id",
    )
    return out.select(
        "symbol",
        "event_id",
        F.round("close", 4).alias("close"),
        F.round("ema_12", 6).alias("ema_12"),
        F.round("ema_26", 6).alias("ema_26"),
        F.round("macd", 6).alias("macd"),
        F.round("signal_line", 6).alias("signal_line"),
        F.round("macd_histogram", 6).alias("macd_histogram"),
        F.round("rsi_wilder", 6).alias("rsi_wilder"),
    )


QUERIES = {
    "technical_indicators": q_technical_indicators,
    "technical_indicators_exact_ema": q_technical_indicators_exact_ema,
    "technical_indicators_exact_suite": q_technical_indicators_exact_suite,
}

ORACLE = {
    "technical_indicators": _TECHNICAL_INDICATORS_SQL,
}
