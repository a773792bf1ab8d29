"""Domain-pipeline queries: the reference's flagship OHLCV clean step,
oracle-checked (SURVEY §3.1).

The fixtures carry no raw OHLCV table, so the query synthesizes one
deterministically from ``events`` — including deliberately messy dates
(every 50th row is wrapped in ``ts:<date>T00:00:00Z``) so the regex
salvage path (reference spark-job/etl_job.py:224-231) is exercised and
oracle-verified, then runs the engine's real ``clean_and_prepare``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..pipeline.etl import clean_and_prepare


def _raw_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    date_str = F.date_format("ts", "yyyy-MM-dd")
    messy = F.when(
        F.col("event_id") % 50 == 0,
        F.concat(F.lit("ts:"), date_str, F.lit("T00:00:00Z")),
    ).otherwise(date_str)
    price = F.round(F.col("value") + 10.0, 2)
    return e.select(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("ticker"),
        messy.alias("date"),
        price.alias("open"),
        F.round(price * 1.01, 2).alias("high"),
        F.round(price * 0.99, 2).alias("low"),
        F.when(F.col("event_id") % 97 == 0, F.lit(None)).otherwise(price).alias("close"),
        (F.col("event_id") % 1000 + 1).alias("volume"),
        # microsecond precision: keeps event_time unique per row so the
        # last-write-wins dedup has a deterministic winner
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("timestamp"),
        F.col("ts").alias("consumed_at"),
    )


def q_ohlcv_clean_prepare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's defensive clean (etl_job.py:200-263) end to end:
    regex salvage, casts, null filters, uppercase symbol, sha2 row key,
    last-write-wins dedup per (symbol, trading_date)."""
    raw = _raw_from_events(spark, sf_dir)
    clean = clean_and_prepare(raw)
    return clean.select(
        "symbol",
        F.col("trading_date").cast("string").alias("trading_date"),
        F.round("close", 2).alias("close"),
        F.col("volume").cast("long").alias("volume"),
        "row_key",
    )


_OHLCV_CLEAN_PREPARE_SQL = """
WITH raw AS (
  SELECT
    'u' || CAST(user_id AS VARCHAR) AS ticker,
    CASE WHEN event_id % 50 = 0
         THEN 'ts:' || strftime(ts, '%Y-%m-%d') || 'T00:00:00Z'
         ELSE strftime(ts, '%Y-%m-%d') END AS date,
    ROUND(value + 10.0, 2) AS open,
    CASE WHEN event_id % 97 = 0 THEN NULL ELSE ROUND(value + 10.0, 2) END AS close,
    event_id % 1000 + 1 AS volume,
    strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') AS timestamp,
    ts AS consumed_at
  FROM events
),
salvaged AS (
  SELECT *,
    CASE WHEN regexp_matches(date, '^\\d{4}-\\d{2}-\\d{2}$') THEN date
         ELSE regexp_extract(date, '(\\d{4}-\\d{2}-\\d{2})', 1) END AS date_fixed
  FROM raw
),
clean AS (
  SELECT
    upper(ticker) AS symbol,
    CAST(date_fixed AS DATE) AS trading_date,
    close,
    CAST(volume AS BIGINT) AS volume,
    CAST(timestamp AS TIMESTAMP) AS event_time
  FROM salvaged
  WHERE date_fixed IS NOT NULL AND date_fixed <> ''
    AND close IS NOT NULL AND NOT isnan(close)
    AND open IS NOT NULL AND NOT isnan(open)
    AND volume IS NOT NULL
),
keyed AS (
  SELECT *,
    sha256(symbol || chr(167) || strftime(trading_date, '%Y-%m-%d')) AS row_key,
    ROW_NUMBER() OVER (
      PARTITION BY symbol, trading_date
      ORDER BY event_time DESC,
               sha256(symbol || chr(167) || strftime(trading_date, '%Y-%m-%d'))
    ) AS rn
  FROM clean
)
SELECT symbol,
       CAST(trading_date AS VARCHAR) AS trading_date,
       ROUND(close, 2) AS close,
       volume,
       row_key
FROM keyed
WHERE rn = 1
"""


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 scale path: HLL approx_count_distinct per group — THE
    count-distinct used at 100 TB (mergeable sketches, no expand
    shuffle). Sketch values are engine-specific → rows-only check; the
    exact twin is oracle-checked in queries/aggregates.py."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )


QUERIES = {
    "ohlcv_clean_prepare": q_ohlcv_clean_prepare,
    "approx_distinct": q_approx_distinct,
}

ORACLE = {
    "ohlcv_clean_prepare": _OHLCV_CLEAN_PREPARE_SQL,
}
