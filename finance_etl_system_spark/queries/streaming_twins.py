"""Batch twins of the streaming semantics (SURVEY §2.8 T1-T7).

The reference's stream is Kafka JSON -> micro-batched consumer ->
Mongo (reference kafka-consumer/consumer.py:113-146); it has NO
event-time windows (SURVEY §2.8 T6) — these queries add the tumbling /
sliding / session window and stateful-dedup coverage over the
``events`` fixture, exactly as the live Structured Streaming path
(streaming/ingest.py) computes them, but in batch so the DuckDB oracle
can replay them.

Scale notes: window aggregations group on (bucket, key) — buckets are
derived JVM-side, partial aggregation applies, and the shuffle key
cardinality is bounded by (#buckets × #keys). Session windows shuffle
once on user_id then sort in-partition (gaps-and-islands window) —
the same plan Structured Streaming's state store would maintain
incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.columns import money_sum


def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6: 1-day tumbling event-time window per event_type."""
    e = load_table(spark, sf_dir, "events")
    win = F.window("ts", "1 day")
    return (
        e.groupBy(win.alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            money_sum("value").alias("total_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
            "total_value",
        )
    )


_TUMBLING_WINDOW_SQL = """
SELECT
  strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
  event_type,
  COUNT(*) AS n,
  ROUND(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0, 2) AS total_value
FROM events
GROUP BY 1, 2
"""


def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6: 1-hour window sliding every 30 minutes, per event_type.

    Each event lands in 2 overlapping windows; Spark's ``window()``
    expands them natively, the oracle unions the two shifted buckets.
    """
    e = load_table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour", "30 minutes")
    return (
        e.groupBy(win.alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
        )
    )


_SLIDING_WINDOW_SQL = """
WITH expanded AS (
  SELECT
    time_bucket(INTERVAL '30 minutes', ts) - (k * INTERVAL '30 minutes') AS win_start,
    event_type
  FROM events
  CROSS JOIN (VALUES (0), (1)) AS offsets(k)
)
SELECT
  strftime(win_start, '%Y-%m-%d %H:%M:%S') AS window_start,
  event_type,
  COUNT(*) AS n
FROM expanded
GROUP BY 1, 2
"""


def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6: per-user session windows with a 30-minute inactivity gap.

    Batch uses the gaps-and-islands formulation; the live streaming
    path uses ``F.session_window`` with the same gap (both produce
    sessions keyed by their first event time).
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull()
        | ((F.unix_micros("ts") - F.unix_micros(prev_ts)) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    sessions = (
        e.withColumn("_new", is_new)
        .withColumn(
            "_session_no",
            F.sum("_new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "_session_no")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value").alias("session_value"),
        )
    )
    return sessions.select("user_id", "session_start", "n_events", "session_value")


_SESSION_WINDOW_SQL = """
WITH flagged AS (
  SELECT *,
    CASE WHEN LAG(ts) OVER w IS NULL
              OR ts - LAG(ts) OVER w > INTERVAL '30 minutes'
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT *,
    SUM(is_new) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS session_no
  FROM flagged
)
SELECT
  user_id,
  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
  COUNT(*) AS n_events,
  ROUND(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0, 2) AS session_value
FROM numbered
GROUP BY user_id, session_no
"""


def q_stateful_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7: replay-safe dedup — first event per (user_id, event_type).

    The batch twin of ``dropDuplicatesWithinWatermark`` and of the
    reference's ES doc-id upsert idempotency
    (reference spark-job/etl_job.py:457-459).
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("first_ts"),
        )
    )


_STATEFUL_DEDUP_SQL = """
SELECT user_id, event_type, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS first_ts
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY user_id, event_type ORDER BY ts, event_id
  ) AS rn
  FROM events
) t
WHERE rn = 1
"""


QUERIES = {
    "tumbling_window": q_tumbling_window,
    "sliding_window": q_sliding_window,
    "session_window": q_session_window,
    "stateful_dedup": q_stateful_dedup,
}

ORACLE = {
    "tumbling_window": _TUMBLING_WINDOW_SQL,
    "sliding_window": _SLIDING_WINDOW_SQL,
    "session_window": _SESSION_WINDOW_SQL,
    "stateful_dedup": _STATEFUL_DEDUP_SQL,
}
