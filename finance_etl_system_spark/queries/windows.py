"""Generic window-function coverage (SURVEY §2.5 W5, W9, W10 + harness
additions: rank family, range frames, first/last values, cumulative sums).

All windows follow the reference's canonical spec
``Window.partitionBy(symbol).orderBy(trading_date)``
(reference spark-job/etl_job.py:265-269), re-keyed to the fixtures'
``events`` table: partition by user_id, order by ts.

Scale notes: one window spec per query → ONE hash-partition shuffle on
the partition key, then in-partition sort. Partition keys (user_id /
custkey) are high-cardinality, so no single executor holds more than
one key group's frame state. No driver collection anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.columns import tick_sum


def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5/W9: lag(1), lag(5), lead(5) — the reference's previous-close
    (reference etl_job.py:305,323,329) and future-target shift(-5)
    (reference ml-service/ml_pipeline.py:142)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.round("value", 2).alias("value"),
        F.round(F.lag("value", 1).over(w), 2).alias("prev_value"),
        F.round(F.lag("value", 5).over(w), 2).alias("value_5_back"),
        F.round(F.lead("value", 5).over(w), 2).alias("value_5_ahead"),
    )


_WINDOW_LAG_LEAD_SQL = """
SELECT
  user_id,
  event_id,
  ROUND(value, 2) AS value,
  ROUND(LAG(value, 1) OVER w, 2) AS prev_value,
  ROUND(LAG(value, 5) OVER w, 2) AS value_5_back,
  ROUND(LEAD(value, 5) OVER w, 2) AS value_5_ahead
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile / percent_rank per group."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        )
        .filter(F.col("rnk") <= 50)
    )


_WINDOW_RANK_FAMILY_SQL = """
SELECT * FROM (
  SELECT
    o_orderpriority,
    o_orderkey,
    RANK() OVER w AS rnk,
    DENSE_RANK() OVER w AS drnk,
    NTILE(4) OVER w AS quartile,
    ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC)
) t
WHERE rnk <= 50
"""


def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rangeBetween: per-user rolling 1-hour event-time aggregate.

    Spark range frames need a numeric ordering column → unix_micros;
    DuckDB uses RANGE with an INTERVAL bound. Both frames are
    inclusive [ts - 1h, ts].
    """
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("events_last_hour"),
        F.round(
            tick_sum("value").over(w) / 100.0, 2
        ).alias("value_last_hour"),
    )


_WINDOW_RANGE_FRAME_SQL = """
SELECT
  user_id,
  event_id,
  COUNT(*) OVER w AS events_last_hour,
  ROUND(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) OVER w / 100.0, 2)
    AS value_last_hour
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY ts
  RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW
)
"""


def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value over the full partition frame."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.first("value").over(w), 2).alias("first_session_value"),
        F.round(F.last("value").over(w), 2).alias("last_session_value"),
    ).distinct()


_WINDOW_FIRST_LAST_SQL = """
SELECT DISTINCT
  user_id,
  event_id,
  ROUND(FIRST_VALUE(value) OVER w, 2) AS first_session_value,
  ROUND(LAST_VALUE(value) OVER w, 2) AS last_session_value
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY ts, event_id
  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
)
"""


def q_window_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7: running total — the reference's OBV cumulative-sum frame
    (reference etl_job.py:315-319)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(
            tick_sum("value").over(w) / 100.0, 2
        ).alias("running_value"),
        F.row_number().over(Window.partitionBy("user_id").orderBy("ts", "event_id")).alias("seq"),
    )


_WINDOW_CUMSUM_SQL = """
SELECT
  user_id,
  event_id,
  ROUND(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) OVER w / 100.0, 2)
    AS running_value,
  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY ts, event_id
  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
)
"""


def q_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-and-islands: per-user streaks of consecutive ACTIVE DAYS
    via the row_number-difference idiom (day − rn is constant within
    a run of consecutive days). Two window-free aggregations plus one
    window — all keyed on user_id, one hash partitioning end to end.
    Output: islands per user, longest streak, total active days."""
    e = load_table(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    anchored = days.withColumn(
        "anchor", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    islands = anchored.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("streak_len")
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.max("streak_len").alias("longest_streak"),
            F.sum("streak_len").alias("active_days"),
        )
        .orderBy("user_id")
    )


_GAP_ISLANDS_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
anchored AS (
  SELECT user_id, day,
         day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER) AS anchor
  FROM days
),
islands AS (
  SELECT user_id, anchor, COUNT(*) AS streak_len
  FROM anchored GROUP BY user_id, anchor
)
SELECT user_id, COUNT(*) AS n_islands, MAX(streak_len) AS longest_streak,
       CAST(SUM(streak_len) AS BIGINT) AS active_days
FROM islands GROUP BY user_id ORDER BY user_id
"""


def q_window_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct count over a moving frame. Spark has no
    COUNT(DISTINCT) OVER — the idiomatic form is
    ``size(collect_set(...))`` over the same frame (set state is
    bounded by the frame length × type cardinality, fine at scale);
    DuckDB oracles it with the native distinct window aggregate."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.size(F.collect_set("event_type").over(w)).alias("distinct_types_20"),
    )


_WINDOW_DISTINCT_COUNT_SQL = """
SELECT user_id, event_id,
       COUNT(DISTINCT event_type) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 19 PRECEDING AND CURRENT ROW
       ) AS distinct_types_20
FROM events
"""


QUERIES = {
    "gap_islands": q_gap_islands,
    "window_distinct_count": q_window_distinct_count,
    "window_lag_lead": q_window_lag_lead,
    "window_rank_family": q_window_rank_family,
    "window_range_frame": q_window_range_frame,
    "window_first_last": q_window_first_last,
    "window_cumsum": q_window_cumsum,
}

ORACLE = {
    "gap_islands": _GAP_ISLANDS_SQL,
    "window_distinct_count": _WINDOW_DISTINCT_COUNT_SQL,
    "window_lag_lead": _WINDOW_LAG_LEAD_SQL,
    "window_rank_family": _WINDOW_RANK_FAMILY_SQL,
    "window_range_frame": _WINDOW_RANGE_FRAME_SQL,
    "window_first_last": _WINDOW_FIRST_LAST_SQL,
    "window_cumsum": _WINDOW_CUMSUM_SQL,
}
