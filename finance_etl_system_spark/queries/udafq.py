"""Pandas-UDAF query: exact volume-weighted median price per event
type through functions/udafs.py::weighted_median_ticks.

The DuckDB oracle derives the same lower weighted median relationally:
collapse duplicate ticks, running-total the weights in tick order,
keep the first tick whose doubled cumulative weight reaches the
group total — integer comparisons end to end, so both paths are
exact and the driver hash-matches.

Scale: the UDAF path shuffles each group's (ticks, w) rows to one
reducer (no partial agg for pandas UDAFs — documented trade-off in
functions/udafs.py); the relational twin IS the scale path (two
map-side-combinable aggregates + one window). Both are provided on
purpose: the UDAF proves the extension surface, the SQL shows the
100 TB rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.udafs import weighted_median_ticks


def _series(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.filter(F.col("value").isNotNull() & ~F.isnan("value")).select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("ticks"),
        ((F.col("event_id") % 97) + 1).cast("long").alias("w"),
    )


def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted median price per event type via the pandas
    UDAF; oracle recomputes it with a cumulative-weight window."""
    s = _series(spark, sf_dir)
    # Spark forbids mixing pandas and builtin aggregates in one agg
    # (INVALID_PANDAS_UDF_PLACEMENT): aggregate twice over the same
    # shuffle key and join the |event_type|-sized results (broadcast).
    wmed = s.groupBy("event_type").agg(
        weighted_median_ticks("ticks", "w").alias("wmed_ticks")
    )
    stats = s.groupBy("event_type").agg(
        F.sum("w").alias("total_w"), F.count(F.lit(1)).alias("n")
    )
    return wmed.join(F.broadcast(stats), "event_type").orderBy("event_type")


_WEIGHTED_MEDIAN_SQL = """
WITH s AS (
  SELECT event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS ticks,
         CAST((event_id % 97) + 1 AS BIGINT) AS w
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)
),
per_tick AS (
  SELECT event_type, ticks, CAST(SUM(w) AS BIGINT) AS tw,
         CAST(COUNT(*) AS BIGINT) AS tn
  FROM s GROUP BY event_type, ticks
),
cum AS (
  SELECT event_type, ticks, tn,
         CAST(SUM(tw) OVER (PARTITION BY event_type ORDER BY ticks
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
         CAST(SUM(tw) OVER (PARTITION BY event_type) AS BIGINT) AS total_w
  FROM per_tick
)
SELECT event_type,
       CAST(MIN(CASE WHEN cw * 2 >= total_w THEN ticks END) AS BIGINT)
         AS wmed_ticks,
       MIN(total_w) AS total_w,
       CAST(SUM(tn) AS BIGINT) AS n
FROM cum
GROUP BY event_type
ORDER BY event_type
"""

QUERIES = {"weighted_median": q_weighted_median}
ORACLE = {"weighted_median": _WEIGHTED_MEDIAN_SQL}
