"""Semi-structured VARIANT queries (Spark 4 ``parse_json`` /
``variant_get`` / ``try_variant_get``).

The reference JSON-decodes every Kafka message row-at-a-time in Python
(reference kafka-consumer/consumer.py:129). q_json_extract
(queries/relational.py) already moves that JVM-side via
get_json_object; this module upgrades the pattern to Spark's VARIANT
type: parse ONCE into a binary semi-structured value, then do typed
path extraction — repeated ``get_json_object`` re-parses the string
per call, ``variant_get`` on a parsed variant does not.

Scale: parse_json is a per-row JVM expression inside whole-stage
codegen — no shuffle, no Python. The aggregate shuffles only the
grouped (event_type, partials) — map-side combine applies as usual.
The DuckDB oracle extracts the same paths with its JSON functions
(DuckDB has no VARIANT; values, not representation, are compared).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table

_VARIANT_AGG_SQL_SPARK = """
WITH parsed AS (
  SELECT event_id, event_type, parse_json(props) AS v
  FROM events
  WHERE props IS NOT NULL
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(variant_get(v, '$.k', 'bigint')) AS BIGINT) AS sum_k,
       CAST(MAX(variant_get(v, '$.k', 'int')) AS INT) AS max_k,
       CAST(SUM(CASE WHEN try_variant_get(v, '$.missing', 'int') IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
FROM parsed
GROUP BY event_type
ORDER BY event_type
"""

_VARIANT_AGG_SQL_DUCKDB = """
WITH parsed AS (
  SELECT event_id, event_type, props
  FROM events
  WHERE props IS NOT NULL
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k,
       CAST(SUM(CASE WHEN json_extract_string(props, '$.missing') IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
FROM parsed
GROUP BY event_type
ORDER BY event_type
"""


def q_variant_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed VARIANT path extraction + per-type aggregate; the oracle
    runs the json_extract_string equivalent."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_VARIANT_AGG_SQL_SPARK)


QUERIES = {"variant_agg": q_variant_agg}
ORACLE = {"variant_agg": _VARIANT_AGG_SQL_DUCKDB}
