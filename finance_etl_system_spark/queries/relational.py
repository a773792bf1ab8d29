"""Relational core: scans, filters, projections, scalar functions.

Covers SURVEY §2.1 (parquet scan w/ pushdown — the Spark-first
re-expression of the reference's hand-built Mongo ``$match`` pushdown,
reference spark-job/etl_job.py:180-184) and §2.2 (P1-P20: rlike /
regexp_extract / to_date / when-otherwise / casts / concat_ws /
date_format / isnan / json decode / case normalization).

Scale notes: every query here is a single scan with Catalyst predicate
pushdown + column pruning — no shuffle except the final aggregation or
sort, which AQE sizes at runtime. At 100 TB these scans prune row
groups on the pushed predicates; nothing materializes on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.columns import money_sum, tick_avg


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H-Q1-style pricing summary over lineitem.

    filter -> groupBy -> multi-agg -> sort. Exercises scan+pushdown,
    partial aggregation (map-side combine), and a tiny final sort.

    Money/ratio outputs accumulate EXACT integer ticks (see
    functions/columns.tick_sum — round-7 policy): base price at cent
    scale, the 2dp×2dp revenue product at 1e4, the triple-product
    charge at 1e6, discount at cents — one bigint sum each, one
    double conversion at the end, so every emitted float is
    partition-order- and engine-independent. Quantity is integral:
    its double sum is exact in any order and stays native.
    """
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            money_sum("l_extendedprice").alias("sum_base_price"),
            money_sum(disc_price, 10_000).alias("sum_disc_price"),
            money_sum(charge, 1_000_000).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            tick_avg("l_extendedprice").alias("avg_price"),
            tick_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_PRICING_SUMMARY_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(SUM(l_quantity), 2) AS sum_qty,
  ROUND(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) / 100.0, 2)
    AS sum_base_price,
  ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0)
                 AS BIGINT)) / 10000.0, 2) AS sum_disc_price,
  ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                       * 1000000, 0) AS BIGINT)) / 1000000.0, 2)
    AS sum_charge,
  ROUND(AVG(l_quantity), 6) AS avg_qty,
  ROUND(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
        / (100.0 * COUNT(l_extendedprice)), 6) AS avg_price,
  ROUND(SUM(CAST(ROUND(l_discount * 100, 0) AS BIGINT))
        / (100.0 * COUNT(l_discount)), 6) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_filter_cast_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Defensive clean-and-prepare re-expression (P2-P5, P7, P11-P12).

    The reference's clean step casts numerics to double, filters nulls,
    and derives columns (reference etl_job.py:240-257). Same shape over
    ``orders``: predicate pushdown carries both filters to the scan.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_totalprice") > 1000.0) & F.col("o_orderstatus").isNotNull()
        )
        .filter(F.col("o_orderpriority") != "3-MEDIUM")
        .select(
            F.col("o_orderkey").alias("order_key"),
            F.col("o_custkey").cast("long").alias("cust_key"),
            F.col("o_orderstatus").alias("status"),
            F.round(F.col("o_totalprice").cast("double"), 2).alias("total_price"),
            F.when(F.col("o_totalprice") >= 200000.0, F.lit("large"))
            .otherwise(F.lit("small"))
            .alias("size_class"),
        )
    )


_FILTER_CAST_PROJECT_SQL = """
SELECT
  o_orderkey AS order_key,
  CAST(o_custkey AS BIGINT) AS cust_key,
  o_orderstatus AS status,
  ROUND(CAST(o_totalprice AS DOUBLE), 2) AS total_price,
  CASE WHEN o_totalprice >= 200000.0 THEN 'large' ELSE 'small' END AS size_class
FROM orders
WHERE o_totalprice > 1000.0
  AND o_orderstatus IS NOT NULL
  AND o_orderpriority <> '3-MEDIUM'
"""


def q_regex_date_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex guard + extract + date functions (P1, P2, P9, P15).

    Re-expresses the reference's messy-date salvage: rlike guard,
    regexp_extract of the date, to_date parse, composite string key
    (reference etl_job.py:224-231, 386-388). Star-schema twin over
    ``orders``: derive a yyyy-MM-dd string, regex-extract parts, build
    the ``<key>_<date>`` composite id the ES sink used.
    """
    o = load_table(spark, sf_dir, "orders")
    date_str = F.date_format("o_orderdate", "yyyy-MM-dd")
    return (
        o.filter(date_str.rlike(r"^\d{4}-\d{2}-\d{2}$"))
        .select(
            "o_orderkey",
            date_str.alias("order_date_str"),
            F.regexp_extract(date_str, r"^(\d{4})-", 1).cast("int").alias("order_year"),
            F.to_date(date_str, "yyyy-MM-dd").cast("string").alias("order_date"),
            F.concat_ws(
                "_", F.col("o_orderstatus"), date_str
            ).alias("status_date_key"),
            F.lower("o_orderpriority").alias("priority_lower"),
            F.upper("o_orderstatus").alias("status_upper"),
        )
        .filter(F.col("order_year") >= 1996)
    )


_REGEX_DATE_PARSE_SQL = """
WITH src AS (
  SELECT *, strftime(o_orderdate, '%Y-%m-%d') AS order_date_str
  FROM orders
)
SELECT
  o_orderkey,
  order_date_str,
  CAST(regexp_extract(order_date_str, '^(\\d{4})-', 1) AS INT) AS order_year,
  CAST(CAST(order_date_str AS DATE) AS VARCHAR) AS order_date,
  o_orderstatus || '_' || order_date_str AS status_date_key,
  lower(o_orderpriority) AS priority_lower,
  upper(o_orderstatus) AS status_upper
FROM src
WHERE regexp_matches(order_date_str, '^\\d{4}-\\d{2}-\\d{2}$')
  AND CAST(regexp_extract(order_date_str, '^(\\d{4})-', 1) AS INT) >= 1996
"""


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON decode at the stream edge (P20).

    The reference JSON-decodes every Kafka message in Python
    (reference kafka-consumer/consumer.py:129). Spark-first: keep JSON
    as a string column and extract fields JVM-side with
    ``get_json_object`` — no Python in the hot path.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            "event_id",
            "event_type",
            F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
        )
        .filter(F.col("prop_k") > 50)
    )


_JSON_EXTRACT_SQL = """
SELECT
  event_id,
  event_type,
  CAST(json_extract_string(props, '$.k') AS INT) AS prop_k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS INT) > 50
"""


def q_null_nan_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NaN/null normalization + conditional math (P3, P10, P19).

    Re-expresses the reference's NaN scrub before the ES sink
    (reference etl_job.py:439-450) and the Mongo view's accuracy
    expression ``100*(1-abs(pred-actual)/actual)``
    (reference mongo-setup/mongo_init.py:118-136) over events values.
    """
    e = load_table(spark, sf_dir, "events")
    clean_value = F.when(F.isnan(F.col("value")), F.lit(None)).otherwise(
        F.col("value")
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(clean_value, 2).alias("clean_value"),
        F.when(
            clean_value.isNotNull() & (clean_value != 0),
            F.round(100 * (1 - F.abs(clean_value - 50.0) / 50.0), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("proximity_pct"),
    )


_NULL_NAN_HANDLING_SQL = """
SELECT
  event_id,
  user_id,
  ROUND(CASE WHEN isnan(value) THEN NULL ELSE value END, 2) AS clean_value,
  CASE
    WHEN (CASE WHEN isnan(value) THEN NULL ELSE value END) IS NOT NULL
         AND (CASE WHEN isnan(value) THEN NULL ELSE value END) <> 0
    THEN ROUND(100 * (1 - abs((CASE WHEN isnan(value) THEN NULL ELSE value END) - 50.0) / 50.0), 6)
    ELSE 0.0
  END AS proximity_pct
FROM events
"""


def q_deterministic_row_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic surrogate key (replaces the reference's uuid(), P8).

    The reference stamps rows with nondeterministic ``expr("uuid()")``
    (reference etl_job.py:257) — banned in oracle-checked paths
    (SURVEY §7). The engine's key is ``sha2(concat_ws(...), 256)``:
    deterministic, collision-safe, replay-stable.
    """
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.sha2(
            F.concat_ws(
                "§",
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
            ),
            256,
        ).alias("row_key"),
    )


_DETERMINISTIC_ROW_KEY_SQL = """
SELECT
  l_orderkey,
  l_linenumber,
  sha256(CAST(l_orderkey AS VARCHAR) || chr(167) || CAST(l_linenumber AS VARCHAR)) AS row_key
FROM lineitem
WHERE l_orderkey % 100 = 0
"""


def q_nested_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/struct surface (SURVEY §1.3 nested types): per-user sorted
    value array + array ops (size, first/last element, JVM-side fold).

    collect_list is non-deterministic in order → wrapped in an explicit
    sort by (ts, event_id) BEFORE collecting via struct sort, the
    canonical deterministic-collect idiom.
    """
    e = load_table(spark, sf_dir, "events")
    collected = (
        e.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("ts").alias("ts"),
                        F.col("event_id").alias("event_id"),
                        F.round("value", 2).alias("v"),
                    )
                )
            ).alias("recs")
        )
    )
    vals = F.transform("recs", lambda r: r["v"])
    return collected.select(
        "user_id",
        F.size("recs").alias("n_events"),
        F.element_at(vals, 1).alias("first_value"),
        F.element_at(vals, -1).alias("last_value"),
        F.round(
            F.aggregate(vals, F.lit(0.0), lambda acc, v: acc + v), 2
        ).alias("value_total"),
        F.round(F.array_max(vals), 2).alias("value_max"),
    )


_NESTED_TYPES_SQL = """
WITH collected AS (
  SELECT user_id,
         list(ROUND(value, 2) ORDER BY ts, event_id) AS vals
  FROM events
  GROUP BY user_id
)
SELECT
  user_id,
  len(vals) AS n_events,
  vals[1] AS first_value,
  vals[-1] AS last_value,
  ROUND(list_sum(vals), 2) AS value_total,
  ROUND(list_max(vals), 2) AS value_max
FROM collected
"""


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event counts/value by event_type per day — Spark's
    ``pivot`` (oracle: conditional aggregation, the portable form)."""
    e = load_table(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyy-MM-dd")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        e.withColumn("day", day)
        .groupBy("day")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .select("day", *types)
    )


_PIVOT_SQL = """
SELECT
  strftime(ts, '%Y-%m-%d') AS day,
  COUNT(*) FILTER (event_type = 'click') AS click,
  COUNT(*) FILTER (event_type = 'error') AS error,
  COUNT(*) FILTER (event_type = 'purchase') AS purchase,
  COUNT(*) FILTER (event_type = 'signup') AS signup,
  COUNT(*) FILTER (event_type = 'view') AS view
FROM events
GROUP BY 1
"""


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) the lineitem price components into long form —
    the inverse of `pivot`. Spark's `unpivot` plans as one Expand (a
    map-side row multiplication, no shuffle before the filter)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= "2001-07-01"
    )
    return (
        l.select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax")
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_extendedprice", "l_discount", "l_tax"],
            "measure",
            "value",
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "measure",
            F.round("value", 2).alias("value"),
        )
    )


_UNPIVOT_SQL = """
SELECT l_orderkey, l_linenumber, measure, ROUND(value, 2) AS value
FROM (
  SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount, l_tax
  FROM lineitem WHERE l_shipdate >= TIMESTAMP '2001-07-01'
) UNPIVOT (value FOR measure IN (l_extendedprice, l_discount, l_tax))
"""


def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column: size,
    max element, L2 norm via transform+aggregate, positive-element
    count via filter. Elements are cast to double BEFORE arithmetic on
    both engines so the sequential fold is bit-identical (see
    queries/similarity.py for the same policy)."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    v = F.transform("embedding", lambda x: x.cast("double"))
    sq_sum = F.aggregate(
        v, F.lit(0.0), lambda acc, x: acc + x * x
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.array_max(v), 6).alias("max_val"),
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_pos"),
    )


_ARRAY_FUNCTIONS_SQL = """
SELECT vec_id,
       len(embedding) AS dim,
       ROUND(list_max(CAST(embedding AS DOUBLE[])), 6) AS max_val,
       ROUND(sqrt(list_aggregate(
           list_transform(CAST(embedding AS DOUBLE[]), x -> x * x), 'sum')), 6) AS l2_norm,
       len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)) AS n_pos
FROM embeddings
WHERE vec_id < 200
"""


def q_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-typed columns (§1.3): per order status, build a
    priority→count map (map_from_entries over sorted entries), then
    project SCALARS out of it — cardinality, a point lookup
    (element_at), and the ordered key list. The map itself never
    leaves the plan: cross-engine comparison is on values, and the
    DuckDB oracle derives the same scalars relationally (DuckDB's MAP
    representation differs; its semantics don't).

    Scale: two map-side-combinable aggregates; the map lives on
    |status| rows only."""
    o = load_table(spark, sf_dir, "orders")
    g = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    m = g.groupBy("o_orderstatus").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("o_orderpriority", "cnt")))
        ).alias("m")
    )
    return m.select(
        "o_orderstatus",
        F.size("m").alias("n_priorities"),
        F.coalesce(F.element_at("m", "2-HIGH"), F.lit(0)).cast("long").alias(
            "n_high"
        ),
        F.array_join(F.map_keys("m"), ",").alias("priority_keys"),
    ).orderBy("o_orderstatus")


_MAP_FUNCTIONS_SQL = """
WITH g AS (
  SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders GROUP BY 1, 2
)
SELECT o_orderstatus,
       CAST(COUNT(*) AS INT) AS n_priorities,
       CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN cnt END), 0)
            AS BIGINT) AS n_high,
       string_agg(o_orderpriority, ',' ORDER BY o_orderpriority) AS priority_keys
FROM g
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


QUERIES = {
    "nested_types": q_nested_types,
    "pivot": q_pivot,
    "unpivot": q_unpivot,
    "array_functions": q_array_functions,
    "pricing_summary": q_pricing_summary,
    "filter_cast_project": q_filter_cast_project,
    "regex_date_parse": q_regex_date_parse,
    "json_extract": q_json_extract,
    "null_nan_handling": q_null_nan_handling,
    "deterministic_row_key": q_deterministic_row_key,
    "map_functions": q_map_functions,
}

ORACLE = {
    "nested_types": _NESTED_TYPES_SQL,
    "pivot": _PIVOT_SQL,
    "unpivot": _UNPIVOT_SQL,
    "array_functions": _ARRAY_FUNCTIONS_SQL,
    "pricing_summary": _PRICING_SUMMARY_SQL,
    "filter_cast_project": _FILTER_CAST_PROJECT_SQL,
    "regex_date_parse": _REGEX_DATE_PARSE_SQL,
    "json_extract": _JSON_EXTRACT_SQL,
    "null_nan_handling": _NULL_NAN_HANDLING_SQL,
    "deterministic_row_key": _DETERMINISTIC_ROW_KEY_SQL,
    "map_functions": _MAP_FUNCTIONS_SQL,
}
