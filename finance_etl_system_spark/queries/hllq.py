"""Mergeable HLL sketch rollup (Datasketches ``hll_sketch_agg`` /
``hll_union_agg``, Spark 3.5+) — the pre-aggregation pattern behind
every 100 TB distinct-count dashboard.

``approx_count_distinct`` (q: approx_distinct) answers ONE query; a
persisted SKETCH answers a family of them: build one HLL per
(day, event_type) partition, then any coarser distinct-count —
per type, per week, global — is a UNION of the partial sketches, no
rescan of the raw events. Sketch bytes survive parquet round-trips
(BinaryType), so the partial layer is a real incremental rollup
table: a new day appends its sketches and every rollup absorbs it by
re-union (tests/test_extensibility.py proves the round-trip and the
union-vs-rebuild equivalence).

Scale: phase 1 shuffles (day, type) partials — map-side combined,
keys uniform; phase 2 shuffles |days|×|types| sketch blobs (~KB
each), independent of event count. The reference's closest surface is
exact Mongo $group counts (reference spark-job/etl_job.py) — no
sketches at all; this is the beyond-reference scale tier.

Driver entry is rows-only (sketch estimates are engine-specific —
DuckDB's HLL differs); accuracy is pinned against the exact
distinct count in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

_LG_K = 12  # 2^12 registers ≈ 1.6% relative standard error


def daily_user_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phase 1: one HLL sketch of user_id per (event_date, event_type).

    This is the materializable rollup layer — BinaryType sketch bytes,
    safe to write/read as parquet and union later."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.withColumn("event_date", F.col("ts").cast("date"))
        .groupBy("event_date", "event_type")
        .agg(F.hll_sketch_agg("user_id", F.lit(_LG_K)).alias("sketch"))
    )


def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type distinct users from MERGED daily sketches, next to the
    exact count — the union never rescans raw events."""
    partials = daily_user_sketches(spark, sf_dir)
    merged = partials.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_users"),
        F.count(F.lit(1)).alias("n_days"),
    )
    e = load_table(spark, sf_dir, "events")
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        merged.join(exact, "event_type")
        .select("event_type", "n_days", "est_users", "exact_users")
        .orderBy("event_type")
    )


QUERIES = {"hll_rollup": q_hll_rollup}
ORACLE: dict[str, str] = {}
