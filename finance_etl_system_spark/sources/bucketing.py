"""Bucketed-table layout: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of orders ⋈ lineitem is shuffling both
sides on the join key for every query. Bucketing pays that shuffle
ONCE at write time: both tables are hash-partitioned into the same
number of buckets on the key, and every subsequent join/groupBy on
that key reads co-located buckets — the physical plan has NO shuffle
exchange on either side (asserted in tests/test_plans.py).

This is Spark's storage-level answer to the reference's per-symbol
Mongo collections + B-tree indexes (reference mongo-setup/
mongo_init.py:83-89): layout chosen once so hot access paths skip
repartitioning. ``sortBy`` within buckets additionally gives parquet
min/max pruning on the sort key, the moral equivalent of the
reference's ``{ticker:1, date:1}`` compound index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    keys: list[str],
    buckets: int,
    sort_by: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed parquet table in the session
    catalog. ``buckets`` must match across tables meant to co-join;
    pick it for the TARGET scale (buckets ≈ total_data / 128 MB), not
    the current one — bucket count is baked into the layout."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(buckets, *keys)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back; Catalyst consumes the bucket spec as
    the output partitioning, so joins/aggs on the bucket key plan
    without an Exchange (requires spark.sql.sources.bucketing.enabled,
    on by default)."""
    return spark.table(table)
