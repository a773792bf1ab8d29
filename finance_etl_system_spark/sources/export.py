"""Training-shard export: the delivery end of the corpus pipeline
(pipeline/corpus.py builds the corpus; THIS ships it to the trainer).

Trainers consume fixed-count JSONL shards with a manifest — not a
parquet directory with arbitrary file splits — so the export
controls sharding explicitly:

- shard id = pmod(xxhash64(id), n_shards): content-addressed and
  deterministic, so a re-export after an idempotent pipeline replay
  produces byte-identical shard MEMBERSHIP (file bytes also match
  when the writer sorts within shards, below);
- one output file per shard: repartition BY the shard column into
  n_shards partitions keyed on shard, sortWithinPartitions(shard, id)
  → each task writes exactly one shard's rows in deterministic order,
  `partitionBy("shard")` lays them out as shard=N/ dirs;
- a manifest parquet (shard, n_docs, n_chars) written alongside —
  the trainer's integrity check (row counts per shard) without
  re-reading the shards.

Scale: the shard shuffle is ONE hash exchange of the final corpus
(unavoidable — shard membership is a global property); n_shards
bounds the writer parallelism, so pick n_shards ≥ cluster cores for
the write to stay wide. No driver-side anything: the manifest is a
|shards|-row aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    *,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Export (id, text) as ``{path}/shards/shard=N/`` JSONL plus
    ``{path}/manifest`` parquet; returns the manifest frame."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    sharded = df.select(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
        F.col(id_col).alias("id"),
        F.col(text_col).alias("text"),
    )
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "id")
        .write.mode("overwrite")
        .partitionBy("shard")
        .json(f"{path}/shards")
    )
    manifest = (
        sharded.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("n_chars"),
        )
        .orderBy("shard")
    )
    manifest.write.mode("overwrite").parquet(f"{path}/manifest")
    return manifest


def read_jsonl_shards(spark: SparkSession, path: str) -> DataFrame:
    """Read an exported shard set back (shard partition column is
    restored from the directory layout)."""
    return spark.read.schema("id bigint, text string, shard int").json(
        f"{path}/shards"
    )


def validate_shard_export(spark: SparkSession, path: str) -> DataFrame:
    """Integrity check the trainer runs before a job: re-count the
    shards and anti-compare against the manifest. Returns the
    per-shard verdict frame (empty mismatch columns = clean)."""
    actual = (
        read_jsonl_shards(spark, path)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("actual_docs"),
            F.sum(F.length("text")).alias("actual_chars"),
        )
    )
    manifest = spark.read.parquet(f"{path}/manifest")
    return (
        manifest.join(actual, "shard", "full")
        .select(
            "shard",
            "n_docs",
            "actual_docs",
            "n_chars",
            "actual_chars",
            (
                F.coalesce(F.col("n_docs"), F.lit(-1))
                == F.coalesce(F.col("actual_docs"), F.lit(-2))
            ).alias("docs_match"),
            (
                F.coalesce(F.col("n_chars"), F.lit(-1))
                == F.coalesce(F.col("actual_chars"), F.lit(-2))
            ).alias("chars_match"),
        )
        .orderBy("shard")
    )
