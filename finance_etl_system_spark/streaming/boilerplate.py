"""Streaming repeated-substring (boilerplate) detection: the
operators/substring.py kernel wired into a ``foreachBatch`` pipeline
with cumulative gram counts as checkpointed state — X1 composed with
the T2/T3 streaming discipline, the sub-document sibling of
streaming/dedup.py.

State = a batch_id-partitioned gram-count LOG (``_h1, _h2, n``):
each micro-batch appends its OWN count partition (16-byte hash128
keys, never gram text), and the cumulative count is a
merge-by-addition view over the log — the streaming/drift.py counts-
log pattern, so no state row is ever rewritten and per-batch write
volume is batch-sized.

Per micro-batch of documents:

1. shingle the batch once (``gram_keys``, hash128) and checkpoint the
   batch-sized position frame;
2. read the count log EXCLUDING this batch_id's partition (a retried
   batch must not meet its own half-written counts — the partition
   filter makes retry deterministic), merge-by-addition, add the
   in-memory batch counts;
3. flag this batch's positions whose cumulative count reaches
   ``min_count``, merge to maximal spans, and write verdicts
   partitioned by batch_id with dynamic-partition overwrite
   (effectively-once, same contract as streaming/quality.py);
4. append the batch's count partition (same idempotent overwrite).

Arrival-order semantics (documented, tested): a gram first seen in
batch 1 and again in batch 3 goes hot AT batch 3 — batch 3's
occurrence is flagged; batch 1's verdict is NOT retroactively
rewritten (verdicts are as-of-arrival, exactly like incremental
dedup's first-doc-survives). A full-rebuild batch pass over the same
corpus flags the union of all occurrences; the cumulative COUNTS are
identical either way (merge-by-addition ≡ direct count, tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.confs import partition_overwrite
from ..functions.errors import error_condition
from ..operators.substring import gram_keys, spans_from_flagged

_COUNT_SCHEMA = "_h1 bigint, _h2 bigint, n bigint, batch_id bigint"


def _load_counts(spark: SparkSession, counts_dir: str) -> DataFrame:
    """Count log; missing dir = first batch -> empty. Only the
    path-not-found case is absorbed (same rationale as
    streaming/dedup.py::_load_state). read_live_state makes this
    atomic against a concurrent compact_count_log — essential here:
    the counts are ADDITIVE, so a non-atomic read overlapping a fold
    would double-count grams."""
    from pyspark.errors import AnalysisException

    from .compaction import read_live_state

    try:
        return read_live_state(spark, counts_dir).select(
            "_h1", "_h2", "n", "batch_id"
        )
    except AnalysisException as e:
        cls = error_condition(e)
        if cls == "PATH_NOT_FOUND" or not _path_exists(spark, counts_dir):
            return spark.createDataFrame([], _COUNT_SCHEMA)
        raise


def _path_exists(spark: SparkSession, path: str) -> bool:
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf).exists(p)


def boilerplate_increment_batch(
    batch_df: DataFrame,
    batch_id: int,
    verdict_dir: str,
    counts_dir: str,
    *,
    k: int = 8,
    min_count: int = 2,
) -> None:
    """One micro-batch through the streaming boilerplate detector
    (see module docstring). Idempotent under same-batch_id retry."""
    spark = batch_df.sparkSession
    if batch_df.isEmpty():
        return
    grams, key_cols = gram_keys(batch_df, k=k, key="hash128")
    grams = grams.localCheckpoint(eager=True)  # batch-sized, used twice
    if grams.isEmpty():
        return  # every doc shorter than k tokens: nothing to count
    batch_counts = grams.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n")
    )
    history = (
        _load_counts(spark, counts_dir)
        # retry guard: never meet this batch's own prior write
        .filter(F.col("batch_id") != batch_id)
        .select(*key_cols, "n")
    )
    cumulative = (
        history.unionByName(batch_counts)
        .groupBy(*key_cols)
        .agg(F.sum("n").alias("n"))
    )
    hot = cumulative.filter(F.col("n") >= min_count).select(*key_cols)
    spans = spans_from_flagged(
        grams.join(hot, key_cols).select("doc_id", "i"), k=k
    )
    with partition_overwrite(spark, "dynamic"):
        spans = spans.localCheckpoint(eager=True)
        if not spans.isEmpty():
            (
                spans.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .partitionBy("batch_id")
                .parquet(verdict_dir)
            )
        (
            batch_counts.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(counts_dir)
        )


def stream_boilerplate(
    spark: SparkSession,
    source_dir: str,
    verdict_dir: str,
    counts_dir: str,
    checkpoint_dir: str,
    *,
    k: int = 8,
    min_count: int = 2,
    max_files_per_trigger: int | None = 1,
):
    """Checkpointed streaming composition: JSON document batches →
    per-batch boilerplate spans against the cumulative gram-count log.
    Returns the started (availableNow) query."""
    reader = spark.readStream.schema("doc_id LONG, text STRING")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.json(source_dir)

    def fb(batch_df: DataFrame, batch_id: int) -> None:
        boilerplate_increment_batch(
            batch_df,
            batch_id,
            verdict_dir,
            counts_dir,
            k=k,
            min_count=min_count,
        )

    return (
        docs.writeStream.foreachBatch(fb)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
