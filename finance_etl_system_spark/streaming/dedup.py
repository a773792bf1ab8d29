"""Streaming incremental near-dup dedup: the daily-increment MinHash
operator (operators/dedup.py minhash_dedup_incremental) wired into a
``foreachBatch`` pipeline with the signature table as checkpointed
state — X1 composed with the T2/T3/T7 streaming discipline.

Per micro-batch of documents:

1. the persisted signature STATE (all surviving docs so far) is read
   and eagerly localCheckpoint-ed — the state stand-in for a snapshot
   read (at production scale the state table lives in a format with
   snapshot isolation, e.g. Delta/Iceberg; the checkpoint cuts the
   file lineage so step 4 never reads the directory it writes);
2. the batch is signatured ONCE and checked against state + itself
   (cost O(|batch| + band collisions), independent of corpus size);
3. verdicts land in ``verdict_dir`` partitioned by batch_id with
   dynamic-partition overwrite — a retried batch rewrites its own
   partition, so the sink is effectively-once (same contract as
   streaming/quality.py);
4. ONLY the surviving new signatures append to the state as the
   batch's own partition (same idempotent overwrite) — history rows
   are never rewritten, so per-batch write volume is batch-sized.

Retry convergence: a crashed-then-retried batch re-reads state that
may already contain its own survivors. That is safe by construction —
a replayed id meeting itself in history is discarded (the operator's
id-collision guard), and a dup meeting its canonical via the history
path yields the same (id, dup_of) verdict the intra-batch path gave —
pinned by tests/test_streaming.py replay tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import minhash_dedup_incremental
from ..functions.errors import error_condition
from ..functions.confs import partition_overwrite

_SIG_SCHEMA = "id bigint, sig array<bigint>"


def _load_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Missing state dir = first batch → empty table. ONLY the
    path-not-found case is absorbed: any other read failure (corrupt
    footer, transient FS error) must raise — silently deduping against
    an empty history would admit the whole corpus as survivors and
    permanently corrupt the state table. read_live_state makes this
    atomic against a concurrent compact_sig_state (generation-marker
    protocol, functions/generations.py)."""
    from pyspark.errors import AnalysisException

    from .compaction import read_live_state

    try:
        return read_live_state(spark, state_dir).select("id", "sig")
    except AnalysisException as e:
        # detect first-batch by ERROR CLASS, not message substring
        # (messages vary across Spark versions/locales); fall back to
        # an existence probe through the Hadoop FS API so a changed
        # class name can never crash every first run
        cls = error_condition(e)
        if cls == "PATH_NOT_FOUND" or not _path_exists(spark, state_dir):
            return spark.createDataFrame([], _SIG_SCHEMA)
        raise


def _path_exists(spark: SparkSession, path: str) -> bool:
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf).exists(p)


def dedup_increment_batch(
    batch_df: DataFrame,
    batch_id: int,
    verdict_dir: str,
    state_dir: str,
    **minhash_kwargs,
) -> None:
    """One micro-batch through the incremental dedup (see module
    docstring). Idempotent under same-batch_id retry."""
    spark = batch_df.sparkSession
    if batch_df.isEmpty():
        return
    history = _load_state(spark, state_dir).localCheckpoint(eager=True)
    verdicts, _updated, survivors = minhash_dedup_incremental(
        batch_df, history, with_new_survivors=True, **minhash_kwargs
    )
    with partition_overwrite(spark, "dynamic"):
        (
            verdicts.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(verdict_dir)
        )
        survivors = survivors.localCheckpoint(eager=True)
        if survivors.isEmpty():
            # an all-duplicate batch must not write an empty
            # partitioned dir (only _SUCCESS): the next batch's
            # _load_state would die on UNABLE_TO_INFER_SCHEMA instead
            # of reading prior state
            return
        (
            survivors.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(state_dir)
        )


def stream_dedup_incremental(
    spark: SparkSession,
    source_dir: str,
    verdict_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    *,
    max_files_per_trigger: int | None = 1,
    **minhash_kwargs,
):
    """Checkpointed streaming composition: JSON document batches →
    incremental MinHash dedup with persisted signature state. Returns
    the started (availableNow) query.

    ``max_files_per_trigger`` pins the file→batch mapping so reruns
    over the same source replay identical batches (the replay test's
    convergence contract); pass None to let one batch swallow all
    available files — verdict CONTENT still converges, only the
    batch_id partitioning differs.
    """
    reader = spark.readStream.schema("doc_id LONG, text STRING")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.json(source_dir)

    def fb(batch_df: DataFrame, batch_id: int) -> None:
        dedup_increment_batch(
            batch_df, batch_id, verdict_dir, state_dir, **minhash_kwargs
        )

    return (
        docs.writeStream.foreachBatch(fb)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
