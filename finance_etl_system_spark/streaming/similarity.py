"""Streaming ANN index maintenance: continuous embedding ingestion
into a persistent IVF index (operators/similarity.py) — the live end
of build-once/query-many. A model service emits (id, embedding)
records; each micro-batch routes to the index's FROZEN centroids and
lands as its own (batch_id, cluster) partition set.

Effectively-once without any dedup state: the batch body writes with
dynamic partition overwrite keyed by the checkpointed micro-batch id,
so a replayed batch rewrites exactly its own partitions (routing is
deterministic under frozen centroids — a retry touches the same
(batch, cluster) set). This is the same idempotency contract as the
drift monitor's counts log (streaming/drift.py) applied to an index.

Probe-side: ``cosine_topk_ivf_index`` needs no changes — cluster
stays a partition column at the second directory level, so the
literal ``cluster IN (...)`` pruning keeps skipping unprobed
clusters across every batch. Retrain cadence is driven by
``ivf_index_stats`` exactly as for batch appends.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def ivf_append_batch(batch_df: DataFrame, batch_id: int, *, path: str) -> None:
    """foreachBatch body: one micro-batch into the index. Empty
    batches write nothing (no empty partition dirs)."""
    from ..operators.similarity import append_to_ivf_index

    if batch_df.isEmpty():
        return
    # stream batch ids start at 0, which is the BUILD's batch
    # partition — shift by one so a replay never overwrites the base
    append_to_ivf_index(batch_df, path, batch_id=int(batch_id) + 1)


def stream_append_ivf(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    *,
    index_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Wire a file-source embedding stream (availableNow — the test
    harness path; swap for Kafka in production, the batch body is
    source-agnostic) into the IVF index. Returns the started query.
    ``max_files_per_trigger`` bounds micro-batch size (availableNow
    honors it and drains in several batches)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    src = reader.json(source_dir)
    return (
        src.writeStream.foreachBatch(
            lambda df, bid: ivf_append_batch(df, bid, path=index_path)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
