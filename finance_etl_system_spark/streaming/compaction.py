"""State-partition compaction for the batch_id-partitioned streaming
states (chunk-hash index, MinHash signature table, boilerplate
gram-count log).

Every stateful stream in this package appends its per-batch state as
its OWN ``batch_id=k`` partition (retries rewrite only their own
partition — the effectively-once contract), so the state directory
gains one partition per micro-batch and the per-batch state probe's
file fan-out grows with stream lifetime. Compaction folds retired
partitions into one consolidated ``batch_id=-1`` partition — a pure
file-count optimization: no reader cares WHICH partition a state row
lives in, only what the rows say.

Shared contract (SCALE.md "Streaming chunk gate"):

- **keep_last**: structured streaming commits batch k before
  starting k+1, so only the NEWEST batch can ever replay; a replayed
  batch must not meet its own first attempt where the operator's
  retry guard is partition-based (chunk gate and boilerplate read
  state MINUS their own batch_id). ``keep_last=1`` keeps exactly the
  still-retry-eligible partitions out of the fold.
- **crash safety — staged swap with an intent marker.** A naive
  "write consolidated, then delete folded" is only safe for
  DISTINCT-fold states (a crash leaves duplicate rows, harmless to
  join-probe readers) but corrupts ADDITIVE state: re-folding a
  directory that holds both the consolidated sums and the original
  partitions would double-count. So the fold is staged under
  ``_compact_tmp`` (underscore-prefixed → invisible to Spark's file
  discovery), a ``_COMPACTING`` marker records the fold set once the
  stage is COMPLETE, and only then is the old consolidated partition
  swapped out and the folded partitions deleted. Recovery on the
  next call replays forward from whatever step the crash interrupted
  (marker present ⇒ stage is complete and trustworthy; no marker ⇒
  any stage remnant is garbage to discard). Every fold function is
  therefore exactly-once in effect, additive sums included.
- compaction is a MAINTENANCE operation: run it between batches /
  with the stream paused, like an index rebuild (operators/pq.py) —
  mid-swap readers could miss folded rows for the swap instant.
"""

from __future__ import annotations

import json
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

COMPACTED_BATCH_ID = -1


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf), jvm.org.apache.hadoop.fs.Path


def _write_marker(spark, marker_path: str, fold_ids: list[int]) -> None:
    fs, HPath = _fs(spark, marker_path)
    out = fs.create(HPath(marker_path), True)
    out.write(bytearray(json.dumps({"fold": fold_ids}).encode()))
    out.close()


def _read_marker(spark, marker_path: str) -> list[int]:
    # java-side line read: py4j passes byte[] buffers by value, so
    # the usual read(buf) loop cannot fill a Python bytearray
    fs, HPath = _fs(spark, marker_path)
    jvm = spark.sparkContext._jvm
    stream = fs.open(HPath(marker_path))
    reader = jvm.java.io.BufferedReader(
        jvm.java.io.InputStreamReader(stream, "UTF-8")
    )
    try:
        line = reader.readLine()
    finally:
        reader.close()
    return json.loads(line)["fold"]


def _finish_swap(spark, state_dir: str, fold_ids: list[int]) -> None:
    """Complete a compaction whose stage is known-good: swap the
    staged consolidated data into ``batch_id=-1``, delete the folded
    partitions, drop the marker. Each step is idempotent, so this
    replays cleanly from any crash point past marker creation."""
    fs, HPath = _fs(spark, state_dir)
    tmp = HPath(f"{state_dir}/_compact_tmp")
    dest = HPath(f"{state_dir}/batch_id={COMPACTED_BATCH_ID}")
    if fs.exists(tmp):
        if fs.exists(dest):
            fs.delete(dest, True)
        fs.rename(tmp, dest)
    for b in fold_ids:
        p = HPath(f"{state_dir}/batch_id={b}")
        if fs.exists(p):
            fs.delete(p, True)
    fs.delete(HPath(f"{state_dir}/_COMPACTING"), False)


def compact_batch_partitions(
    spark: SparkSession,
    state_dir: str,
    fold: Callable[[DataFrame], DataFrame],
    *,
    keep_last: int = 1,
    sub_partition_by: list[str] | None = None,
    sort_within: list[str] | None = None,
) -> int:
    """Fold all but the newest ``keep_last`` batch_id partitions of
    ``state_dir`` (plus any prior consolidated partition) into one
    ``batch_id=-1`` partition, using ``fold`` to merge the rows
    (its input still carries batch_id; its output must NOT). Returns
    the number of partitions folded; 0 when there is nothing to do
    (including a missing state dir). Crash-safe per the module
    docstring; call between batches, not concurrently with the
    stream.

    ``sub_partition_by`` preserves secondary partition columns under
    the consolidated partition (e.g. the text index's ``bucket``, so
    probe-time partition pruning survives compaction — the staged
    dir is written partitioned and renamed whole). ``sort_within``
    re-applies a file-clustering contract (e.g. term-sorted postings
    for row-group skipping) to the folded output.
    """
    from pyspark.errors import AnalysisException

    fs, HPath = _fs(spark, state_dir)
    marker = f"{state_dir}/_COMPACTING"
    tmp = f"{state_dir}/_compact_tmp"
    if fs.exists(HPath(marker)):
        # a prior compaction crashed after staging completed — its
        # stage (or already-swapped partition) is authoritative;
        # replay the swap forward before doing anything new
        _finish_swap(spark, state_dir, _read_marker(spark, marker))
    elif fs.exists(HPath(tmp)):
        # crashed BEFORE the marker: the stage may be partial — it is
        # garbage (state untouched), discard and recompute
        fs.delete(HPath(tmp), True)

    try:
        df = spark.read.parquet(state_dir)
    except AnalysisException:
        return 0
    live = sorted(
        r.batch_id
        for r in df.select("batch_id").distinct().collect()
        if r.batch_id != COMPACTED_BATCH_ID
    )
    if len(live) <= keep_last:
        return 0
    to_fold = live[: len(live) - keep_last]
    folded = fold(
        df.filter(F.col("batch_id").isin([COMPACTED_BATCH_ID] + to_fold))
    )
    if sort_within:
        folded = folded.sortWithinPartitions(*sort_within)
    writer = folded.write.mode("overwrite")
    if sub_partition_by:
        writer = writer.partitionBy(*sub_partition_by)
    writer.parquet(tmp)
    _write_marker(spark, marker, to_fold)
    _finish_swap(spark, state_dir, to_fold)
    return len(to_fold)


def compact_chunk_state(
    spark: SparkSession, state_dir: str, *, keep_last: int = 1
) -> int:
    """Compact the CDC chunk-hash index (streaming/chunkgate.py):
    fold = distinct chunk hashes."""
    return compact_batch_partitions(
        spark,
        state_dir,
        lambda df: df.select("chunk_hash").distinct(),
        keep_last=keep_last,
    )


def compact_sig_state(
    spark: SparkSession, state_dir: str, *, keep_last: int = 1
) -> int:
    """Compact the streaming-dedup signature table
    (streaming/dedup.py): one row per surviving doc id (ids are
    unique across batches by the survivor contract, so first-per-id;
    max(sig) is a deterministic tiebreak that only ever sees
    identical copies). Retry safety here is belt-and-braces: the
    dedup operator's id-collision guard already makes re-meeting
    one's own survivors safe, but the uniform keep_last contract
    costs nothing."""
    return compact_batch_partitions(
        spark,
        state_dir,
        lambda df: df.groupBy("id").agg(F.max("sig").alias("sig")),
        keep_last=keep_last,
    )


def compact_drift_counts(
    spark: SparkSession, counts_dir: str, *, keep_last: int = 1
) -> int:
    """Compact the drift monitor's bucket-counts log
    (streaming/drift.py): additive per bucket, so the fold sums n.
    keep_last matters here for a subtler reason than the read-minus-
    self operators: a retried newest batch REWRITES its own batch_id
    partition before the cumulative read — if its first-attempt
    counts had been folded into the consolidated partition, the
    retry would double them. Cumulative PSI before/after compaction
    is pinned equal in tests/test_compaction.py."""
    return compact_batch_partitions(
        spark,
        counts_dir,
        lambda df: df.groupBy("bucket").agg(F.sum("n").alias("n")),
        keep_last=keep_last,
    )


def compact_stream_index(
    spark: SparkSession, index_path: str, *, keep_last: int = 1
) -> int:
    """Compact a STREAMING-built text index (streaming/indexing.py):
    its postings partition by (batch_id, bucket), so file fan-out is
    batches x buckets — the fastest-growing layout in the package.
    Postings rows are append-only facts (never merged; BM25 stats
    re-derive from the union at query time), so the fold is identity;
    the consolidated partition keeps the ``bucket`` sub-partitioning
    (probe-time pruning intact) and the term-sorted file clustering.
    doclen folds the same way (one row per doc, ids unique across
    batches). keep_last guards the retry contract: a retried newest
    batch rewrites its own partitions — folded first-attempt rows
    would duplicate its postings and double its term frequencies.
    Search-result equivalence before/after is pinned in
    tests/test_compaction.py. Returns folded-partition count for the
    postings table."""
    n = compact_batch_partitions(
        spark,
        f"{index_path}/postings",
        lambda df: df.drop("batch_id"),
        keep_last=keep_last,
        sub_partition_by=["bucket"],
        sort_within=["bucket", "term"],
    )
    compact_batch_partitions(
        spark,
        f"{index_path}/doclen",
        lambda df: df.drop("batch_id"),
        keep_last=keep_last,
    )
    return n


def compact_count_log(
    spark: SparkSession, counts_dir: str, *, keep_last: int = 1
) -> int:
    """Compact the boilerplate gram-count log
    (streaming/boilerplate.py): counts are ADDITIVE across batches,
    so the fold sums n per gram key — the case the staged-swap
    protocol exists for (a half-compacted additive directory would
    double-count under a naive re-fold; the marker protocol makes
    the fold exactly-once)."""
    keys = ["_h1", "_h2"]
    return compact_batch_partitions(
        spark,
        counts_dir,
        lambda df: df.groupBy(*keys).agg(F.sum("n").alias("n")),
        keep_last=keep_last,
    )
