"""Continuous time-bucket rollup (hypertable-style aggregate).

The reference recomputes indicator tables wholesale per 12-hour cycle
(reference docker/scheduler.py:28-35, spark-job/etl_job.py:548-557);
a 100 TB pipeline cannot. This operator maintains a materialized
time-bucket aggregate INCREMENTALLY:

1. find the distinct buckets touched by the new batch (driver sees
   only the bucket list — a handful of values, never the data),
2. re-aggregate ONLY those buckets from the source — the bucket-range
   predicate prunes the scan to affected parquet row groups /
   partitions,
3. dynamic-partition-overwrite exactly those bucket partitions in the
   rollup table.

Late data therefore repairs its own bucket on the next run (the
recompute-affected-buckets contract — stronger than the reference's
truncated-window incremental quirk documented in SURVEY §4), and a
replayed batch rewrites identical partitions: idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.confs import partition_overwrite


def rollup_aggregate(source: DataFrame, *, bucket: str = "1 day") -> DataFrame:
    """The aggregate recomputed per bucket: per (bucket, event_type)
    counts + value stats over `events`-shaped input. 2dp money policy
    so replay/compare is hash-stable."""
    return (
        source.groupBy(
            F.window("ts", bucket).alias("win"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.col("win.start").alias("bucket_start"),
            "event_type",
            "n_events",
            "total_value",
            "avg_value",
        )
    )


def stream_rollup(
    spark,
    source_dir: str,
    events_dir: str,
    rollup_dir: str,
    checkpoint_dir: str,
    *,
    bucket: str = "1 day",
):
    """Continuous-aggregate maintenance as a stream: each micro-batch
    is appended to the event log, then exactly the buckets it touches
    are re-aggregated from the log and overwritten in the rollup table
    (incremental_time_rollup). Late rows repair their own bucket in
    the same batch that delivers them.

    Replay contract: a crash between the append and the checkpoint
    commit replays the batch. The append is made effectively-once by
    anti-joining the batch against the log's event_ids FIRST — and
    because the log is day-partitioned, that existence probe reads
    only the batch's own days, not the whole log. The rollup refresh
    then recomputes from the (deduped) log and overwrites its buckets,
    so both sinks converge under replay. Returns the started query
    (availableNow trigger).

    Scale: per batch, the dedup probe reads the touched days and the
    refresh re-aggregates the touched buckets — streaming arrival
    pattern, not log size, drives the work.
    """
    raw = (
        spark.readStream.schema(
            "event_id LONG, ts TIMESTAMP, event_type STRING, value DOUBLE"
        ).json(source_dir)
    )

    def refresh(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sess = batch_df.sparkSession
        batch = batch_df.withColumn("event_date", F.col("ts").cast("date")).persist()
        try:
            days = [r["event_date"] for r in batch.select("event_date").distinct().collect()]
            try:
                seen = (
                    sess.read.parquet(events_dir)
                    .filter(F.col("event_date").isin(days))
                    .select("event_id")
                )
                fresh = batch.join(seen, "event_id", "left_anti")
            except Exception:  # noqa: BLE001 — first batch, no log yet
                fresh = batch
            (
                fresh.write.mode("append")
                .partitionBy("event_date")
                .parquet(events_dir)
            )
            source = sess.read.parquet(events_dir)
            incremental_time_rollup(source, batch, rollup_dir, bucket=bucket)
        finally:
            batch.unpersist()

    return (
        raw.writeStream.foreachBatch(refresh)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def incremental_time_rollup(
    source: DataFrame,
    new_batch: DataFrame,
    rollup_dir: str,
    *,
    bucket: str = "1 day",
) -> list:
    """Refresh the continuous aggregate for the buckets `new_batch`
    touches. `source` is the full event table (scan pruned by the
    bucket predicate); `new_batch` is the just-ingested slice.
    Returns the refreshed bucket starts (for logging/tests).
    """
    spark = source.sparkSession
    touched = [
        r["b"]
        for r in new_batch.select(
            F.window("ts", bucket).start.alias("b")
        ).distinct().collect()
    ]
    if not touched:
        return []
    lo, hi = min(touched), max(touched)
    # bucket-range predicate -> parquet min/max pruning on the source;
    # upper bound is hi + one bucket DURATION (not one day — a '1 week'
    # bucket must include rows through its whole span); the IN-list
    # then drops any untouched buckets inside the range
    refreshed = rollup_aggregate(
        source.filter(
            (F.col("ts") >= F.lit(lo))
            & (F.col("ts") < F.lit(hi) + F.expr(f"INTERVAL {bucket}"))
        ),
        bucket=bucket,
    ).filter(F.col("bucket_start").isin(touched))
    with partition_overwrite(spark, "dynamic"):
        (
            refreshed.repartition("bucket_start")
            .write.mode("overwrite")
            .partitionBy("bucket_start")
            .parquet(rollup_dir)
        )
    return sorted(touched)
