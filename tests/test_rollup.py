"""Continuous time-bucket rollup tests: incremental refresh equals
full recompute; late data repairs exactly its own bucket; replay is
idempotent."""

from __future__ import annotations

import datetime as dt

from tests.streamutil import finish
from finance_etl_system_spark.pipeline.rollup import (
    incremental_time_rollup,
    rollup_aggregate,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime.fromisoformat(ts), et, float(v)) for i, (ts, et, v) in enumerate(rows)],
        "event_id LONG, ts TIMESTAMP, event_type STRING, value DOUBLE",
    )


def _snap(df):
    return {
        (str(r["bucket_start"]), r["event_type"]): (r["n_events"], r["total_value"])
        for r in df.collect()
    }


def test_incremental_equals_full_and_late_repair(spark, tmp_path):
    out = str(tmp_path / "rollup")
    day1 = [("2024-01-01T10:00:00", "view", 1.0), ("2024-01-01T11:00:00", "click", 2.0)]
    day2 = [("2024-01-02T09:00:00", "view", 3.0)]
    src = _events(spark, day1 + day2)

    touched = incremental_time_rollup(src, src, out)
    assert len(touched) == 2
    assert _snap(spark.read.parquet(out)) == _snap(rollup_aggregate(src))

    # a LATE row lands in day 1; only that bucket refreshes
    late = [("2024-01-01T12:00:00", "view", 10.0)]
    src2 = _events(spark, day1 + day2 + late)
    touched2 = incremental_time_rollup(src2, _events(spark, late), out)
    assert [str(t) for t in touched2] == ["2024-01-01 00:00:00"]
    assert _snap(spark.read.parquet(out)) == _snap(rollup_aggregate(src2))

    # replaying the same batch rewrites identical partitions
    incremental_time_rollup(src2, _events(spark, late), out)
    assert _snap(spark.read.parquet(out)) == _snap(rollup_aggregate(src2))


def test_weekly_bucket_includes_full_span(spark, tmp_path):
    """Regression: with '1 week' buckets the source-scan upper bound
    must be bucket_start + 1 WEEK, not + 1 day — rows later in the max
    touched week used to be silently excluded from the re-aggregate."""
    out = str(tmp_path / "rollup")
    # Spark week windows anchor to the epoch (a Thursday); the bucket
    # containing these rows spans 2024-01-04 .. 2024-01-11
    week_rows = [
        ("2024-01-04T10:00:00", "view", 1.0),
        ("2024-01-06T10:00:00", "view", 2.0),   # after first midnight
        ("2024-01-10T23:00:00", "click", 4.0),  # near the end of the week
    ]
    src = _events(spark, week_rows)
    touched = incremental_time_rollup(src, src, out, bucket="1 week")
    assert len(touched) == 1
    assert _snap(spark.read.parquet(out)) == _snap(
        rollup_aggregate(src, bucket="1 week")
    )
    # the view bucket must count BOTH view rows (1.0 + 2.0)
    got = _snap(spark.read.parquet(out))
    (view_key,) = [k for k in got if k[1] == "view"]
    assert got[view_key] == (2, 3.0)


def test_stream_rollup_maintains_continuous_aggregate(spark, tmp_path):
    """Two micro-batches (second delivers late day-1 data) must leave
    the rollup equal to a full recompute over everything ingested."""
    import json

    from finance_etl_system_spark.pipeline.rollup import stream_rollup

    src = tmp_path / "stream_src"
    src.mkdir()
    events_dir = str(tmp_path / "events")
    rollup_dir = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    def emit(name, rows):
        with open(src / name, "w") as fh:
            for i, (ts, et, v) in rows:
                fh.write(json.dumps(
                    {"event_id": i, "ts": ts, "event_type": et, "value": v}
                ) + "\n")

    emit("b1.json", [
        (1, ("2024-01-01T10:00:00", "view", 1.0)),
        (2, ("2024-01-02T09:00:00", "click", 2.0)),
    ])
    finish(stream_rollup(spark, str(src), events_dir, rollup_dir, ckpt))

    # late day-1 row arrives in batch 2
    emit("b2.json", [(3, ("2024-01-01T15:00:00", "view", 10.0))])
    finish(stream_rollup(spark, str(src), events_dir, rollup_dir, ckpt))

    full = rollup_aggregate(spark.read.parquet(events_dir))
    assert _snap(spark.read.parquet(rollup_dir)) == _snap(full)
    assert spark.read.parquet(events_dir).count() == 3

    # replay EVERYTHING with a fresh checkpoint (= crash-recovery
    # redelivery): the event-id dedup must keep the log exact and the
    # rollup converged
    ckpt2 = str(tmp_path / "ckpt2")
    finish(stream_rollup(spark, str(src), events_dir, rollup_dir, ckpt2))
    assert spark.read.parquet(events_dir).count() == 3
    assert _snap(spark.read.parquet(rollup_dir)) == _snap(full)


def test_empty_batch_is_noop(spark, tmp_path):
    out = str(tmp_path / "rollup")
    src = _events(spark, [("2024-01-01T10:00:00", "view", 1.0)])
    incremental_time_rollup(src, src, out)
    before = _snap(spark.read.parquet(out))
    assert incremental_time_rollup(src, src.filter("event_id < 0"), out) == []
    assert _snap(spark.read.parquet(out)) == before
