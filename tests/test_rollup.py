"""Continuous time-bucket rollup tests: incremental refresh equals
full recompute; late data repairs exactly its own bucket; replay is
idempotent."""

from __future__ import annotations

import datetime as dt

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


def test_empty_batch_is_noop(spark, tmp_path):
    out = str(tmp_path / "rollup")
    src = _events(spark, [("2024-01-01T10:00:00", "view", 1.0)])
    incremental_time_rollup(src, src, out)
    before = _snap(spark.read.parquet(out))
    assert incremental_time_rollup(src, src.filter("event_id < 0"), out) == []
    assert _snap(spark.read.parquet(out)) == before
