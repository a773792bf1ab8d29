"""Stateful streaming EMA: cross-micro-batch state must reproduce the
single-pass pandas ewm(adjust=False) series exactly."""

from __future__ import annotations

import json

import pandas as pd
import pytest

from finance_etl_system_spark.streaming.stateful import run_streaming_ema
from tests.streamutil import finish


@pytest.fixture(autouse=True)
def _few_partitions(spark):
    """The state store + a python worker instantiate PER shuffle
    partition per micro-batch; 32 partitions for 2 keys is pure
    overhead (~90s/query). 2 partitions cuts the test to seconds —
    note this is also the production guidance: size state-store
    partition count to key cardinality, not CPU count."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", old)


def _write_batch(src, rows):
    src.mkdir(parents=True, exist_ok=True)
    f = src / f"b{len(list(src.glob('*.json')))}.json"
    with open(f, "w") as fh:
        for ticker, iso_ts, close in rows:
            value = {
                "ticker": ticker,
                "date": iso_ts[:10],
                "open": close,
                "high": close,
                "low": close,
                "close": close,
                "volume": 1,
                "timestamp": iso_ts,
            }
            fh.write(json.dumps({"key": ticker, "value": json.dumps(value)}) + "\n")


@pytest.mark.timeout(600)
def test_streaming_ema_matches_pandas_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    closes_b1 = [10.0, 12.0, 11.0, 14.0]
    closes_b2 = [13.0, 15.0, 16.0]

    _write_batch(
        src,
        [("AAPL", f"2024-01-02T10:0{i}:00", c) for i, c in enumerate(closes_b1)],
    )
    q = run_streaming_ema(spark, str(src), out, ckpt, span=12)
    finish(q)

    # second micro-batch: state must carry the EMA forward
    _write_batch(
        src,
        [("AAPL", f"2024-01-02T11:0{i}:00", c) for i, c in enumerate(closes_b2)],
    )
    q2 = run_streaming_ema(spark, str(src), out, ckpt, span=12)
    finish(q2)

    got = (
        spark.read.parquet(out)
        .orderBy("event_time")
        .select("close", "ema")
        .toPandas()
    )
    expect = pd.Series(closes_b1 + closes_b2).ewm(span=12, adjust=False).mean()
    assert len(got) == 7
    for g, e in zip(got["ema"], expect):
        assert g == pytest.approx(e, abs=1e-9)


@pytest.mark.timeout(600)
def test_streaming_ema_keys_are_independent(spark, tmp_path):
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(
        src,
        [
            ("AAPL", "2024-01-02T10:00:00", 10.0),
            ("MSFT", "2024-01-02T10:00:00", 100.0),
            ("AAPL", "2024-01-02T10:01:00", 20.0),
        ],
    )
    q = run_streaming_ema(spark, str(src), out, ckpt, span=3)
    finish(q)
    got = {
        (r["symbol"], str(r["event_time"])): r["ema"]
        for r in spark.read.parquet(out).collect()
    }
    assert got[("MSFT", "2024-01-02 10:00:00")] == pytest.approx(100.0)
    # AAPL second row: (1-0.5)*10 + 0.5*20 = 15 (span=3 → α=0.5)
    assert got[("AAPL", "2024-01-02 10:01:00")] == pytest.approx(15.0)
