"""Streaming OHLC bars: the declarative (windowed-agg) and imperative
(transformWithStateInPandas) paths must both reproduce the pandas
ground truth, across micro-batch boundaries."""

from __future__ import annotations

import json

import pandas as pd
import pytest

from finance_etl_system_spark.streaming.bars import run_stream_ohlc
from tests.streamutil import finish

TICKS_B1 = [  # minute bars 10:00 and 10:01
    ("AAPL", "2024-01-02T10:00:05", 10.0, 5),
    ("AAPL", "2024-01-02T10:00:20", 12.0, 3),
    ("AAPL", "2024-01-02T10:00:50", 11.0, 2),
    ("AAPL", "2024-01-02T10:01:10", 14.0, 1),
    ("MSFT", "2024-01-02T10:00:30", 100.0, 7),
]
TICKS_B2 = [  # second batch extends 10:01 and opens 10:02
    ("AAPL", "2024-01-02T10:01:40", 13.0, 4),
    ("MSFT", "2024-01-02T10:02:10", 101.0, 2),
]
SENTINEL = [("FLUSH", "2024-01-02T11:00:00", 0.0, 0)]

TRUTH = {  # (symbol, minute) -> (open, high, low, close, volume, n)
    ("AAPL", "10:00"): (10.0, 12.0, 10.0, 11.0, 10, 3),
    ("AAPL", "10:01"): (14.0, 14.0, 13.0, 13.0, 5, 2),
    ("MSFT", "10:00"): (100.0, 100.0, 100.0, 100.0, 7, 1),
    ("MSFT", "10:02"): (101.0, 101.0, 101.0, 101.0, 2, 1),
}


@pytest.fixture(autouse=True)
def _few_partitions(spark):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", old)


def _write_file(src, idx, rows):
    src.mkdir(parents=True, exist_ok=True)
    with open(src / f"b{idx}.json", "w") as fh:
        for symbol, ts, price, vol in rows:
            fh.write(
                json.dumps(
                    {"symbol": symbol, "event_time": ts, "price": price, "volume": vol}
                )
                + "\n"
            )


def _check_bars(pdf: pd.DataFrame) -> None:
    got = {}
    for r in pdf.itertuples():
        minute = pd.Timestamp(r.bar_start).strftime("%H:%M")
        got[(r.symbol, minute)] = (
            r.open, r.high, r.low, r.close, int(r.volume), int(r.n_trades)
        )
    for key, want in TRUTH.items():
        assert got[key] == want, (key, got.get(key), want)


@pytest.mark.timeout(600)
def test_declarative_bars_close_on_watermark(spark, tmp_path):
    src, out, ckpt = tmp_path / "src", str(tmp_path / "out"), str(tmp_path / "ckpt")
    _write_file(src, 0, TICKS_B1)
    _write_file(src, 1, TICKS_B2)
    _write_file(src, 2, SENTINEL)  # pushes the watermark past all bars
    q = run_stream_ohlc(spark, str(src), out, ckpt)
    finish(q)
    bars = pd.read_parquet(out)
    closed = bars[bars.symbol != "FLUSH"]
    assert len(closed) == len(TRUTH)
    _check_bars(closed)


class _FakeMapState:
    """Stand-in for pyspark's MapState, dict-backed."""

    def __init__(self):
        self.d = {}

    def containsKey(self, k):
        return k in self.d

    def getValue(self, k):
        return self.d.get(k)

    def updateValue(self, k, v):
        self.d[k] = v


class _FakeHandle:
    def __init__(self):
        self.state = _FakeMapState()

    def getMapState(self, name, kschema, vschema, ttlDurationMs=None):
        return self.state


def test_imperative_processor_logic_cross_batch():
    """Drive the StatefulProcessor directly (the in-container e2e run
    needs protobuf, see bars.py) — state must carry across batches."""
    from finance_etl_system_spark.streaming.bars import _make_ohlc_processor

    # real transformWithState scopes state per grouping key — emulate
    # with one processor+handle per symbol, reused across batches
    procs = {}

    def proc_for(symbol):
        if symbol not in procs:
            p = _make_ohlc_processor(60)
            p.init(_FakeHandle())
            procs[symbol] = p
        return procs[symbol]

    def batch(rows, symbol):
        sel = [r for r in rows if r[0] == symbol]
        if not sel:
            return None
        return pd.DataFrame(
            {
                "event_time": pd.to_datetime([r[1] for r in sel]),
                "price": [r[2] for r in sel],
                "volume": [r[3] for r in sel],
            }
        )

    snaps = []
    for rows in (TICKS_B1, TICKS_B2):
        for symbol in ("AAPL", "MSFT"):
            pdf = batch(rows, symbol)
            if pdf is None:
                continue
            snaps.extend(
                out
                for out in proc_for(symbol).handleInputRows(
                    (symbol,), iter([pdf]), None
                )
            )
    snaps = pd.concat(snaps, ignore_index=True)
    last = (
        snaps.sort_values("n_trades")
        .groupby(["symbol", "bucket"], as_index=False)
        .last()
    )
    last["bar_start"] = pd.to_datetime(last["bucket"], unit="s")
    assert len(last) == len(TRUTH)
    _check_bars(last)
    aapl_1001 = last[
        (last.symbol == "AAPL")
        & (last.bar_start == pd.Timestamp("2024-01-02T10:01:00"))
    ].iloc[0]
    assert aapl_1001.open == 14.0 and aapl_1001.close == 13.0


@pytest.mark.timeout(600)
def test_imperative_bars_cross_batch_state(spark, tmp_path):
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state server needs python protobuf",
    )
    src, out, ckpt = tmp_path / "src", str(tmp_path / "out"), str(tmp_path / "ckpt")
    _write_file(src, 0, TICKS_B1)
    _write_file(src, 1, TICKS_B2)
    q = run_stream_ohlc(spark, str(src), out, ckpt, imperative=True)
    finish(q)
    snaps = pd.read_parquet(out)
    # update semantics: keep the last snapshot (max n_trades) per bar
    last = (
        snaps.sort_values("n_trades")
        .groupby(["symbol", "bucket"], as_index=False)
        .last()
    )
    last["bar_start"] = pd.to_datetime(last["bucket"], unit="s")
    assert len(last) == len(TRUTH)
    _check_bars(last)
    # the 10:01 AAPL bar spans both batches: open from batch 1, close
    # from batch 2 — proves MapState carried across micro-batches
    aapl_1001 = last[
        (last.symbol == "AAPL")
        & (last.bar_start == pd.Timestamp("2024-01-02T10:01:00"))
    ].iloc[0]
    assert aapl_1001.open == 14.0 and aapl_1001.close == 13.0
