"""Python DataSource API (Spark 4, SPARK-44076): the reference's
crawler as a first-class Spark CONNECTOR instead of an external
process writing files.

The reference fetches OHLCV per symbol on 10 worker threads and
produces Kafka messages (reference crawler/crawler.py:36-40,99-133);
Spark-first, the fetcher IS a data source: one input partition per
symbol (the thread-per-symbol analogue, but scheduled/retried by
Spark), rows typed at the source, options for the universe and date
range. Tests drive a deterministic synthetic quote function; a real
deployment replaces ``_quote`` with the HTTP fetch and keeps the
partitioning, schema, and retry semantics.

Scale: partitions = symbols, so a 10k-symbol universe fans out to 10k
independent tasks with per-task retry — the crawler's backoff loop
(crawler.py:38: retry ×5) becomes Spark task retry. No driver-side
state; the source is re-listable and deterministic for a fixed
(symbols, days, seed) so replays converge.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = (
    "symbol string, day_index int, trading_date date, open double,"
    " high double, low double, close double, volume long"
)


def _parse_common_options(options) -> tuple[list[str], str, int]:
    symbols = [
        s.strip().upper()
        for s in options.get("symbols", "AAPL,MSFT").split(",")
        if s.strip()
    ]
    return symbols, options.get("start", "2024-01-02"), int(options.get("seed", 42))


def _quote(symbol: str, day: int, seed: int) -> tuple[float, float, float, float, int]:
    """Deterministic synthetic OHLCV: crc32-keyed so any (symbol, day)
    yields the same row on every executor, attempt, and replay."""
    h = zlib.crc32(f"{seed}:{symbol}:{day}".encode())
    base = 50.0 + (h % 10_000) / 100.0
    spread = ((h >> 8) % 500) / 100.0
    o = round(base, 2)
    c = round(base + spread - 2.5, 2)
    hi = round(max(o, c) + spread / 2, 2)
    lo = round(min(o, c) - spread / 2, 2)
    vol = 1_000 + (h >> 16) % 100_000
    return o, hi, lo, c, vol


class CrawlerDataSource(DataSource):
    """``spark.read.format("ohlcv_crawler")`` with options:
    ``symbols`` (comma list), ``days`` (int), ``start`` (ISO date),
    ``seed`` (int)."""

    @classmethod
    def name(cls) -> str:
        return "ohlcv_crawler"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:  # noqa: ARG002
        return _CrawlerReader(self.options)

    def simpleStreamReader(self, schema):  # noqa: ARG002
        return _CrawlerStreamReader(self.options)


class _CrawlerReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.symbols, self.start, self.seed = _parse_common_options(options)
        self.days = int(options.get("days", 30))

    def partitions(self) -> list[InputPartition]:
        # one partition per symbol: the crawler's per-symbol worker,
        # with scheduling/retry owned by Spark
        return [InputPartition(s) for s in self.symbols]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        import datetime as dt

        symbol = partition.value
        start = dt.date.fromisoformat(self.start)
        for day in range(self.days):
            o, hi, lo, c, vol = _quote(symbol, day, self.seed)
            yield (
                symbol,
                day,
                start + dt.timedelta(days=day),
                o,
                hi,
                lo,
                c,
                vol,
            )


class _CrawlerStreamReader(SimpleDataSourceStreamReader):
    """The crawler's polling cycle as a STREAMING source: the offset
    is the day index, each micro-batch 'fetches' the next
    ``batch_days`` for every symbol. Offsets live in the query
    checkpoint, so a restarted query resumes exactly where the last
    committed batch ended — the reference tracks the same cursor by
    hand in its scheduler (reference docker/scheduler.py:28-35).

    ``read`` runs on the DRIVER by design (SimpleStreamReader): fine
    for cursor-advance planning plus modest per-cycle row counts; a
    huge universe would use the partitioned streaming API instead."""

    def __init__(self, options) -> None:
        self.symbols, self.start, self.seed = _parse_common_options(options)
        self.batch_days = int(options.get("batch_days", 1))

    def initialOffset(self) -> dict:
        return {"day": 0}

    def _rows(self, d0: int, d1: int) -> list[tuple]:
        # a LIST, not a generator: the stream runner pickles the
        # returned iterator for prefetch/recovery
        import datetime as dt

        start = dt.date.fromisoformat(self.start)
        out = []
        for day in range(d0, d1):
            for symbol in self.symbols:
                o, hi, lo, c, vol = _quote(symbol, day, self.seed)
                out.append(
                    (
                        symbol,
                        day,
                        start + dt.timedelta(days=day),
                        o,
                        hi,
                        lo,
                        c,
                        vol,
                    )
                )
        return out

    def read(self, start: dict):
        d0 = start["day"]
        d1 = d0 + self.batch_days
        return iter(self._rows(d0, d1)), {"day": d1}

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay of a committed range (exactly the
        # recovery contract _quote's determinism exists for)
        return iter(self._rows(start["day"], end["day"]))


def register(spark) -> None:
    """Idempotent source registration."""
    spark.dataSource.register(CrawlerDataSource)
