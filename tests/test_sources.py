"""Source/sink tests (SURVEY §2.1): CSV symbol list + fallback, Kafka
frame shape, CSV backup round-trip, discovery."""

from __future__ import annotations

import json

from finance_etl_system_spark.sources.readers import (
    DEFAULT_SYMBOLS,
    discover_symbols,
    discover_tables,
    read_symbol_csv,
    to_kafka_frame,
    write_csv_backup,
)


def test_symbol_csv_roundtrip(spark, tmp_path):
    p = tmp_path / "symbols.csv"
    p.write_text("Symbol,Name\naapl,Apple\nMSFT,Microsoft\n ,blank\n")
    out = read_symbol_csv(spark, str(p))
    syms = {r["symbol"] for r in out.collect()}
    assert syms == {"AAPL", "MSFT"}


def test_symbol_csv_fallback_missing_file(spark, tmp_path):
    out = read_symbol_csv(spark, str(tmp_path / "nope.csv"))
    assert {r["symbol"] for r in out.collect()} == set(DEFAULT_SYMBOLS)


def test_symbol_csv_fallback_wrong_columns(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("foo,bar\n1,2\n")
    out = read_symbol_csv(spark, str(p))
    assert {r["symbol"] for r in out.collect()} == set(DEFAULT_SYMBOLS)


def test_kafka_frame_shape(spark):
    df = spark.createDataFrame(
        [("AAPL", "2024-01-02", 101.5)], "ticker STRING, date STRING, close DOUBLE"
    )
    k = to_kafka_frame(df).collect()[0]
    assert k["key"] == "AAPL"
    v = json.loads(k["value"])
    assert v == {"ticker": "AAPL", "date": "2024-01-02", "close": 101.5}


def test_csv_backup_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("AAPL", 1.0), ("MSFT", 2.0)], "symbol STRING, close DOUBLE"
    )
    path = str(tmp_path / "backup")
    write_csv_backup(df, path, partition_col="symbol")
    back = spark.read.option("header", "true").csv(path)
    assert back.count() == 2
    assert set(back.columns) == {"close", "symbol"}


def test_discover_tables(tmp_path):
    (tmp_path / "lineitem.parquet").write_text("")
    (tmp_path / "orders.parquet").write_text("")
    (tmp_path / "README.md").write_text("")
    assert discover_tables(str(tmp_path)) == ["lineitem", "orders"]
    assert discover_tables(str(tmp_path / "missing")) == []


def test_discover_symbols(spark):
    df = spark.createDataFrame(
        [("AAPL",), ("AAPL",), ("MSFT",)], "symbol STRING"
    )
    assert discover_symbols(df).count() == 2
