"""Source/sink tests (SURVEY §2.1): CSV symbol list + fallback, Kafka
frame shape, CSV backup round-trip, discovery."""

from __future__ import annotations

import json

from tests.streamutil import finish
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


def test_binary_file_ingest(spark, tmp_path):
    """binaryFile source -> multimodal asset layout; asset_id is a
    stable hash of the path (re-listing cannot renumber assets)."""
    from finance_etl_system_spark.sources.readers import read_binary_assets

    d = tmp_path / "assets"
    d.mkdir()
    (d / "a.bin").write_bytes(b"\x00\x01\x02")
    (d / "b.bin").write_bytes(b"hello")
    (d / "skip.txt").write_bytes(b"nope")

    got = read_binary_assets(spark, str(d), glob="*.bin").orderBy("source_uri")
    rows = got.collect()
    assert [bytes(r["content"]) for r in rows] == [b"\x00\x01\x02", b"hello"]
    assert [r["content_length"] for r in rows] == [3, 5]
    again = read_binary_assets(spark, str(d), glob="*.bin").orderBy("source_uri")
    assert [r["asset_id"] for r in rows] == [r["asset_id"] for r in again.collect()]


def test_orc_roundtrip_preserves_values_and_pushdown(spark, tmp_path):
    from finance_etl_system_spark.catalog import load_table
    from finance_etl_system_spark.plans import pushed_filters
    from finance_etl_system_spark.sources.readers import write_read_orc
    from tests.conftest import SF_SMOKE

    src = load_table(spark, SF_SMOKE, "nation")
    back = write_read_orc(src, str(tmp_path / "nation_orc"), spark)
    assert sorted(r["n_name"] for r in back.collect()) == sorted(
        r["n_name"] for r in src.collect()
    )
    filtered = back.filter(back.n_regionkey == 1)
    assert any("n_regionkey" in f for f in pushed_filters(filtered))


def test_schema_evolution_merge_and_backfill(spark, tmp_path):
    """Old-generation files must surface NULL for later columns, the
    declared default must backfill exactly those rows, and pushdown on
    a common column must still reach the scan."""
    from finance_etl_system_spark.sources.readers import read_with_schema_evolution

    path = str(tmp_path / "evolving")
    spark.createDataFrame(
        [("AAPL", 100.0), ("MSFT", 200.0)], "symbol STRING, close DOUBLE"
    ).write.parquet(path)
    spark.createDataFrame(
        [("GOOG", 150.0, "tech")], "symbol STRING, close DOUBLE, sector STRING"
    ).write.mode("append").parquet(path)

    df = read_with_schema_evolution(
        spark, path, defaults={"sector": "unknown", "exchange": "NYSE"}
    )
    rows = {r.symbol: r for r in df.collect()}
    assert rows["AAPL"].sector == "unknown"      # old gen, backfilled
    assert rows["GOOG"].sector == "tech"         # new gen, untouched
    assert all(r.exchange == "NYSE" for r in rows.values())  # never-present col

    from pyspark.sql import functions as F

    from finance_etl_system_spark.plans import pushed_filters

    pushed = pushed_filters(df.filter(F.col("close") > 120.0))
    assert any("close" in f for f in pushed)


def test_python_datasource_crawler(spark):
    """The ohlcv_crawler source must partition per symbol, type rows at
    the source, and replay deterministically."""
    from finance_etl_system_spark.sources.pydatasource import _quote, register

    register(spark)
    df = (
        spark.read.format("ohlcv_crawler")
        .option("symbols", "AAPL,msft,GOOG")
        .option("days", "5")
        .option("seed", "7")
        .load()
    )
    assert df.rdd.getNumPartitions() == 3  # one per symbol
    rows = df.collect()
    assert len(rows) == 15
    assert {r.symbol for r in rows} == {"AAPL", "MSFT", "GOOG"}
    for r in rows:
        o, hi, lo, c, vol = _quote(r.symbol, r.day_index, 7)
        assert (r.open, r.high, r.low, r.close, r.volume) == (o, hi, lo, c, vol)
        assert r.low <= min(r.open, r.close) <= max(r.open, r.close) <= r.high
        assert str(r.trading_date) >= "2024-01-02"
    # deterministic replay
    again = spark.read.format("ohlcv_crawler").option(
        "symbols", "AAPL,msft,GOOG"
    ).option("days", "5").option("seed", "7").load().collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_python_datasource_streaming_offsets_resume(spark, tmp_path):
    """The streaming crawler must advance its day-cursor through the
    checkpoint: a restarted query continues from the committed offset
    instead of re-fetching day 0."""
    from finance_etl_system_spark.sources.pydatasource import register

    register(spark)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run_once():
        q = (
            spark.readStream.format("ohlcv_crawler")
            .option("symbols", "AAPL,MSFT")
            .option("batch_days", "2")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        finish(q)

    run_once()
    first = sorted(
        (r.symbol, r.day_index) for r in spark.read.parquet(out).collect()
    )
    assert first == [("AAPL", 0), ("AAPL", 1), ("MSFT", 0), ("MSFT", 1)]

    run_once()  # restart: resumes at day 2
    days = {r.day_index for r in spark.read.parquet(out).collect()}
    assert days == {0, 1, 2, 3}


def test_xml_roundtrip_preserves_values(spark, tmp_path):
    from finance_etl_system_spark.catalog import load_table
    from tests.conftest import SF_SMOKE
    from finance_etl_system_spark.sources.readers import write_read_xml

    src = (
        load_table(spark, SF_SMOKE, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
    )
    back = write_read_xml(src, str(tmp_path / "xml"), spark, row_tag="nation")
    got = sorted(
        (r.n_nationkey, r.n_name, r.n_regionkey)
        for r in back.select("n_nationkey", "n_name", "n_regionkey").collect()
    )
    want = sorted(
        (r.n_nationkey, r.n_name, r.n_regionkey) for r in src.collect()
    )
    assert got == want


def test_connector_glue_options_and_gating(spark):
    """Mongo/ES connector glue (sources/connectors.py): option
    builders produce the exact connector configs (watermark as REAL
    JSON $match, keyed ES upsert), the NaN scrub is one projection
    over every float column, and the gated paths fail with a
    deploy-hint error in this service-less sandbox instead of an
    opaque ClassNotFound."""
    import json
    from datetime import datetime

    import pytest

    from pyspark.sql import functions as F

    from finance_etl_system_spark.sources.connectors import (
        es_write_options,
        mongo_read_options,
        read_mongo_history,
        scrub_nan_to_null,
        write_es_upsert,
    )

    wm = datetime(2024, 1, 2, 3, 4, 5)
    opts = mongo_read_options("finance", "stock_AAPL", watermark=wm)
    assert opts["database"] == "finance"
    assert opts["collection"] == "stock_AAPL"
    pipeline = json.loads(opts["aggregation.pipeline"])
    # BSON extended JSON: zone designator REQUIRED (naive = UTC)
    assert pipeline == [
        {"$match": {"timestamp": {"$gt": {"$date": "2024-01-02T03:04:05Z"}}}}
    ]
    from datetime import timedelta, timezone as tz

    aware = datetime(2024, 1, 2, 5, 4, 5, tzinfo=tz(timedelta(hours=2)))
    p2 = json.loads(
        mongo_read_options("f", "c", watermark=aware)["aggregation.pipeline"]
    )
    assert p2[0]["$match"]["timestamp"]["$gt"]["$date"] == "2024-01-02T03:04:05Z"
    assert "aggregation.pipeline" not in mongo_read_options("f", "c")

    es = es_write_options("findata_aapl", id_col="row_key")
    assert es == {
        "es.resource": "findata_aapl",
        "es.mapping.id": "row_key",
        "es.write.operation": "upsert",
        "es.spark.dataframe.write.null": "true",
    }

    df = spark.createDataFrame(
        [(1, float("nan"), "x"), (2, 2.5, "y")], "id int, v double, s string"
    )
    got = {r.id: r.v for r in scrub_nan_to_null(df).collect()}
    assert got[1] is None and got[2] == 2.5
    # single projection: no chained withColumn tower
    assert scrub_nan_to_null(df).columns == ["id", "v", "s"]

    with pytest.raises(RuntimeError, match="mongo-spark-connector"):
        read_mongo_history(spark, "finance", "stock_AAPL")
    keyed = df.withColumn("row_key", F.sha2(F.col("s"), 256))
    with pytest.raises(RuntimeError, match="elasticsearch-spark"):
        write_es_upsert(keyed, "findata_aapl")
    with pytest.raises(ValueError, match="row_key"):
        write_es_upsert(df, "findata_aapl")


def test_jsonl_shard_export_roundtrip_and_manifest(spark, tmp_path):
    """Shard export: every doc lands in its hash shard exactly once,
    the roundtrip read returns the corpus byte-identically, the
    manifest matches the shards, a re-export is deterministic, and
    the validator flags a tampered manifest."""
    from finance_etl_system_spark.catalog import load_table
    from finance_etl_system_spark.sources.export import (
        read_jsonl_shards,
        validate_shard_export,
        write_jsonl_shards,
    )
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    n = docs.count()
    path = str(tmp_path / "export")
    manifest = write_jsonl_shards(docs, path, n_shards=4).collect()
    assert sorted(r.shard for r in manifest) == [0, 1, 2, 3]
    assert sum(r.n_docs for r in manifest) == n

    back = read_jsonl_shards(spark, path)
    assert back.count() == n
    orig = {r.doc_id: r.text for r in docs.collect()}
    got = {r.id: r.text for r in back.collect()}
    assert got == orig

    verdict = validate_shard_export(spark, path).collect()
    assert all(r.docs_match and r.chars_match for r in verdict)

    # deterministic re-export: same membership counts
    again = write_jsonl_shards(docs, str(tmp_path / "export2"), n_shards=4)
    assert sorted((r.shard, r.n_docs, r.n_chars) for r in again.collect()) == \
        sorted((r.shard, r.n_docs, r.n_chars) for r in manifest)

    # tampered manifest -> validator flags it
    import pandas as pd

    m = pd.read_parquet(f"{path}/manifest")
    m.loc[0, "n_docs"] += 1
    spark.createDataFrame(m).write.mode("overwrite").parquet(f"{path}/manifest")
    bad = {r.shard: r for r in validate_shard_export(spark, path).collect()}
    assert not bad[int(m.loc[0, "shard"])].docs_match


def test_jsonl_shard_export_string_ids_and_empty_shards(spark, tmp_path):
    """Non-bigint ids must roundtrip via the meta table (a hardcoded
    reader schema would silently NULL them), and a shard count larger
    than the corpus yields manifest rows with n_docs=0 for every
    empty shard — the fixed-count contract — with a clean verdict."""
    from finance_etl_system_spark.sources.export import (
        read_jsonl_shards,
        validate_shard_export,
        write_jsonl_shards,
    )

    df = spark.createDataFrame(
        [("doc-a", "alpha beta"), ("doc-b", "gamma")],
        "content_hash string, text string",
    )
    path = str(tmp_path / "exp")
    manifest = write_jsonl_shards(
        df, path, n_shards=8, id_col="content_hash"
    ).collect()
    assert [r.shard for r in manifest] == list(range(8))
    assert sum(r.n_docs for r in manifest) == 2
    assert sum(1 for r in manifest if r.n_docs == 0) == 6

    back = {r.id: r.text for r in read_jsonl_shards(spark, path).collect()}
    assert back == {"doc-a": "alpha beta", "doc-b": "gamma"}  # ids intact

    verdict = validate_shard_export(spark, path).collect()
    assert len(verdict) == 8
    assert all(r.docs_match and r.chars_match for r in verdict)


# Certification tier (verdict r11 #4; markers registered in
# tests/conftest.py): this module is excluded from the fast tier
# `pytest -m "not certify"` and runs in the full per-round gate.
# Assignment is duration-measured (tools/tier_report.py), not guessed.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.certify
