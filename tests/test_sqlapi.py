"""Portable raw-SQL queries (queries/sqlapi.py): the SAME string must
run on Spark and DuckDB and agree (the oracle gate hash-checks this at
sf0.01; here we sanity-check structure at smoke scale)."""

from __future__ import annotations

import duckdb

from finance_etl_system_spark.queries.sqlapi import (
    _CUSTOMER_SEGMENTS_SQL,
    _REGION_SHARE_SQL,
    _TABLES,
    q_sql_customer_segments,
    q_sql_region_share,
)
from tests.conftest import SF_SMOKE


def _duck(sql: str):
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    return con.sql(sql).fetchall()


def test_region_share_same_string_both_engines(spark):
    got = [tuple(r) for r in q_sql_region_share(spark, SF_SMOKE).collect()]
    want = _duck(_REGION_SHARE_SQL)
    assert got == want
    # shares within a year sum to ~1
    from collections import defaultdict

    by_year = defaultdict(float)
    for _, yr, _, share, _ in got:
        by_year[yr] += share
    assert all(abs(s - 1.0) < 1e-4 for s in by_year.values())


def test_customer_segments_same_string_both_engines(spark):
    got = [tuple(r) for r in q_sql_customer_segments(spark, SF_SMOKE).collect()]
    want = _duck(_CUSTOMER_SEGMENTS_SQL)
    assert got == want
    assert [r[0] for r in got] == [1, 2, 3, 4]
    # quartile 1 (largest spenders) dominates revenue
    assert got[0][2] >= got[3][2]
