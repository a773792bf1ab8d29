"""Portable raw-SQL queries (queries/sqlapi.py): the SAME string must
run on Spark and DuckDB and agree (the oracle gate hash-checks this at
sf0.01; here we sanity-check structure at smoke scale)."""

from __future__ import annotations

import duckdb

from finance_etl_system_spark.queries.sqlapi import (
    _CUSTOMER_SEGMENTS_SCALABLE_SQL,
    _CUSTOMER_SEGMENTS_SQL,
    _REGION_SHARE_SQL,
    _TABLES,
    q_sql_customer_segments,
    q_sql_customer_segments_scalable,
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


def test_scalable_segments_match_ntile_up_to_boundary_ties(spark):
    """The 100x-safe percentile-cut twin (r11): same string both
    engines, same totals as the NTILE showcase, and per-segment
    counts within the quartile-tie slack (segments differ ONLY in
    where spend ties at a cut land — NTILE splits them by o_custkey,
    the cut sends them all to the lower-spend segment)."""
    got = [
        tuple(r)
        for r in q_sql_customer_segments_scalable(spark, SF_SMOKE).collect()
    ]
    assert got == _duck(_CUSTOMER_SEGMENTS_SCALABLE_SQL)
    assert [r[0] for r in got] == [1, 2, 3, 4]
    ntile = [tuple(r) for r in q_sql_customer_segments(spark, SF_SMOKE).collect()]
    # conserved across the segmentation rule: customers and orders
    # exactly; revenue within per-segment 2dp rounding slack
    for col in (1, 3):
        assert sum(r[col] for r in got) == sum(r[col] for r in ntile)
    assert abs(sum(r[2] for r in got) - sum(r[2] for r in ntile)) < 0.05
    # monotone spend bands: segment 1's min >= segment 2's max, etc.
    for hi, lo in zip(got, got[1:]):
        assert hi[4] >= lo[5]  # min_spend(k) >= max_spend(k+1)
    # tie slack only: counts agree within the number of customers
    # that could sit exactly on a cut (conservative: 5% of customers)
    n = sum(r[1] for r in got)
    for g, t in zip(got, ntile):
        assert abs(g[1] - t[1]) <= max(2, n // 20)
