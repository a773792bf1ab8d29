"""Q2/Q11/Q20-shape queries (queries/analytics4.py): semantic
properties recomputed from the raw fixture, plus plan assertions
(broadcast dims, no cartesian blowup)."""

from __future__ import annotations

import pytest

from finance_etl_system_spark.plans.inspect import (
    broadcast_join_count,
    has_cartesian_product,
)
from finance_etl_system_spark.queries.analytics4 import (
    q_excess_qty_suppliers,
    q_important_suppliers,
    q_min_cost_supplier,
)
from tests.conftest import SF_CORRECT, SF_SMOKE


def test_min_cost_supplier_is_argmin_per_part(spark):
    rows = q_min_cost_supplier(spark, SF_SMOKE).collect()
    assert rows, "expected at least one qualifying part"
    # one winner per part
    parts = [r.p_partkey for r in rows]
    assert len(parts) == len(set(parts))
    # the winner's cost really is the minimum for that part among
    # EUROPE suppliers (recomputed independently)
    import duckdb

    con = duckdb.connect()
    truth = dict(
        con.sql(
            f"""
            SELECT l_partkey, MIN(ROUND(l_extendedprice/l_quantity, 2))
            FROM '{SF_SMOKE}/lineitem.parquet'
            JOIN '{SF_SMOKE}/part.parquet' ON l_partkey = p_partkey
            JOIN '{SF_SMOKE}/supplier.parquet' ON l_suppkey = s_suppkey
            JOIN '{SF_SMOKE}/nation.parquet' ON s_nationkey = n_nationkey
            JOIN '{SF_SMOKE}/region.parquet' ON n_regionkey = r_regionkey
            WHERE p_size < 15 AND p_type IN ('SMALL','ECONOMY')
              AND r_name = 'EUROPE'
            GROUP BY l_partkey
            """
        ).fetchall()
    )
    for r in rows:
        assert r.unit_cost == pytest.approx(truth[r.p_partkey])


def test_min_cost_supplier_broadcasts_dims(spark):
    df = q_min_cost_supplier(spark, SF_SMOKE)
    assert broadcast_join_count(df) >= 2
    assert not has_cartesian_product(df)


def test_important_suppliers_threshold_holds(spark):
    # sf0.01: 100 suppliers with ~1 % shares each, so the 1.05 % cut
    # is a real discriminator (at sf0.001 all 10 suppliers pass)
    df = q_important_suppliers(spark, SF_CORRECT)
    rows = df.collect()
    # every selected supplier really holds > 1.05 % of global value
    for r in rows:
        assert r.value_share > 0.0105 - 1e-9
    # and the selection is a strict subset of all suppliers
    from finance_etl_system_spark.catalog import load_table

    n_supp = load_table(spark, SF_CORRECT, "supplier").count()
    assert 0 < len(rows) < n_supp


def test_excess_qty_suppliers_share_recomputed(spark):
    rows = q_excess_qty_suppliers(spark, SF_SMOKE).collect()
    assert rows
    import duckdb

    con = duckdb.connect()
    truth = {
        sk: n
        for sk, n in con.sql(
            f"""
            WITH qty AS (
              SELECT l_partkey, l_suppkey, CAST(SUM(l_quantity) AS BIGINT) AS q
              FROM '{SF_SMOKE}/lineitem.parquet'
              JOIN '{SF_SMOKE}/part.parquet' ON l_partkey = p_partkey
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1997-01-01'
                AND p_name LIKE 'red%'
              GROUP BY 1, 2
            )
            SELECT l_suppkey, COUNT(*) FROM (
              SELECT l_suppkey, q,
                     SUM(q) OVER (PARTITION BY l_partkey) AS tot
              FROM qty) WHERE q * 10 > tot * 3
            GROUP BY 1
            """
        ).fetchall()
    }
    got = {r.s_suppkey: r.n_excess_parts for r in rows}
    assert got == truth


# Certification tier (verdict r11 #4; markers registered in
# tests/conftest.py): this module is excluded from the fast tier
# `pytest -m "not certify"` and runs in the full per-round gate.
# Assignment is duration-measured (tools/tier_report.py), not guessed.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.certify
