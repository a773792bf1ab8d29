"""Integer-arithmetic PageRank (operators/pagerank.py): must agree
with a float power iteration to the truncation tolerance, conserve
rank mass, and be replay-stable."""

from __future__ import annotations

import numpy as np

from finance_etl_system_spark.operators.pagerank import RANK_SCALE, pagerank
from finance_etl_system_spark.queries.graphq import _trade_edges, q_nation_pagerank
from tests.conftest import SF_SMOKE


def _float_pagerank(edges, iterations=10, damping=0.85):
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    w = np.zeros((n, n))
    for src, dst, weight in edges:
        w[idx[src], idx[dst]] += weight
    out = w.sum(axis=1, keepdims=True)
    p = np.zeros_like(w)
    np.divide(w, out, out=p, where=out > 0)
    dangling = (out[:, 0] == 0)
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        dang_mass = r[dangling].sum()
        r = (1 - damping) / n + damping * (r @ p + dang_mass / n)
    return {node: r[idx[node]] for node in nodes}


def test_pagerank_matches_float_power_iteration(spark):
    edge_rows = [
        (r.src, r.dst, r.w) for r in _trade_edges(spark, SF_SMOKE).collect()
    ]
    truth = _float_pagerank(edge_rows)
    got = {r.node: r.rank / RANK_SCALE for r in
           pagerank(_trade_edges(spark, SF_SMOKE)).collect()}
    assert set(got) == set(truth)
    for node, want in truth.items():
        # integer truncation loses < 1e-5 of mass per op at this scale
        assert abs(got[node] - want) < 1e-4, (node, got[node], want)


def test_pagerank_mass_conserved_and_deterministic(spark):
    ranks = q_nation_pagerank(spark, SF_SMOKE).collect()
    total = sum(r.pr_rank for r in ranks)
    # truncation only ever LOSES mass, and very little of it
    assert RANK_SCALE * 0.999 <= total <= RANK_SCALE
    again = q_nation_pagerank(spark, SF_SMOKE).collect()
    assert [(r.n_name, r.pr_rank) for r in ranks] == [
        (r.n_name, r.pr_rank) for r in again
    ]


def test_trade_triangles_match_python_enumeration(spark):
    """Triangle participation counts must equal a brute-force cycle
    enumeration over the same top-3 edge list."""
    from finance_etl_system_spark.catalog import load_table
    from finance_etl_system_spark.queries.graphq import q_trade_triangles
    from finance_etl_system_spark.queries.recursive import _EDGES_CTE, _TABLES
    for t in _TABLES:
        load_table(spark, SF_SMOKE, t).createOrReplaceTempView(t)
    rows = spark.sql(f"WITH {_EDGES_CTE} SELECT * FROM raw_edges").collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.src, []).append((-r.w, r.dst))
    adj = {s: {d for _, d in sorted(p)[:3]} for s, p in by_src.items()}

    from collections import Counter
    want = Counter()
    for a in adj:
        for b in adj[a]:
            for c in adj.get(b, ()):
                if a in adj.get(c, ()) and a < b and a < c:
                    want[a] += 1; want[b] += 1; want[c] += 1

    got = {r.n_name: r.n_triangles for r in q_trade_triangles(spark, SF_SMOKE).collect()}
    assert got == dict(want)


# Certification tier (verdict r11 #4; markers registered in
# tests/conftest.py): this module is excluded from the fast tier
# `pytest -m "not certify"` and runs in the full per-round gate.
# Assignment is duration-measured (tools/tier_report.py), not guessed.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.certify
