"""Recursive-CTE traversal (queries/recursive.py): BFS distances must
match a Python BFS over the same sparsified edge list, and the DAG
closure must respect the acyclic restriction and depth bound."""

from __future__ import annotations

from collections import deque

from finance_etl_system_spark.queries.recursive import (
    _EDGES_CTE,
    q_recursive_bfs,
    q_recursive_dag_paths,
)
from tests.conftest import SF_SMOKE


def _top3_edges(spark, sf_dir):
    """The same sparsification the SQL does, recomputed imperatively."""
    from finance_etl_system_spark.catalog import load_table

    for t in ["lineitem", "orders", "supplier", "customer", "nation"]:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    rows = spark.sql(f"WITH {_EDGES_CTE} SELECT * FROM raw_edges").collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.src, []).append((-r.w, r.dst))
    return {
        src: [dst for _, dst in sorted(pairs)[:3]]
        for src, pairs in by_src.items()
    }


def test_bfs_distances_match_python_bfs(spark):
    adj = _top3_edges(spark, SF_SMOKE)
    dist = {"NATION_7": 0}
    q = deque(["NATION_7"])
    while q:
        u = q.popleft()
        if dist[u] >= 4:
            continue
        for v in adj.get(u, []):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    got = {r.n_name: r.hop_dist for r in q_recursive_bfs(spark, SF_SMOKE).collect()}
    assert got == dist


def test_dag_paths_are_acyclic_depth_bounded_and_witnessed(spark):
    rows = q_recursive_dag_paths(spark, SF_SMOKE).collect()
    assert rows, "closure must be non-empty"

    def order_key(name: str):
        return (len(name), name)

    for r in rows:
        # acyclic restriction: every hop ascends the numeric-name order
        hops = r.lex_first_path.split(">")
        assert hops[0] == r.root and hops[-1] == r.node
        assert all(
            order_key(a) < order_key(b) for a, b in zip(hops, hops[1:])
        )
        # witness path length == some enumerated depth ≥ min_depth
        assert 1 <= r.min_depth <= 4
        assert len(hops) - 1 >= r.min_depth
        assert r.n_paths >= 1
