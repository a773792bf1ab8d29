"""Graph analytics query: weighted PageRank over the nation trade
graph (supplier nation → customer nation, edge weight = lineitem
count). Exercises operators/pagerank.py end-to-end and proves an
ITERATIVE DataFrame algorithm can be oracle-checked exactly: the
integer-arithmetic formulation is bit-deterministic, so the DuckDB
twin simply UNROLLS the same 10 iterations as chained CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.pagerank import RANK_SCALE, W_SCALE, pagerank
from .recursive import _EDGES_CTE

_ITERATIONS = 10

_EDGES_SQL = """
  SELECT sn.n_name AS src, cn.n_name AS dst, CAST(COUNT(*) AS BIGINT) AS w
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  GROUP BY sn.n_name, cn.n_name
"""


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    sn = n.select(
        F.col("n_nationkey").alias("sk"), F.col("n_name").alias("src")
    )
    cn = n.select(
        F.col("n_nationkey").alias("ck"), F.col("n_name").alias("dst")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(sn), s.s_nationkey == sn.sk)
        .join(F.broadcast(cn), c.c_nationkey == cn.ck)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )


def q_nation_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-iteration weighted PageRank over nation→nation trade flows.

    The fact joins broadcast every dim; the heavy work is ONE
    (src, dst) aggregate of the fact table — the iteration itself
    runs on the |nations|² edge frame."""
    pr = pagerank(_trade_edges(spark, sf_dir), iterations=_ITERATIONS)
    return pr.select(
        F.col("node").alias("n_name"),
        F.col("rank").alias("pr_rank"),
        F.round(F.col("rank") / float(RANK_SCALE), 6).alias("pagerank"),
    ).orderBy(F.col("pr_rank").desc(), "n_name")


def _unrolled_pagerank_sql(iterations: int = _ITERATIONS) -> str:
    """The DuckDB twin: identical integer arithmetic, iterations
    unrolled as chained CTEs (recursive CTEs forbid aggregation in
    the recursive member, so unrolling is the portable route)."""
    parts = [
        f"WITH edges0 AS MATERIALIZED ({_EDGES_SQL}),",
        "outw AS MATERIALIZED (SELECT src, CAST(SUM(w) AS BIGINT) AS out_w FROM edges0 GROUP BY src),",
        """nodes AS MATERIALIZED (
  SELECT src AS node FROM edges0 UNION SELECT dst AS node FROM edges0),""",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),",
        f"""edges AS MATERIALIZED (
  SELECT e.src, e.dst, (e.w * {W_SCALE}) // out_w AS wn
  FROM edges0 e JOIN outw USING (src)
),""",
        f"r0 AS MATERIALIZED (SELECT node, {RANK_SCALE} // (SELECT n FROM nn) AS rank FROM nodes),",
    ]
    for k in range(1, iterations + 1):
        parts.append(
            f"""d{k} AS MATERIALIZED (
  SELECT CAST(COALESCE(SUM(rank), 0) AS BIGINT) AS dang
  FROM r{k - 1} WHERE node NOT IN (SELECT src FROM edges)
),
r{k} AS MATERIALIZED (
  SELECT n2.node,
         (15 * {RANK_SCALE}) // (100 * (SELECT n FROM nn))
         + (85 * (COALESCE(SUM((r.rank * e.wn) // {W_SCALE}), 0)
                  + (SELECT dang FROM d{k}) // (SELECT n FROM nn))) // 100 AS rank
  FROM nodes n2
  LEFT JOIN edges e ON e.dst = n2.node
  LEFT JOIN r{k - 1} r ON r.node = e.src
  GROUP BY n2.node
),"""
        )
    last = f"r{iterations}"
    parts[-1] = parts[-1].rstrip(",").rstrip() .rstrip(",")
    # (strip the trailing comma of the final CTE)
    sql = "\n".join(parts)
    if sql.endswith(","):
        sql = sql[:-1]
    sql += f"""
SELECT node AS n_name, CAST(rank AS BIGINT) AS pr_rank,
       ROUND(rank / {float(RANK_SCALE)}, 6) AS pagerank
FROM {last}
ORDER BY pr_rank DESC, n_name
"""
    return sql


# Triangle motif census over the top-3 trade graph (same
# sparsification as queries/recursive.py — scale-invariant out-degree
# 3). Directed 3-cycles a->b->c->a counted once via the minimum-node
# canonical representative; per-node participation reported. One
# portable string: the triple self-join runs ONCE (no recursion, so
# no loop-replan concern), the data-sized step is still only the
# raw_edges fact aggregate.
def _triangle_body(edge_rel: str, hint: str = "") -> str:
    """The tri/member/aggregate body, shared by the portable oracle
    string and the Spark materialized-view variant so the
    canonicalization can never drift between the twins."""
    return f"""
tri AS (
  SELECT {hint}e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM {edge_rel} e1
  JOIN {edge_rel} e2 ON e2.src = e1.dst
  JOIN {edge_rel} e3 ON e3.src = e2.dst AND e3.dst = e1.src
  WHERE e1.src < e2.src AND e1.src < e3.src
),
member AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT node AS n_name, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM member
GROUP BY node
ORDER BY n_triangles DESC, n_name
"""


_TRIANGLES_SQL = f"""
WITH {_EDGES_CTE},
edges AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           ROW_NUMBER() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rk
    FROM raw_edges
  ) t WHERE rk <= 3
),
{_triangle_body("edges")}
"""

_TRI_OVER_VIEW_SQL = f"""
WITH {_triangle_body("tri_edges", hint="/*+ BROADCAST(e2), BROADCAST(e3) */ ")}
"""


def q_trade_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed-triangle census; the oracle runs the single portable
    _TRIANGLES_SQL string.

    Spark inlines a WITH-CTE referenced three times, so the portable
    string would run the fact-join edge derivation once per self-join
    leg (15 exchanges measured). Like the recursive queries, the
    sparsified edge frame is localCheckpointed ONCE and the triple
    join probes the checkpointed view with broadcast hints — one fact
    aggregate, then node-scale work, at any data size."""
    from .recursive import _materialize_edges

    _materialize_edges(spark, sf_dir, dag=False, view="tri_edges")
    return spark.sql(_TRI_OVER_VIEW_SQL)


QUERIES = {
    "nation_pagerank": q_nation_pagerank,
    "trade_triangles": q_trade_triangles,
}
ORACLE = {
    "nation_pagerank": _unrolled_pagerank_sql(),
    "trade_triangles": _TRIANGLES_SQL,
}
