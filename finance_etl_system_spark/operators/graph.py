"""Connected components over a pair table — the step that turns
near-duplicate PAIRS (operators/dedup.py emits (id_a, id_b)) into
dedup CLUSTERS with one canonical representative each.

The reference deduplicates only by exact doc-id upsert (reference
spark-job/etl_job.py:457-459); pair→cluster grouping is part of the
mandated training-data-pipeline tier (SURVEY §2.10 X1).

Algorithm: alternating large-star / small-star (Kiveris et al. 2014,
"Connected Components in MapReduce and Beyond", THM 5.1/5.2) — each
round rewires edges toward per-neighborhood minima:

- **large-star**: every node u sends its strictly-larger neighbors to
  m = min(Γ(u) ∪ {u}); long tails collapse toward small labels in
  halving steps.
- **small-star**: on edges oriented large→small, every node u rewires
  its ≤ neighbors (and itself) to their collective min.

The plain alternation implemented here is proven **O(log² n) rounds
on any graph** (Kiveris et al. prove O(log n) only for their
Two-Phase/optimized variant; logarithmic-in-practice — the 256-node
path fixture converges in ≤12 rounds, pinned in tests/test_graph.py,
and the convergence guard fails loudly if max_iters is ever hit) —
unlike min-label propagation, whose round count is the component
DIAMETER (a 10 000-doc boilerplate chain = 10 000 rounds; the r9
clone-replica pathology that motivated this rewrite is exactly the
long-chain/giant-clique regime). At the fixpoint the edge set is a
union of stars rooted at each component's minimum node id, so labels
read directly off the final edges.

Scale posture (100 TB):
- Each half-round is one groupBy-min + one join over the EDGE table —
  near-dup graphs are sparse (|edges| ≈ |duplicated docs|), so the
  per-round cost is proportional to the duplicate population, not the
  corpus; the round COUNT is now polylogarithmic, not diameter-bounded.
- Lineage is cut every round with an eager localCheckpoint; without it
  the iterative join stacks plans exponentially and the driver OOMs on
  plan compilation long before data is a problem.
- Convergence is detected from the round's edge-rewire delta (an
  aggregate over the edge frame), never a collect of the graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star round over an undirected edge list held as
    BOTH directions (u,v)+(v,u): for every node u, connect each
    strictly-larger neighbor to min(Γ(u) ∪ {u}). Output is again
    both-direction-free: (child > parent) directed pairs."""
    mins = e.groupBy("u").agg(F.min("v").alias("nbr_min"))
    m = mins.select(
        "u", F.least("u", "nbr_min").alias("m")
    )
    return (
        e.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("child"), F.col("m").alias("parent"))
        .filter(F.col("child") != F.col("parent"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round over (child > parent) directed pairs:
    every node u rewires its smaller neighbors AND itself to
    min(Γ≤(u) ∪ {u}). Keeps the (child > parent) orientation."""
    mins = e.groupBy("child").agg(F.min("parent").alias("m"))
    rewired = (
        e.join(mins, "child")
        .filter(F.col("parent") != F.col("m"))
        .select(F.col("parent").alias("child"), F.col("m").alias("parent"))
    )
    self_edges = mins.select(
        F.col("child"), F.col("m").alias("parent")
    )
    return (
        rewired.unionByName(self_edges)
        .filter(F.col("child") != F.col("parent"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    *,
    max_iters: int = 20,
) -> DataFrame:
    """(src, dst) pairs -> (id, label) where label = min node id of the
    component. Only nodes that appear in an edge are returned
    (singletons are trivially their own component and would dominate
    the output at corpus scale).

    Raises if the loop hits ``max_iters`` without converging; the
    star alternation halves label distances in practice (≤12 rounds
    on a 256-node path, pinned), so the default covers any realistic
    corpus — and the guard fails loudly rather than looping if a
    pathological graph ever exceeds it.
    """
    labels, _rounds = _connected_components_with_rounds(
        edges, src, dst, max_iters=max_iters
    )
    return labels


def _connected_components_with_rounds(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    *,
    max_iters: int = 20,
) -> tuple[DataFrame, int]:
    """``connected_components`` plus the number of large+small-star
    rounds it took — the convergence-bound surface the tests pin
    (a diameter-d path must converge in O(log d), not d, rounds)."""
    nodes = (
        edges.select(F.col(src).alias("id"))
        .union(edges.select(F.col(dst).alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # (child > parent) seed orientation; drop self-loops up front
    e = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("child"),
            F.least(F.col(src), F.col(dst)).alias("parent"),
        )
        .filter(F.col("child") != F.col("parent"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    rounds = 0
    for _ in range(max_iters):
        rounds += 1
        undirected = e.union(
            e.select(
                F.col("parent").alias("child"),
                F.col("child").alias("parent"),
            )
        ).selectExpr("child as u", "parent as v")
        new_e = _small_star(_large_star(undirected)).localCheckpoint(
            eager=True
        )
        e = new_e
        # fixpoint test — EXACT and one grouped aggregate (the
        # edge-set-equality exceptAll pair cost two anti-joins per
        # round): with the child>parent orientation, the edge set is
        # a union of DISJOINT STARS iff (a) no node is both a parent
        # and a child and (b) every child has exactly one parent.
        # Stars are fixed points of both operations and the
        # operations preserve connectivity, so star-shaped ⇔ each
        # star is one whole component rooted at its min — exactly the
        # state the label read-off below requires.
        roles = new_e.select(
            F.col("child").alias("n"),
            F.lit(1).alias("c"),
            F.lit(0).alias("p"),
        ).union(
            new_e.select(
                F.col("parent").alias("n"),
                F.lit(0).alias("c"),
                F.lit(1).alias("p"),
            )
        )
        non_star = (
            roles.groupBy("n")
            .agg(F.sum("c").alias("nc"), F.sum("p").alias("np"))
            .filter(
                ((F.col("nc") > 0) & (F.col("np") > 0))
                | (F.col("nc") > 1)
            )
            .count()
        )
        if non_star == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} "
            "rounds; component size exceeds ~2^max_iters nodes"
        )
    # fixpoint edge set is a union of stars rooted at component minima:
    # every non-root points at its root. Nodes absent from the final
    # edges are roots themselves (or were only in self-loop pairs).
    labels = (
        nodes.join(
            e.select(F.col("child").alias("id"), F.col("parent")), "id", "left"
        )
        .select(
            "id", F.coalesce(F.col("parent"), F.col("id")).alias("label")
        )
    )
    return labels, rounds
