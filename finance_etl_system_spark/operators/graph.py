"""Connected components over a pair table — the step that turns
near-duplicate PAIRS (operators/dedup.py emits (id_a, id_b)) into
dedup CLUSTERS with one canonical representative each.

The reference deduplicates only by exact doc-id upsert (reference
spark-job/etl_job.py:457-459); pair→cluster grouping is part of the
mandated training-data-pipeline tier (SURVEY §2.10 X1).

Algorithm: iterative min-label propagation. Every node starts labeled
with its own id; each round, every node takes the min of its own and
its neighbors' labels; converged when no label changes. Rounds needed
= graph diameter.

Scale posture (100 TB):
- Each round is two shuffles (message join on src, min-groupBy on id)
  over the EDGE table — near-dup graphs are sparse (|edges| ≈
  |duplicated docs|), so the per-round cost is proportional to the
  duplicate population, not the corpus.
- Lineage is cut every round with an eager localCheckpoint; without it
  the iterative join stacks plans exponentially and the driver OOMs on
  plan compilation long before data is a problem.
- Dup clusters have tiny diameters (a near-dup relation is almost
  transitive), so the loop converges in 2-4 rounds. For general graphs
  with long chains the right algorithm is alternating large-star /
  small-star (O(log d) rounds); documented, not implemented, because
  dedup is the engine's use case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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

    Raises if the loop hits ``max_iters`` without converging — a
    truncated propagation would silently mislabel components.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    bidir = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        bidir.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        msgs = bidir.join(labels, bidir.src == labels.id).select(
            F.col("dst").alias("id"), "label"
        )
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.withColumnRenamed("label", "new_label")
            .join(labels, "id")
            .filter(F.col("new_label") != F.col("label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds; "
        "component diameter exceeds the dedup-cluster assumption"
    )
