"""Unsupervised embedding-space queries: distributed k-means and PCA
(operators/clustering.py, operators/pca.py).

Both are iterative/spectral algorithms — not SQL-expressible, so both
are rows-only driver entries; the numerics are pinned against numpy
ground truth in tests/test_clustering_pca.py (cluster recovery on
separated blobs, eigenstructure parity with full-batch PCA,
partitioning-independence within float tolerance).

These are the trainer halves of the ANN tier: k-means supplies the
IVF coarse quantizer (operators/similarity.py::cosine_topk_ivf) and
PCA the dimensionality cut in front of LSH/IVF indexing. The
reference has no unsupervised tier at all (its ML service is
supervised per-symbol regression, ml-service/ml_pipeline.py) — this
extends SURVEY §2.10 X2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.clustering import kmeans_assign, kmeans_fit
from ..operators.pca import pca_fit, pca_project
from ..operators.semdedup import semantic_dedup

_K = 8
_Q = 4  # principal components kept


def q_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster census after a k-means fit: size and mean squared
    distance per cluster. Seeds are content-addressed (lowest
    (xxhash64(id), id)), so the fit replays identically; per-cluster
    float sums keep run-to-run jitter below the rounding."""
    e = load_table(spark, sf_dir, "embeddings")
    model = kmeans_fit(e, k=_K, max_iter=5, compute_inertia=False)
    assigned = kmeans_assign(e, model.centroids)
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("dist2"), 4).alias("avg_dist2"),
        )
        .orderBy("cluster")
    )


def q_pca_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label PCA score summary: project onto the top-4 principal
    axes (one-pass distributed moments, driver-side d×d eigh, sign
    canonicalized) and aggregate scores per label."""
    e = load_table(spark, sf_dir, "embeddings")
    model = pca_fit(e, q=_Q)
    proj = pca_project(e, model)
    return (
        proj.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            *[
                F.round(F.avg(f"pc{i + 1}"), 3).alias(f"avg_pc{i + 1}")
                for i in range(_Q)
            ],
        )
        .orderBy("label")
    )


def q_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-then-sample corpus curation (the standard
    topic-diversity step before pretraining: embed → cluster → keep
    an equal quota per cluster so no dense region of embedding space
    dominates the mix — the semantic sibling of
    data_mix_rebalance's per-language quotas). Every cluster keeps
    exactly ``min(cluster size)`` vectors, chosen by the
    content-independent Knuth hash (stable across runs,
    partitionings, and engines).

    Rows-only (the k-means half is not SQL-expressible); quota
    exactness, determinism, and hash-selection stability are pinned
    in tests/test_clustering_pca.py. Emits the |clusters|-row audit:
    total, quota, kept, kept share — the auditable bookkeeping every
    mix op in this engine ships."""
    e = load_table(spark, sf_dir, "embeddings")
    model = kmeans_fit(e, k=_K, max_iter=5, compute_inertia=False)
    # materialize the assignment ONCE: it feeds both the quota branch
    # and the kept branch — uncached, the corpus-wide distance pass
    # would run twice in one plan
    assigned = (
        kmeans_assign(e, model.centroids)
        .select("vec_id", "cluster")
        .localCheckpoint(eager=True)
    )
    counts = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))
    quota = counts.agg(F.min("n").alias("quota"))
    h = (
        (F.col("vec_id") % F.lit(2147483648)) * F.lit(2654435761)
    ) % F.lit(4294967296)
    from pyspark.sql import Window

    w = Window.partitionBy("cluster").orderBy("h", "vec_id")
    kept = (
        assigned.select("cluster", "vec_id", h.alias("h"))
        .withColumn("rn", F.row_number().over(w))
        .crossJoin(F.broadcast(quota))
        .withColumn("kept", F.col("rn") <= F.col("quota"))
    )
    return (
        kept.groupBy("cluster", "quota")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.col("kept").cast("int")).cast("long").alias("n_kept"),
        )
        .select(
            "cluster",
            "n_total",
            "quota",
            "n_kept",
            F.round(F.col("n_kept") / F.col("n_total"), 6).alias("kept_frac"),
        )
        .orderBy("cluster")
    )


def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup audit (Abbas et al. 2023): k-means the embeddings,
    then greedily drop within-cluster cosine near-duplicates
    (operators/semdedup.py). Emits the per-cluster bookkeeping —
    size, kept, dropped, duplicate fraction — the number a curation
    run reports before committing the pruned corpus.

    Rows-only (iterative k-means half); the greedy kept-set is pinned
    against a numpy reference implementation and partitioning
    independence in tests/test_semdedup.py. eps is tuned to the
    fixtures' near-orthogonal vectors (max pair cosine ≈ 0.51, same
    reason dedup_embedding_cosine runs at 0.4); production semantic
    dedup uses eps ≈ 0.9+.
    """
    e = load_table(spark, sf_dir, "embeddings")
    model = kmeans_fit(e, k=_K, max_iter=5, compute_inertia=False)
    assigned = kmeans_assign(e, model.centroids)
    flags = semantic_dedup(assigned, eps=0.42)
    return (
        flags.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum(F.col("kept").cast("int")).cast("long").alias("n_kept"),
            F.sum((~F.col("kept")).cast("int")).cast("long").alias(
                "n_dropped"
            ),
            F.sum(F.col("overflow").cast("int")).cast("long").alias(
                "n_overflow"
            ),
        )
        .withColumn(
            "dup_frac",
            F.round(F.col("n_dropped") / F.col("n_vectors"), 6),
        )
        .orderBy("cluster")
    )


QUERIES = {
    "kmeans_embeddings": q_kmeans_embeddings,
    "pca_embeddings": q_pca_embeddings,
    "cluster_balanced_sample": q_cluster_balanced_sample,
    "dedup_semantic": q_dedup_semantic,
}

ORACLE: dict[str, str] = {}
