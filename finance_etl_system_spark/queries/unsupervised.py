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

_K = 8
_Q = 4  # principal components kept


def q_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster census after a k-means fit: size and mean squared
    distance per cluster. Seeds are content-addressed (lowest
    (xxhash64(id), id)), so the fit replays identically; per-cluster
    float sums keep run-to-run jitter below the rounding."""
    e = load_table(spark, sf_dir, "embeddings")
    model = kmeans_fit(e, k=_K, max_iter=5)
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


QUERIES = {
    "kmeans_embeddings": q_kmeans_embeddings,
    "pca_embeddings": q_pca_embeddings,
}

ORACLE: dict[str, str] = {}
