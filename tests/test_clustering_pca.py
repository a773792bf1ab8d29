"""K-means (operators/clustering.py) and PCA (operators/pca.py):
numerics pinned against numpy ground truth on synthetic data with
known structure, plus the fixture-embedding query entries."""

from __future__ import annotations

import numpy as np
import pytest

import pyspark.sql.functions as F

from finance_etl_system_spark.catalog import load_table
from finance_etl_system_spark.operators.clustering import (
    kmeans_assign,
    kmeans_fit,
)
from finance_etl_system_spark.operators.pca import pca_fit, pca_project
from tests.conftest import SF_SMOKE


def _blobs_df(spark, *, n_per=40, d=4, spread=0.05, seed=3):
    """Three well-separated Gaussian blobs; returns (df, labels)."""
    rng = np.random.RandomState(seed)
    centers = np.array(
        [[5.0, 0.0, 0.0, 0.0], [0.0, 5.0, 0.0, 0.0], [0.0, 0.0, 5.0, 0.0]]
    )[:, :d]
    rows, labels = [], {}
    for b, c in enumerate(centers):
        for i in range(n_per):
            vid = b * n_per + i
            v = (c + spread * rng.randn(d)).tolist()
            rows.append((vid, [float(x) for x in v]))
            labels[vid] = b
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, labels


def test_kmeans_recovers_separated_blobs(spark):
    df, labels = _blobs_df(spark)
    model = kmeans_fit(df, k=3, max_iter=10)
    assigned = kmeans_assign(df, model.centroids)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    # perfect purity: every true blob maps to exactly one fitted cluster
    mapping = {}
    for vid, cl in got.items():
        mapping.setdefault(labels[vid], set()).add(cl)
    assert all(len(cls) == 1 for cls in mapping.values())
    assert len({next(iter(c)) for c in mapping.values()}) == 3
    # centroid shifts are monotone-ish down and the fit converged
    assert model.shifts[-1] <= model.shifts[0]
    # within-cluster SSE ~ n*d*spread^2 = 120*4*0.0025 = 1.2 — far
    # below the between-blob scale (separation 5.0 -> SSE ~ 1000s if
    # blobs were merged)
    assert model.inertia < 3 * 120 * 4 * 0.05**2


def test_kmeans_assignment_matches_numpy_argmin(spark):
    e = load_table(spark, SF_SMOKE, "embeddings").limit(100)
    model = kmeans_fit(e, k=4, max_iter=3)
    got = {
        r["vec_id"]: (r["cluster"], r["dist2"])
        for r in kmeans_assign(e, model.centroids).collect()
    }
    x = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in e.collect()
    }
    for vid, v in x.items():
        d2 = ((model.centroids - v) ** 2).sum(axis=1)
        want = int(np.argmin(d2))
        assert got[vid][0] == want
        assert got[vid][1] == pytest.approx(float(d2[want]), rel=1e-9)


def test_kmeans_feeds_ivf_index(spark):
    """The documented composition: k-means as the IVF coarse
    quantizer (cluster_col for cosine_topk_ivf)."""
    from finance_etl_system_spark.operators.similarity import cosine_topk_ivf

    e = load_table(spark, SF_SMOKE, "embeddings")
    model = kmeans_fit(e, k=4, max_iter=3)
    corpus = kmeans_assign(e, model.centroids)
    q = e.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    out = cosine_topk_ivf(
        q, corpus, k=5, nprobe=2, cluster_col="cluster"
    ).collect()
    assert {r["qid"] for r in out} == {0, 1, 2}
    for qid in (0, 1, 2):
        ranks = sorted(r["rnk"] for r in out if r["qid"] == qid)
        assert ranks == [1, 2, 3, 4, 5]


def test_pca_matches_numpy_eigh(spark):
    """Distributed moment sums reproduce full-batch numpy PCA:
    mean, leading eigenvalues, and (sign-canonical) components."""
    rng = np.random.RandomState(11)
    # anisotropic cloud: variance mostly along a known direction
    base = rng.randn(300, 1) @ np.array([[3.0, 1.0, 0.5, 0.0]])
    noise = 0.1 * rng.randn(300, 4)
    x = base + noise + np.array([1.0, -2.0, 0.0, 3.0])
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    )
    model = pca_fit(df, q=2)
    np.testing.assert_allclose(model.mean, x.mean(axis=0), atol=1e-9)
    cov = np.cov(x, rowvar=False)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    np.testing.assert_allclose(model.explained_var, evals[:2], rtol=1e-9)
    assert model.total_var == pytest.approx(float(np.trace(cov)), rel=1e-9)
    # leading component parallel to the dominant eigenvector
    evec = np.linalg.eigh(cov)[1][:, -1]
    cosang = abs(float(model.components[0] @ evec))
    assert cosang == pytest.approx(1.0, abs=1e-9)
    # partitioning independence (float sums within tolerance)
    model7 = pca_fit(df.repartition(7), q=2)
    np.testing.assert_allclose(
        model7.components, model.components, atol=1e-8
    )


def test_pca_projection_centers_scores(spark):
    df, _ = _blobs_df(spark)
    model = pca_fit(df, q=2)
    proj = pca_project(df, model)
    means = proj.agg(F.avg("pc1"), F.avg("pc2")).collect()[0]
    assert means[0] == pytest.approx(0.0, abs=1e-9)
    assert means[1] == pytest.approx(0.0, abs=1e-9)
    # score variance equals the eigenvalue it explains
    var1 = proj.agg(F.var_samp("pc1")).collect()[0][0]
    assert var1 == pytest.approx(model.explained_var[0], rel=1e-6)


def test_unsupervised_query_entries_run(spark):
    from finance_etl_system_spark.queries.unsupervised import (
        q_kmeans_embeddings,
        q_pca_embeddings,
    )

    km = q_kmeans_embeddings(spark, SF_SMOKE).collect()
    assert 1 <= len(km) <= 8
    assert sum(r["n_vectors"] for r in km) == 500
    pc = q_pca_embeddings(spark, SF_SMOKE).collect()
    assert sum(r["n_vectors"] for r in pc) == 500
    assert "avg_pc4" in pc[0].asDict()


def test_cluster_balanced_sample_quota_and_determinism(spark):
    """Cluster-then-sample: every cluster keeps exactly min(cluster
    size) vectors, kept counts are deterministic across runs and
    partitionings, and totals reconcile with the corpus."""
    from finance_etl_system_spark.catalog import load_table
    from finance_etl_system_spark.queries.unsupervised import (
        q_cluster_balanced_sample,
    )
    from tests.conftest import SF_SMOKE

    rows = q_cluster_balanced_sample(spark, SF_SMOKE).collect()
    assert rows
    quota = rows[0].quota
    assert all(r.quota == quota for r in rows)
    assert all(r.n_kept == quota for r in rows)  # exact per-cluster quota
    assert quota == min(r.n_total for r in rows)
    n_corpus = load_table(spark, SF_SMOKE, "embeddings").count()
    assert sum(r.n_total for r in rows) == n_corpus

    again = q_cluster_balanced_sample(spark, SF_SMOKE).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]
