"""Product quantization (PQ) for embedding compression + ANN search —
the FAISS-style codebook tier (Jégou et al. 2011, public method) that
completes the engine's quantization family (SQ8 scalar quantization in
operators/quantize.py, IVF routing in operators/similarity.py).

Spark-first shapes:

- **Train** (``pq_train``): all m sub-codebooks learn TOGETHER — each
  Lloyd iteration is ONE shuffle-free mapInArrow pass that assigns
  every subvector to its nearest codeword (m vectorized argmins per
  Arrow batch) and folds per-(subspace, codeword) partial sums inside
  the partition; at most m×k rows per partition reach the driver, which
  holds only the (m, k, d/m) codebook tensor (the fused-kmeans contract
  of operators/clustering.py, multiplied across subspaces — never m
  separate training jobs).
- **Encode** (``pq_encode``): one Arrow-batched pandas UDF → m small
  codes per vector (array<int>); 64-dim float vectors compress 32× at
  m=8 (8 bytes of codes vs 256 bytes of floats) — the difference
  between an in-memory and an on-disk corpus at 100 TB.
- **Search** (``pq_topk_adc``): asymmetric distance computation —
  per query ONE (m, k) lookup table of subspace inner products, score =
  Σ_s LUT[s, code_s]; corpus vectors are never reconstructed. The
  mapInArrow kernel emits only each partition's top-k per query
  (np.argpartition), so the global rank runs over k×partitions rows —
  rank-after-limit, same hygiene as functions/frames.ranked_topk.

- **OPQ pretransform** (``opq_rotation`` / ``rotate_vectors``,
  Ge et al. 2013 CVPR, the parametric eigenvalue-allocation variant):
  one covariance pass (d×d partial per partition), driver-side
  eigendecomposition, greedy per-subspace eigenvalue-product
  balancing. Compose as FAISS does (``OPQ<m>,IVF<k>,PQ<m>``):
  ``build_ivf_pq_index(opq=True)`` trains and stores the whole index
  in the rotated space and probes/appends rotate transparently; flat
  PQ callers apply ``rotate_vectors`` to corpus AND queries
  themselves. Lifts the ADC ceiling on anisotropic (real-embedding)
  corpora; provably a no-op in expectation on isotropic fixtures.

Determinism: seeds are the k rows with the smallest (xxhash64(id), id)
— content-addressed, replay-stable, no rand(); ADC scores round to 6dp
with cid tiebreak before ranking; OPQ eigenvector signs are
canonicalized and covariance partials sum in sorted-partition order.

Exactness property pinned by tests: the ADC score of a corpus vector
IS the inner product of the query with the vector's reconstruction
(Σ_s q_s · codeword_s) — bit-for-bit, not approximately.

The reference has no vector tier at all (`/root/reference/spark-job/
etl_job.py` stops at OHLCV rows); this is the X2 extension path.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.confs import partition_overwrite
from .quantize import _round_half_away


@dataclass
class PQModel:
    codebooks: np.ndarray  # (m, k, dsub) float64
    dim: int

    @property
    def m(self) -> int:
        return self.codebooks.shape[0]

    @property
    def k(self) -> int:
        return self.codebooks.shape[1]


def _as_matrix(pdf_col) -> np.ndarray:
    return np.vstack(pdf_col.to_numpy()).astype(np.float64)


def _arrow_matrix(col, d: int, n: int) -> np.ndarray:
    """(n, d) float64 matrix from an Arrow list<double> column — ONE
    flatten over the contiguous values buffer (r13, guide §4.2)
    instead of a per-row ``np.vstack`` over a pandas object column.
    Identical float64 bits to :func:`_as_matrix`. ``n`` must be the
    batch row count: ``flatten()`` silently DROPS null list entries,
    so a ``reshape(-1, d)`` could still succeed with row-shifted data
    (r13 advisor finding); pinning both dims makes any null/ragged
    row fail loudly instead."""
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return np.ascontiguousarray(flat, dtype=np.float64).reshape(n, d)


def _normalize(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=1, keepdims=True)
    n[n == 0.0] = 1.0  # zero vectors stay zero (cosine 0 vs anything)
    return x / n


def _subspaces(x: np.ndarray, m: int) -> np.ndarray:
    n, d = x.shape
    return x.reshape(n, m, d // m)


def _prep(vmat: np.ndarray, pdf, residual_centroids: np.ndarray | None):
    """Unit-normalize; in residual mode (IVF-PQ) subtract the row's
    assigned (normalized) centroid — PQ then codes the residual, which
    is what keeps codes informative inside a coarse cluster."""
    x = _normalize(vmat)
    if residual_centroids is not None:
        x = x - residual_centroids[pdf["_cl"].to_numpy()]
    return x


def _pq_stats_fn(
    codebooks: np.ndarray, residual_centroids: np.ndarray | None = None
):
    """One fused Lloyd iteration across ALL subspaces: per partition,
    assign each subvector to its nearest codeword and fold
    per-(subspace, codeword) (Σx, n) partials. ≤ m×k output rows per
    partition. Runs as ``mapInArrow`` (r13, guide §4.2): same batch
    boundaries as the mapInPandas form it replaces, so the per-batch
    float64 accumulation order — and therefore every partial — is
    bit-identical; only the object-column vstack conversion is gone."""
    import pyarrow as pa

    c = np.ascontiguousarray(codebooks)  # (m, k, dsub)
    m, k, dsub = c.shape
    c_norm2 = (c * c).sum(axis=2)  # (m, k)

    def stats(batches):
        sums = np.zeros((m, k, dsub))
        counts = np.zeros((m, k), dtype=np.int64)
        for b in batches:
            if not b.num_rows:
                continue
            x = _normalize(_arrow_matrix(b.column("_v"), m * dsub, b.num_rows))
            if residual_centroids is not None:
                cl = b.column("_cl").to_numpy(zero_copy_only=False)
                x = x - residual_centroids[cl]
            x = _subspaces(x, m)
            for s in range(m):
                scores = -2.0 * (x[:, s, :] @ c[s].T) + c_norm2[s]
                idx = np.argmin(scores, axis=1)
                onehot = (idx == np.arange(k)[:, None]).astype(np.float64)
                sums[s] += onehot @ x[:, s, :]
                counts[s] += np.bincount(idx, minlength=k)
        nz = counts > 0
        if not nz.any():  # empty partition: emit nothing
            return
        ss, cc = np.nonzero(nz)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(ss.astype(np.int32), pa.int32()),
                pa.array(cc.astype(np.int32), pa.int32()),
                pa.array(list(sums[ss, cc]), pa.list_(pa.float64())),
                pa.array(counts[nz], pa.int64()),
            ],
            names=["sub", "cluster", "s", "n"],
        )

    return stats


def reduce_vector_partials(partials: DataFrame, length: int):
    """Deterministic tree reduce of (pid, float-vector partial, n)
    rows: a 16-lane groupBy/applyInPandas sums each lane in
    sorted-pid order, then the driver sums the ≤16 lane rows in lane
    order — the driver never holds O(scan partitions) state, and the
    summation order is fixed for a fixed input layout (replay-stable
    floats). THE single implementation of this contract — OPQ's
    covariance/Procrustes passes and the quality classifier's
    gradient pass all fold through it (a second hand-kept copy would
    let a lane/order fix silently miss one path)."""

    def lane_sum(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("pid", kind="mergesort")
        s = np.zeros(length)
        for row in pdf["s"]:
            s += np.asarray(row, dtype=np.float64)
        return pd.DataFrame(
            {
                "lane": [int(pdf["lane"].iloc[0])],
                "s": [s],
                "n": [int(pdf["n"].sum())],
            }
        )

    rows = (
        partials.withColumn("lane", F.pmod("pid", F.lit(16)))
        .groupBy("lane")
        .applyInPandas(lane_sum, schema="lane int, s array<double>, n long")
        .collect()
    )
    if not rows:
        raise ValueError("partial reduce: empty input")
    S = np.zeros(length)
    n = 0
    for r in sorted(rows, key=lambda r: r["lane"]):
        S += np.asarray(r["s"], dtype=np.float64)
        n += int(r["n"])
    return S, n


def _reduce_matrix_partials(partials: DataFrame, dim: int):
    """d×d specialization of :func:`reduce_vector_partials`."""
    S, n = reduce_vector_partials(partials, dim * dim)
    return S.reshape(dim, dim), n


def opq_rotation(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int,
    m: int = 8,
    sample_fraction: float | None = None,
) -> np.ndarray:
    """Learn the OPQ-P (parametric) rotation of Ge et al. 2013
    ("Optimized Product Quantization", CVPR): eigendecompose the
    corpus second-moment matrix, then allocate principal directions
    to the m subspaces balancing the per-subspace eigenvalue PRODUCT
    (greedy: next-largest eigenvalue goes to the non-full bucket with
    the smallest log-product). PQ then quantizes independent-ish,
    variance-balanced subspaces instead of arbitrary contiguous
    coordinate blocks — the classic pretransform that lifts the ADC
    ceiling on ANISOTROPIC embedding corpora (isotropic corpora, like
    the synthetic near-orthogonal test fixture, are rotation-
    invariant: expect parity there, not a win — measured in
    tests/test_opq.py both ways).

    Returns R with shape (dim, dim), rows orthonormal; apply as
    ``y = x @ R.T``. Rotation of a raw vector commutes with
    normalization, so it can be applied before or after unit-norm.

    Scale: ONE mapInArrow pass emits a single (pid, d*d partial
    second moment, n) row per partition (d=64 → 32 KB), and a
    16-lane tree reduce (groupBy pmod(pid, 16) → applyInPandas, each
    lane summing its partials in sorted-pid order) folds those to
    ≤16 rows before the collect — the driver never holds
    O(partitions) state, only the d×d matrix (a 100-TB corpus is
    ~10⁶ scan partitions; collecting raw partials would be tens of
    GB). The partial itself grows QUADRATICALLY in the embedding dim
    — at d=4096 each partition row is ~128 MB — so for high-dim
    models pass ``sample_fraction`` (the rotation is a model
    artifact; a seeded row sample estimates the second moment as
    well as the full pass, the standard FAISS practice of training
    the OPQ transform on a subset). Partials are summed in sorted
    (lane, pid) order at both levels and eigenvector signs are
    canonicalized (largest-|component| positive), so the rotation is
    replay-stable for a fixed input layout."""
    assert dim % m == 0, "dim must divide into m equal subspaces"
    if sample_fraction is not None:
        df = df.sample(fraction=sample_fraction, seed=7)

    def moments(batches):
        import pyarrow as pa

        s = np.zeros((dim, dim))
        n = 0
        pid = -1
        for b in batches:
            if not b.num_rows:
                continue
            pid = int(b.column("_pid")[0].as_py())
            x = _normalize(_arrow_matrix(b.column("_v"), dim, b.num_rows))
            s += x.T @ x
            n += len(x)
        if n:
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([pid], pa.int32()),
                    pa.array([s.ravel()], pa.list_(pa.float64())),
                    pa.array([n], pa.int64()),
                ],
                names=["pid", "s", "n"],
            )

    partials = df.select(
        F.spark_partition_id().alias("_pid"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).mapInArrow(moments, schema="pid int, s array<double>, n long")
    S, _n = _reduce_matrix_partials(partials, dim)
    evals, evecs = np.linalg.eigh(S)  # ascending
    order = np.argsort(-evals, kind="stable")
    evals, evecs = evals[order], evecs[:, order]
    # canonical sign: the largest-|component| entry of each vector > 0
    for j in range(dim):
        i = int(np.argmax(np.abs(evecs[:, j])))
        if evecs[i, j] < 0:
            evecs[:, j] = -evecs[:, j]
    dsub = dim // m
    buckets: list[list[int]] = [[] for _ in range(m)]
    logprod = np.zeros(m)
    eps = 1e-12
    for j in range(dim):  # eigenvalues descending
        open_b = [b for b in range(m) if len(buckets[b]) < dsub]
        b = min(open_b, key=lambda b: (logprod[b], b))
        buckets[b].append(j)
        logprod[b] += float(np.log(max(evals[j], eps)))
    perm = [j for b in buckets for j in b]
    return evecs[:, perm].T.copy()  # (dim, dim), rows = axes


def rotate_vectors(
    df: DataFrame, rotation: np.ndarray, *, vec_col: str = "embedding"
) -> DataFrame:
    """Replace ``vec_col`` with its OPQ-rotated form (Arrow-batched
    matmul; the one hot-path Python stage, same class as pq_encode)."""
    R_T = np.ascontiguousarray(rotation.T)

    @F.pandas_udf("array<double>")
    def rot(vecs: pd.Series) -> pd.Series:
        x = _as_matrix(vecs) @ R_T
        return pd.Series(list(x))

    return df.withColumn(vec_col, rot(F.col(vec_col)))


def opq_train_np(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int,
    m: int = 8,
    k: int = 16,
    opq_iters: int = 3,
    inner_pq_iters: int = 4,
    final_pq_iters: int = 8,
    sample_fraction: float | None = None,
) -> tuple[np.ndarray, PQModel | None]:
    """OPQ-NP (Ge et al. 2013, the non-parametric alternating
    variant): initialize R with the parametric eigen-allocation
    rotation, then alternate (a) refresh the PQ codebooks in the
    rotated space, (b) fix the codes and solve the orthogonal
    Procrustes problem min_R Σ‖R·x̂ − recon‖² whose closed form is
    R = V·Uᵀ from the SVD of A = Σ x̂·reconᵀ. Handles data the
    Gaussian-shaped parametric rotation can't (mixtures, sparse or
    heavy-tailed embeddings); each half-step does not increase the
    joint quantization objective, so MSE(NP) ≤ MSE(P) up to k-means
    reseeding noise (pinned in tests/test_opq.py).

    Scale: per iteration ONE extra corpus pass emitting a d×d
    partial per partition (the ADC-assign kernel fused with the
    Procrustes accumulation), tree-reduced like the covariance pass —
    driver state is d×d + the codebook tensor, never O(rows) or
    O(partitions). ``sample_fraction`` trains the transform on a
    seeded subset (the FAISS practice); the FINAL codebooks always
    train on the full ``df`` in the final rotated space.

    Returns ``(R, model)`` — apply ``rotate_vectors(df, R)`` before
    ``pq_encode``; or persist through ``build_ivf_pq_index(opq="np")``.
    ``final_pq_iters=0`` skips the final full-corpus codebook train
    and returns ``(R, None)`` — for callers that only need the
    rotation (build_ivf_pq_index retrains RESIDUAL codebooks in the
    rotated space anyway, so the flat final train would be
    ``final_pq_iters`` pure-waste corpus passes at scale).
    """
    R = opq_rotation(
        df, vec_col=vec_col, dim=dim, m=m, sample_fraction=sample_fraction
    )
    train = (
        df.sample(fraction=sample_fraction, seed=7)
        if sample_fraction is not None
        else df
    )
    # LAZY checkpoint (r13): pq_train's first job on this frame is a
    # global TakeOrdered (its seeds collect), which computes every
    # partition — it doubles as the materialization job, so the
    # separate eager pass was pure overhead. Iterations after the
    # first read the persisted blocks exactly as before.
    train = train.localCheckpoint(eager=False)  # reused every iteration
    for _ in range(opq_iters):
        model = pq_train(
            rotate_vectors(train, R, vec_col=vec_col),
            vec_col=vec_col,
            id_col=id_col,
            dim=dim,
            m=m,
            k=k,
            max_iter=inner_pq_iters,
        )
        c = model.codebooks
        m_, k_, dsub = c.shape
        c_norm2 = (c * c).sum(axis=2)
        R_T = np.ascontiguousarray(R.T)

        def procrustes(batches):
            import pyarrow as pa

            A = np.zeros((dim, dim))
            n = 0
            pid = -1
            for b in batches:
                if not b.num_rows:
                    continue
                pid = int(b.column("_pid")[0].as_py())
                x = _normalize(_arrow_matrix(b.column("_v"), dim, b.num_rows))
                y = _subspaces(x @ R_T, m_)
                recon = np.empty((len(x), dim))
                for s in range(m_):
                    idx = np.argmin(
                        -2.0 * (y[:, s, :] @ c[s].T) + c_norm2[s], axis=1
                    )
                    recon[:, s * dsub : (s + 1) * dsub] = c[s][idx]
                A += x.T @ recon
                n += len(x)
            if n:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array([pid], pa.int32()),
                        pa.array([A.ravel()], pa.list_(pa.float64())),
                        pa.array([n], pa.int64()),
                    ],
                    names=["pid", "s", "n"],
                )

        partials = train.select(
            F.spark_partition_id().alias("_pid"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        ).mapInArrow(procrustes, schema="pid int, s array<double>, n long")
        A, _n = _reduce_matrix_partials(partials, dim)
        # max_R tr(R·A): A = U·S·Vᵀ ⇒ R = V·Uᵀ (unique a.e.; sign
        # flips pair between U and V columns so the product is stable)
        U, _s, Vt = np.linalg.svd(A)
        R = Vt.T @ U.T
    if final_pq_iters <= 0:
        return R, None
    model = pq_train(
        rotate_vectors(df, R, vec_col=vec_col),
        vec_col=vec_col,
        id_col=id_col,
        dim=dim,
        m=m,
        k=k,
        max_iter=final_pq_iters,
    )
    return R, model


def pq_train(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int,
    m: int = 8,
    k: int = 16,
    max_iter: int = 8,
    tol: float = 1e-6,
    cluster_col: str | None = None,
    residual_centroids: np.ndarray | None = None,
) -> PQModel:
    """Learn m sub-codebooks of k codewords over unit-normalized
    vectors (PQ for cosine/IP search). ``dim`` must divide by ``m``.
    Passing ``cluster_col`` + ``residual_centroids`` (the normalized
    coarse-centroid matrix) trains on IVF residuals instead — the
    classic IVF-PQ refinement."""
    assert dim % m == 0, "dim must divide into m equal subspaces"
    cols = [
        F.col(vec_col).cast("array<double>").alias("_v"),
        F.col(id_col).alias("_id"),
    ]
    if cluster_col is not None:
        cols.append(F.col(cluster_col).alias("_cl"))
    src = df.select(*cols)
    seeds = src.orderBy(F.xxhash64("_id"), "_id").limit(k).collect()
    # guard BEFORE vstack: an empty/short input must fail with this
    # message, not numpy's opaque "need at least one array" error
    if len(seeds) < k:
        raise ValueError(f"need >= {k} vectors to seed {k} codewords")
    seed_x = _normalize(
        np.vstack([np.asarray(r["_v"], dtype=np.float64) for r in seeds])
    )
    if residual_centroids is not None:
        seed_x = seed_x - residual_centroids[
            np.asarray([r["_cl"] for r in seeds])
        ]
    codebooks = np.stack(
        [_subspaces(seed_x, m)[:, s, :].copy() for s in range(m)]
    )  # (m, k, dsub)
    data = src.drop("_id")
    for _ in range(max_iter):
        stats = data.mapInArrow(
            _pq_stats_fn(codebooks, residual_centroids),
            schema="sub int, cluster int, s array<double>, n long",
        ).collect()
        new_c = codebooks.copy()
        sums = np.zeros_like(codebooks)
        counts = np.zeros((m, k), dtype=np.int64)
        for r in stats:
            sums[r["sub"], r["cluster"]] += np.asarray(r["s"])
            counts[r["sub"], r["cluster"]] += r["n"]
        nz = counts > 0
        new_c[nz] = sums[nz] / counts[nz][:, None]
        shift = float(np.sqrt(((new_c - codebooks) ** 2).sum(axis=2)).max())
        codebooks = new_c
        if shift < tol:
            break
    return PQModel(codebooks=codebooks, dim=dim)


def pq_encode(
    df: DataFrame,
    model: PQModel,
    *,
    vec_col: str = "embedding",
    cluster_col: str | None = None,
    residual_centroids: np.ndarray | None = None,
) -> DataFrame:
    """Add ``codes``: the m nearest-codeword indices of the
    unit-normalized vector (or of its coarse residual, when
    ``cluster_col`` + ``residual_centroids`` are given) — the
    compressed corpus representation."""
    c = model.codebooks
    m = model.m
    c_norm2 = (c * c).sum(axis=2)
    residual = residual_centroids is not None

    @F.pandas_udf("array<int>")
    def enc(vecs: pd.Series, clusters: pd.Series) -> pd.Series:
        x = _normalize(_as_matrix(vecs))
        if residual:
            x = x - residual_centroids[clusters.to_numpy()]
        x = _subspaces(x, m)
        codes = np.empty((len(x), m), dtype=np.int32)
        for s in range(m):
            codes[:, s] = np.argmin(
                -2.0 * (x[:, s, :] @ c[s].T) + c_norm2[s], axis=1
            )
        return pd.Series(list(codes))

    cl = F.col(cluster_col) if cluster_col is not None else F.lit(0)
    # two-arg pandas UDF + withColumn: only the vector and cluster
    # columns cross the Arrow boundary, everything else stays JVM-side
    return df.withColumn("codes", enc(F.col(vec_col), cl.cast("int")))


def pq_topk_adc(
    codes_df: DataFrame,
    queries: DataFrame,
    model: PQModel,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    rerank_with: DataFrame | None = None,
    rerank: int = 50,
    corpus_vec_col: str = "embedding",
    rerank_queries: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric-distance top-k: queries (driver-sized, same contract
    as the brute-force/LSH paths) become (m, k_codes) inner-product
    LUTs; each corpus partition scores its codes with m table lookups
    per vector and emits only its local top candidates per query
    (np.argpartition), so the global rank runs over candidates ×
    partitions rows. Pure-ADC output: (qid, rnk, cid, score), score =
    q · reconstruction rounded 6dp, cid tiebreak.

    ``rerank_with`` (the original-vector frame) switches to the
    IVF-PQ production pattern: ADC shortlists ``rerank`` candidates
    per query, float vectors are fetched ONLY for the ≤ nq×rerank
    survivors (broadcast semi-join shape — the corpus never
    shuffles), and exact cosine re-ranks the top-``k``. Output gains
    the ``adc`` coarse score next to the exact ``score``.

    ``rerank_queries`` (same (query_id, vec) contract as ``queries``)
    feeds ONLY the exact-rerank side: pass the ORIGINAL-space query
    frame when ``queries`` is OPQ-rotated but ``rerank_with`` is the
    unrotated corpus — cosine is rotation-invariant, so the rerank
    scores match the rotated-space ones while the corpus skips a
    per-probe rotation pass. Defaults to ``queries``."""
    q_rows = queries.select(
        F.col(query_id_col).alias("qid"),
        F.col(query_vec_col).cast("array<double>").alias("qv"),
    ).collect()
    qids = [int(r["qid"]) for r in q_rows]
    qx = _normalize(
        np.vstack([np.asarray(r["qv"], dtype=np.float64) for r in q_rows])
    )
    c = model.codebooks
    m = model.m
    # (nq, m, k_codes): LUT[q, s, j] = q_s · codeword_{s,j}
    luts = np.einsum("qsd,skd->qsk", _subspaces(qx, m), c)
    n_local = rerank if rerank_with is not None else k

    def score(batches):
        import pyarrow as pa

        for b in batches:
            if not b.num_rows:
                continue
            codes = (
                b.column("codes")
                .flatten()
                .to_numpy(zero_copy_only=False)
                .reshape(b.num_rows, m)
            )  # pin both dims: flatten() drops null entries, so -1
            # could silently misalign codes with cids (r13 advisor)
            cids = b.column("_cid").to_numpy(zero_copy_only=False)
            cols = np.arange(m)
            out_q, out_c, out_s = [], [], []
            for qi, qid in enumerate(qids):
                sc = luts[qi][cols, codes].sum(axis=1)  # (n,)
                top = min(n_local, len(sc))
                idx = np.argpartition(-sc, top - 1)[:top]
                out_q.append(np.full(top, qid, dtype=np.int64))
                out_c.append(cids[idx].astype(np.int64))
                out_s.append(_round_half_away(sc[idx], 6))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate(out_q), pa.int64()),
                    pa.array(np.concatenate(out_c), pa.int64()),
                    pa.array(np.concatenate(out_s), pa.float64()),
                ],
                names=["qid", "cid", "score"],
            )

    from pyspark.sql import Window

    local = codes_df.select(
        F.col(id_col).alias("_cid"), "codes"
    ).mapInArrow(score, schema="qid long, cid long, score double")
    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("cid").asc()
    )
    ranked = local.withColumn("rnk", F.row_number().over(w))
    if rerank_with is None:
        return ranked.filter(F.col("rnk") <= k).select(
            "qid", "rnk", "cid", "score"
        )

    from .similarity import _as_double, _dot, _norm

    survivors = ranked.filter(F.col("rnk") <= rerank).select(
        "qid", "cid", F.col("score").alias("adc")
    )
    qv = (rerank_queries if rerank_queries is not None else queries).select(
        F.col(query_id_col).alias("qid"),
        _as_double(F.col(query_vec_col)).alias("qv"),
    )
    cv = rerank_with.select(
        F.col(id_col).alias("cid"),
        _as_double(F.col(corpus_vec_col)).alias("cv"),
    )
    exact = (
        cv.join(F.broadcast(survivors), "cid")
        .join(F.broadcast(qv), "qid")
        .select(
            "qid",
            "cid",
            "adc",
            F.round(
                F.try_divide(
                    _dot(F.col("qv"), F.col("cv")),
                    _norm(F.col("qv")) * _norm(F.col("cv")),
                ),
                6,
            ).alias("score"),
        )
    )
    we = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("cid").asc()
    )
    return (
        exact.withColumn("rnk", F.row_number().over(we))
        .filter(F.col("rnk") <= k)
        .select("qid", "rnk", "cid", "score", "adc")
    )


def build_ivf_pq_index(
    corpus: DataFrame,
    path: str,
    *,
    dim: int,
    k_clusters: int = 8,
    m: int = 16,
    k_codes: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 8,
    opq: bool | str = False,
) -> PQModel:
    """The full FAISS-IVF-PQ composition as a table LAYOUT: coarse
    k-means routing (operators/clustering.py) + residual PQ codes,
    persisted as

    - ``{path}/codes``     (id, codes) parquet PARTITIONED BY
      (batch_id, cluster) — the build is batch 0, appends land as
      their own batch partitions (the IVF vectors-table layout)
    - ``{path}/centroids`` the coarse k×d table (k rows, RAW k-means
      centroids — appends must assign with exactly the build's
      centroids; the query side normalizes at load)
    - ``{path}/codebooks`` the m×k_codes residual codeword table
    - ``{path}/meta``      column/shape contract
    - ``{path}/rotation``  (only with ``opq=True``) the d×d OPQ
      pretransform, one (row, vec) row per output axis; probes and
      appends rotate with it and a compaction never touches it
      (codes-only fold). The AUTHORITATIVE space flag is the meta
      table's ``space`` column ("opq"/"plain"), written LAST as the
      commit marker — rotation-table presence alone is only the
      legacy fallback for indexes built before the column existed

    ``opq=True`` (or ``"p"``) runs the FAISS ``OPQ<m>,IVF<k>,PQ<m>``
    composition with the parametric eigen-allocation rotation;
    ``opq="np"`` refines that rotation with the alternating
    Procrustes iterations (``opq_train_np`` — the flat codebooks it
    trains are discarded; the index retrains RESIDUAL codebooks in
    the final rotated space). Either way the whole index (coarse
    k-means, residuals, codebooks) trains and lives in the rotated
    space; queries rotate at probe time; the exact rerank stays in
    the ORIGINAL space (cosine is rotation-invariant) so callers
    pass their unrotated corpus as always.

    A probe reads an nprobe/k_clusters fraction of a corpus that is
    ALSO 16–32× smaller than the float table (codes, not vectors) —
    the two compressions multiply, which is the whole point of
    IVF-PQ at 100 TB. Float vectors never enter the index; the exact
    rerank joins the caller's corpus table for shortlist survivors
    only."""
    from .clustering import kmeans_assign, kmeans_fit
    from .similarity import _ivf_fs

    spark = corpus.sparkSession
    # NOTHING under ``path`` is touched until every training phase
    # has finished: a failure during the (long) OPQ / k-means / PQ
    # train over an existing index leaves the OLD index fully intact
    # and consistent (review finding r9 — the previous up-front
    # rotation delete could un-flag old rotated codes, so a crashed
    # rebuild would serve UNROTATED probes against rotated codes).
    # Once writes start, a ``_BUILDING`` sentinel guards the
    # inter-table crash windows (r10 review finding: old meta over
    # partly-new tables can MIX SPACES — e.g. plain-meta over freshly
    # rotated codes — and no flag consistency check can see it): the
    # sentinel is created before the first overwrite and removed only
    # after the meta commit, and every reader (probe / append /
    # compact / health / verify) fails loudly while it exists.
    # The entry check alone is check-then-read; probes therefore
    # RE-VALIDATE after materializing their scan
    # (_verify_probe_consistency): marker re-check + meta build_id
    # compare detects a rebuild that started — or even fully
    # committed — inside the probe window, closing the advisor-r10
    # residual race without a maintenance-window convention.
    if opq:
        if opq == "np":
            # final_pq_iters=0: only R is needed — the index retrains
            # RESIDUAL codebooks below; flat final codebooks would be
            # discarded corpus passes (advisor finding r9)
            R, _none = opq_train_np(
                corpus, vec_col=vec_col, id_col=id_col, dim=dim, m=m,
                k=k_codes, final_pq_iters=0,
            )
        else:
            R = opq_rotation(corpus, vec_col=vec_col, dim=dim, m=m)
        corpus = rotate_vectors(corpus, R, vec_col=vec_col)
    else:
        R = None
    coarse = kmeans_fit(
        corpus, vec_col=vec_col, id_col=id_col, k=k_clusters,
        max_iter=max_iter, compute_inertia=False,
    )
    cents_hat = _normalize(np.asarray(coarse.centroids, dtype=np.float64))
    assigned = kmeans_assign(corpus, coarse.centroids, vec_col=vec_col)
    model = pq_train(
        assigned,
        vec_col=vec_col,
        id_col=id_col,
        dim=dim,
        m=m,
        k=k_codes,
        max_iter=max_iter,
        cluster_col="cluster",
        residual_centroids=cents_hat,
    )
    codes = pq_encode(
        assigned,
        model,
        vec_col=vec_col,
        cluster_col="cluster",
        residual_centroids=cents_hat,
    )
    from .similarity import (
        _build_marker,
        _compact_marker,
        _live_append_leases,
    )

    fs, HPath = _ivf_fs(spark, path)
    fs.mkdirs(HPath(path))
    marker = HPath(_build_marker(path))
    if not fs.createNewFile(marker):
        raise RuntimeError(
            f"IVF-PQ index at {path} already has a _BUILDING marker:"
            " another rebuild is running, or a previous one crashed"
            " mid-write (the tables may mix spaces). After confirming"
            " no rebuild is running, delete the marker and rerun — "
            "the same manual-heal protocol as _COMPACTING"
        )
    # the two-flag protocol in the BUILD direction (r10 review): the
    # marker is taken FIRST (fences new appends/compactions), THEN
    # in-flight writers are checked — whichever way a rebuild and an
    # append/compaction interleave, at least one observes the other.
    # Without this, an append racing the rebuild could encode against
    # the OLD model and land its batch in the NEW codes table.
    try:
        if fs.exists(HPath(_compact_marker(path))):
            raise RuntimeError(
                f"IVF-PQ index at {path} is being compacted"
                " (_COMPACTING marker present); rebuild after the"
                " compaction finishes — its directory swap would"
                " promote old-model codes over this build"
            )
        leases = _live_append_leases(fs, HPath, path)
        if leases:
            raise RuntimeError(
                f"IVF-PQ index at {path} has in-flight appends"
                f" ({leases}); rebuild after they finish — a racing"
                " append would land old-model codes in the new table"
            )
    except Exception:
        fs.delete(marker, False)  # back off: leave no stale fence
        raise
    with partition_overwrite(spark, "static"):
        (
            codes.select(
                id_col, "codes", F.lit(0).alias("batch_id"), "cluster"
            )
            .write.mode("overwrite")
            .partitionBy("batch_id", "cluster")
            .parquet(f"{path}/codes")
        )
    raw_cents = np.asarray(coarse.centroids, dtype=np.float64)
    spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(raw_cents)],
        "cluster int, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{path}/centroids")
    cb = model.codebooks
    spark.createDataFrame(
        [
            (s, j, [float(x) for x in cb[s, j]])
            for s in range(m)
            for j in range(k_codes)
        ],
        "sub int, code int, vec array<double>",
    ).write.mode("overwrite").parquet(f"{path}/codebooks")
    if R is not None:
        spark.createDataFrame(
            [(int(i), [float(x) for x in row]) for i, row in enumerate(R)],
            "row int, vec array<double>",
        ).write.mode("overwrite").parquet(f"{path}/rotation")
    # meta LAST — its ``space`` column is the commit marker probes
    # trust; a crash before this line leaves the OLD meta, whose
    # space flag still matches the OLD rotation state. ``build_id``
    # (wall-clock ns — uniqueness is all that matters) lets a probe
    # detect a WHOLE rebuild that started and committed inside its
    # own read window: same-params rebuilds leave every other meta
    # byte identical, and the _BUILDING marker is already gone by the
    # probe's post-scan re-check (_verify_probe_consistency).
    import time as _time

    spark.createDataFrame(
        [(
            id_col, vec_col, int(k_clusters), int(m), int(k_codes),
            int(dim), "opq" if R is not None else "plain",
            int(_time.time_ns()),
        )],
        "id_col string, vec_col string, k_clusters int, m int,"
        " k_codes int, dim int, space string, build_id long",
    ).write.mode("overwrite").parquet(f"{path}/meta")
    if R is None:
        # a plain rebuild over a previous OPQ index: the stale
        # rotation is now inert (meta says plain, _load_rotation
        # ignores it) — removed here only as tidy-up, AFTER the
        # commit marker so a crash in between changes nothing
        rot_path = HPath(f"{path}/rotation")
        if fs.exists(rot_path):
            fs.delete(rot_path, True)
    fs.delete(marker, False)  # commit complete — readers may proceed
    return model


def _check_not_building(spark, path: str) -> None:
    """Fail loudly if a rebuild sentinel exists: between
    build_ivf_pq_index's first overwrite and its meta commit the
    tables can MIX SPACES (rotated codes under a plain meta, or old-R
    codes under new-R rotation) — states no flag-consistency check
    can detect. Every index reader calls this first; probes
    additionally re-validate AFTER their scan
    (_verify_probe_consistency), which closes the check-then-read
    race this entry check alone leaves open."""
    from .similarity import _build_marker, _ivf_fs

    fs, HPath = _ivf_fs(spark, path)
    if fs.exists(HPath(_build_marker(path))):
        raise RuntimeError(
            f"IVF-PQ index at {path} has a _BUILDING marker: a"
            " rebuild is in progress or crashed between table"
            " overwrites — the codes/centroids/rotation/meta tables"
            " may disagree on the vector space. After confirming no"
            " rebuild is running, delete the marker and rerun"
            " build_ivf_pq_index to completion before reading"
        )


def _verify_probe_consistency(spark, path: str, meta_entry: dict) -> None:
    """Close the check-then-read race (advisor r10, verdict r11 #3):
    the entry-time ``_check_not_building`` cannot protect a probe
    whose scan a LATER rebuild overlaps. Called after the probe has
    MATERIALIZED its codes scan (eager localCheckpoint) and before
    its result is returned; raises loudly — the caller retries — if
    any of three interleavings happened mid-probe:

    - a rebuild is in flight NOW (``_BUILDING`` present): the scan
      may have read half-old, half-new tables;
    - a codes compaction is in flight NOW (``_COMPACTING``): the
      directory swap may have doubled or dropped scanned partitions;
    - a whole rebuild started AND committed inside the probe window
      (both markers already gone): detected by comparing the meta
      row — ``build_id`` changes every build even when all
      parameters are identical.

    After this check passes, the returned frame touches no index
    table (the shortlist is checkpointed; the exact rerank joins the
    caller's own corpus frame), so the result is consistent with the
    single generation of the index that was live at entry."""
    from pyspark.errors import AnalysisException

    from ..functions.errors import error_condition
    from .similarity import (
        ProbeRaceError,
        _build_marker,
        _compact_marker,
        _ivf_fs,
    )

    fs, HPath = _ivf_fs(spark, path)
    if fs.exists(HPath(_build_marker(path))):
        raise ProbeRaceError(
            f"IVF-PQ probe at {path} overlapped a rebuild"
            " (_BUILDING appeared during the scan) — the shortlist"
            " may mix old and new tables; retry the probe after the"
            " rebuild finishes"
        )
    if fs.exists(HPath(_compact_marker(path))):
        raise ProbeRaceError(
            f"IVF-PQ probe at {path} overlapped a codes compaction"
            " (_COMPACTING appeared during the scan); retry the"
            " probe after the compaction finishes"
        )
    # Absorb a mid-overwrite meta (advisor r12): a concurrent rebuild
    # between the old meta's delete and the new one's commit makes
    # this read fail with PATH_NOT_FOUND/UNABLE_TO_INFER_SCHEMA or
    # return zero rows — all three mean "meta changed under us",
    # i.e. the retryable race, not a crash (mirrors
    # _verify_ivf_probe_consistency in operators/similarity.py).
    now = None
    try:
        rows = spark.read.parquet(f"{path}/meta").collect()
        now = rows[0].asDict() if rows else None
    except AnalysisException as e:
        if error_condition(e) not in (
            "PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"
        ):
            raise
    if now != meta_entry:
        raise ProbeRaceError(
            f"IVF-PQ probe at {path} overlapped a completed rebuild"
            f" (meta changed during the scan: {meta_entry!r} →"
            f" {now!r}); retry the probe against the new index"
        )


def cosine_topk_ivf_pq(
    spark,
    path: str,
    queries: DataFrame,
    *,
    k: int = 10,
    nprobe: int = 2,
    rerank_with: DataFrame | None = None,
    rerank: int = 50,
    query_id: str = "query_id",
    query_vec_col: str = "embedding",
    corpus_vec_col: str = "embedding",
    verify_consistency: bool = True,
    retries: int = 2,
    _race_hook=None,
) -> DataFrame:
    """Query a persisted IVF-PQ index with bounded self-heal: when
    the post-scan consistency guard detects an overlapping rebuild or
    compaction (``_verify_probe_consistency``), the probe simply
    re-runs — entry re-resolves meta/fences, so the retry reads the
    NEW index generation. Only the 'overlapped' detection retries
    (up to ``retries`` times); a STANDING fence (a ``_BUILDING``
    marker left by a crashed rebuild) raises the manual-heal entry
    error on the next attempt and is never spun on."""
    from .similarity import _retry_on_probe_race

    return _retry_on_probe_race(
        lambda hook: _cosine_topk_ivf_pq_once(
            spark, path, queries, k=k, nprobe=nprobe,
            rerank_with=rerank_with, rerank=rerank, query_id=query_id,
            query_vec_col=query_vec_col, corpus_vec_col=corpus_vec_col,
            verify_consistency=verify_consistency, _race_hook=hook,
        ),
        retries,
        _race_hook,
    )


def _cosine_topk_ivf_pq_once(
    spark,
    path: str,
    queries: DataFrame,
    *,
    k: int = 10,
    nprobe: int = 2,
    rerank_with: DataFrame | None = None,
    rerank: int = 50,
    query_id: str = "query_id",
    query_vec_col: str = "embedding",
    corpus_vec_col: str = "embedding",
    verify_consistency: bool = True,
    _race_hook=None,
) -> DataFrame:
    """Query a persisted IVF-PQ index: route each query to its nprobe
    nearest coarse centroids (broadcast k-row table), push the routed
    cluster ids as a LITERAL partition filter (static pruning — the
    cosine_topk_ivf_index precedent), ADC-score ONLY the probed
    clusters' codes (score = q̂·ĉ_cluster + Σ_s LUT[s, code_s], the
    residual decomposition), shortlist per partition, exact-cosine
    rerank against ``rerank_with`` survivors.

    OPQ indexes (a ``{path}/rotation`` table exists): queries rotate
    into the index's space for routing and ADC; the exact rerank
    keeps the caller's ORIGINAL vectors — cosine is rotation-
    invariant, so the two spaces agree on the final scores."""
    from .similarity import _as_double, _dot, _norm, _route_queries

    _check_not_building(spark, path)
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    meta_entry = meta.asDict()
    id_col, m = meta["id_col"], int(meta["m"])
    R = _load_rotation(spark, path, meta_row=meta)
    cent_rows = (
        spark.read.parquet(f"{path}/centroids").orderBy("cluster").collect()
    )
    # persisted centroids are the RAW k-means means (the append path
    # assigns with them); score offsets and routing want the
    # normalized form — cosine routing is norm-invariant anyway
    cents = _normalize(
        np.vstack(
            [np.asarray(r["centroid"], dtype=np.float64) for r in cent_rows]
        )
    )
    cb_rows = spark.read.parquet(f"{path}/codebooks").collect()
    cb = np.zeros((m, int(meta["k_codes"]), int(meta["dim"]) // m))
    for r in cb_rows:
        cb[r["sub"], r["code"]] = np.asarray(r["vec"], dtype=np.float64)

    q_rows = queries.select(
        F.col(query_id).alias("qid"),
        F.col(query_vec_col).cast("array<double>").alias("qv"),
    ).collect()
    qids = [int(r["qid"]) for r in q_rows]
    qx = _normalize(
        np.vstack([np.asarray(r["qv"], dtype=np.float64) for r in q_rows])
    )
    if R is not None:
        qx = qx @ R.T  # into the index's rotated space
    luts = np.einsum("qsd,skd->qsk", _subspaces(qx, m), cb)
    offsets = qx @ cents.T  # (nq, k_clusters): q̂·ĉ

    centroids_df = spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(cents)],
        "cluster int, centroid array<double>",
    )
    q = queries.select(
        F.col(query_id).alias("qid"),
        _as_double(F.col(query_vec_col)).alias("qv"),
    )
    if R is not None:
        q = rotate_vectors(q, R, vec_col="qv")
    routed = _route_queries(q, centroids_df, nprobe)
    probed = sorted(
        r["cluster"] for r in routed.select("cluster").distinct().collect()
    )
    codes_df = spark.read.parquet(f"{path}/codes").filter(
        F.col("cluster").isin(probed)
    )
    n_local = rerank if rerank_with is not None else k
    qprobes = {
        int(r["qid"]): set() for r in q_rows
    }
    for r in routed.select("qid", "cluster").collect():
        qprobes[int(r["qid"])].add(int(r["cluster"]))
    cols = np.arange(m)

    def score(batches):
        import pyarrow as pa

        for b in batches:
            if not b.num_rows:
                continue
            codes = (
                b.column("codes")
                .flatten()
                .to_numpy(zero_copy_only=False)
                .reshape(b.num_rows, m)
            )
            cids = b.column("_cid").to_numpy(zero_copy_only=False)
            cls = b.column("cluster").to_numpy(zero_copy_only=False)
            out_q, out_c, out_s = [], [], []
            for qi, qid in enumerate(qids):
                mask = np.isin(cls, list(qprobes[qid]))
                if not mask.any():
                    continue
                sc = offsets[qi, cls[mask]] + luts[qi][
                    cols, codes[mask]
                ].sum(axis=1)
                top = min(n_local, len(sc))
                idx = np.argpartition(-sc, top - 1)[:top]
                out_q.append(np.full(top, qid, dtype=np.int64))
                out_c.append(cids[mask][idx].astype(np.int64))
                out_s.append(_round_half_away(sc[idx], 6))
            if out_q:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.concatenate(out_q), pa.int64()),
                        pa.array(np.concatenate(out_c), pa.int64()),
                        pa.array(np.concatenate(out_s), pa.float64()),
                    ],
                    names=["qid", "cid", "score"],
                )

    from pyspark.sql import Window

    if _race_hook is not None:
        _race_hook()  # test seam: the check-then-read window
    local = codes_df.select(
        F.col(id_col).alias("_cid"), "cluster", "codes"
    ).mapInArrow(score, schema="qid long, cid long, score double")
    if verify_consistency:
        # eager: materialize the ONLY scan that touches index tables,
        # then re-check the fences/meta — this closes the
        # check-then-read race (the returned frame only joins caller
        # frames). ``verify_consistency=False`` keeps the frame lazy
        # for plan inspection (the partition-pruning tests); the scan
        # itself is identical either way.
        try:
            local = local.localCheckpoint(eager=True)
        except Exception:
            # the scan failure may itself BE the race (a rebuild
            # replaced the codes files under this probe's listing):
            # attribute it if so — _verify raises the explicit race
            # error — else re-raise the original failure
            _verify_probe_consistency(spark, path, meta_entry)
            raise
        _verify_probe_consistency(spark, path, meta_entry)
    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("cid").asc()
    )
    ranked = local.withColumn("rnk", F.row_number().over(w))
    if rerank_with is None:
        return ranked.filter(F.col("rnk") <= k).select(
            "qid", "rnk", "cid", "score"
        )
    survivors = ranked.filter(F.col("rnk") <= rerank).select(
        "qid", "cid", F.col("score").alias("adc")
    )
    qv = queries.select(
        F.col(query_id).alias("qid"),
        _as_double(F.col(query_vec_col)).alias("qv"),
    )
    cv = rerank_with.select(
        F.col(id_col).alias("cid"),
        _as_double(F.col(corpus_vec_col)).alias("cv"),
    )
    exact = (
        cv.join(F.broadcast(survivors), "cid")
        .join(F.broadcast(qv), "qid")
        .select(
            "qid",
            "cid",
            "adc",
            F.round(
                F.try_divide(
                    _dot(F.col("qv"), F.col("cv")),
                    _norm(F.col("qv")) * _norm(F.col("cv")),
                ),
                6,
            ).alias("score"),
        )
    )
    we = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("cid").asc()
    )
    return (
        exact.withColumn("rnk", F.row_number().over(we))
        .filter(F.col("rnk") <= k)
        .select("qid", "rnk", "cid", "score", "adc")
    )


def _load_rotation(spark, path: str, meta_row=None) -> np.ndarray | None:
    """The OPQ pretransform, if this index has one. The meta table's
    ``space`` column is authoritative: "opq" REQUIRES the rotation
    table (missing ⇒ half-built index, fail loudly rather than serve
    unrotated queries against rotated codes — advisor finding r9);
    "plain" ignores any stale rotation a crashed rebuild left behind.
    Indexes written before the column existed fall back to
    rotation-table presence. Callers that already collected the meta
    row pass it as ``meta_row`` to skip a redundant read+collect
    (r10 review finding)."""
    from .similarity import _ivf_fs

    fs, HPath = _ivf_fs(spark, path)
    if meta_row is None:
        meta_df = spark.read.parquet(f"{path}/meta")
        space = (
            meta_df.collect()[0]["space"]
            if "space" in meta_df.columns
            else None
        )
    else:
        # Row.__contains__ tests VALUES, not field names — go via dict
        space = meta_row.asDict().get("space")
    if space == "plain":
        return None
    has_rot = fs.exists(HPath(f"{path}/rotation"))
    if space == "opq" and not has_rot:
        raise RuntimeError(
            f"IVF-PQ index at {path} is half-built: meta declares"
            " space='opq' but the rotation table is missing —"
            " rebuild with build_ivf_pq_index(opq=...)"
        )
    if not has_rot:
        return None
    rows = spark.read.parquet(f"{path}/rotation").orderBy("row").collect()
    return np.vstack(
        [np.asarray(r["vec"], dtype=np.float64) for r in rows]
    )


def append_to_ivf_pq_index(
    new_vectors: DataFrame,
    path: str,
    *,
    batch_id: int | None = None,
) -> None:
    """Incremental IVF-PQ maintenance — the FAISS add-with-frozen-
    model pattern: new vectors route to their nearest EXISTING coarse
    centroid (same L2 assignment the build used, on the persisted RAW
    centroids) and their residuals encode with the EXISTING codebooks,
    appending as their own ``batch_id`` partition with DYNAMIC
    overwrite — a retried append with the same explicit batch_id
    replaces its own (batch, cluster) partitions instead of
    duplicating (the append_to_ivf_index contract). Centroids and
    codebooks are deliberately NOT retrained per batch: probe routing
    and ADC LUTs must stay stable between retrains. Quantization
    quality decays as the distribution drifts — rebuild on budget,
    the FAISS retrain cadence.

    Mutual exclusion with :func:`compact_ivf_pq_index` is the same
    two-flag protocol as append_to_ivf_index (round 8 — added WITH
    the compaction path, exactly as the IVF vectors index grew its
    fence): the append takes an ``_APPENDING.<token>`` lease BEFORE
    checking ``_COMPACTING``, so whichever way an append and a
    compaction interleave, at least one observes the other and
    refuses. The remaining caller duty is two concurrent
    AUTO-assigned appends racing max+1 to the same batch_id —
    serialize those, or give each writer an explicit batch_id
    namespace (the streaming pattern)."""
    import uuid

    from .similarity import (
        _append_lease,
        _compact_marker,
        _ivf_fs,
    )

    spark = new_vectors.sparkSession
    fs, HPath = _ivf_fs(spark, path)
    lease = HPath(_append_lease(path, uuid.uuid4().hex))
    if not fs.createNewFile(lease):  # pragma: no cover - uuid collision
        raise RuntimeError(f"could not take append lease {lease}")
    try:
        if fs.exists(HPath(_compact_marker(path))):
            raise RuntimeError(
                f"IVF-PQ index at {path} is being compacted "
                "(_COMPACTING marker present); retry the append after "
                "the compaction finishes — a write racing the "
                "directory swap would be silently lost"
            )
        _append_to_ivf_pq_index_locked(
            new_vectors, path, batch_id=batch_id
        )
    finally:
        fs.delete(lease, False)


def _append_to_ivf_pq_index_locked(
    new_vectors: DataFrame,
    path: str,
    *,
    batch_id: int | None = None,
) -> None:
    """Body of append_to_ivf_pq_index, running under its lease."""
    from .clustering import kmeans_assign

    spark = new_vectors.sparkSession
    _check_not_building(spark, path)
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    id_col, vec_col, m = meta["id_col"], meta["vec_col"], int(meta["m"])
    R = _load_rotation(spark, path, meta_row=meta)
    if R is not None:  # OPQ index: append in the index's space
        new_vectors = rotate_vectors(new_vectors, R, vec_col=vec_col)
    cent_rows = (
        spark.read.parquet(f"{path}/centroids").orderBy("cluster").collect()
    )
    raw_cents = np.vstack(
        [np.asarray(r["centroid"], dtype=np.float64) for r in cent_rows]
    )
    cb_rows = spark.read.parquet(f"{path}/codebooks").collect()
    cb = np.zeros((m, int(meta["k_codes"]), int(meta["dim"]) // m))
    for r in cb_rows:
        cb[r["sub"], r["code"]] = np.asarray(r["vec"], dtype=np.float64)
    model = PQModel(codebooks=cb, dim=int(meta["dim"]))
    if batch_id is None:
        from .similarity import IVF_STREAM_BATCH_BASE

        # auto-assign ignores the streaming namespace (>= BASE) so a
        # manual append can never land on a micro-batch's id and
        # dynamic-overwrite-delete its codes — the append_to_ivf_index
        # precedent
        existing = spark.read.parquet(f"{path}/codes").filter(
            F.col("batch_id") < IVF_STREAM_BATCH_BASE
        )
        batch_id = (
            existing.agg(F.max("batch_id").alias("mx")).collect()[0]["mx"]
            or 0
        ) + 1
    assigned = kmeans_assign(new_vectors, raw_cents, vec_col=vec_col)
    codes = pq_encode(
        assigned,
        model,
        vec_col=vec_col,
        cluster_col="cluster",
        residual_centroids=_normalize(raw_cents),
    )
    with partition_overwrite(spark, "dynamic"):
        (
            codes.select(
                id_col, "codes", F.lit(int(batch_id)).alias("batch_id"),
                "cluster",
            )
            .write.mode("overwrite")
            .partitionBy("batch_id", "cluster")
            .parquet(f"{path}/codes")
        )


def compact_ivf_pq_index(
    spark, path: str, deleted_ids: DataFrame | None = None
) -> None:
    """Fold the accumulated append batches of the CODES table back
    into batch 0 (and optionally drop deleted ids) — the segment-
    merge step between retrains, mirroring compact_ivf_index: many
    small (batch_id, cluster) partitions from appends become one
    file set per cluster, restoring scan efficiency without touching
    centroids or codebooks (routing and ADC LUTs stay valid; a
    RETRAIN is build_ivf_pq_index again). Staging + directory-swap:
    the live index is never half-written — a crash leaves the old
    codes tree or the new one.

    SINGLE-WRITER CONTRACT (asserted): takes ``_COMPACTING`` under
    the index root for the whole run; appends raise while it is
    held. After taking the marker it checks for in-flight
    ``_APPENDING.*`` leases and backs off (releasing the marker) if
    any exist — the two-flag protocol's other half. The marker is
    released only on SUCCESS: a failed compaction keeps the index
    fenced; run verify_ivf_pq_index, repair (promote or remove
    ``codes.staging``), then delete ``{path}/_COMPACTING`` to heal.
    Streaming appends: compact only with the stream stopped on a
    committed checkpoint (an uncommitted batch replayed after its
    codes were folded into batch 0 re-adds duplicates — same
    caveat as compact_ivf_index, surfaced as n_duplicate_ids)."""
    from .similarity import (
        _compact_marker,
        _ivf_fs,
        _live_append_leases,
    )
    from .textindex import _swap_dir

    _check_not_building(spark, path)
    fs, HPath = _ivf_fs(spark, path)
    marker = HPath(_compact_marker(path))
    if not fs.createNewFile(marker):
        raise RuntimeError(
            f"IVF-PQ index at {path} already has a _COMPACTING "
            "marker: another compaction is running, or a previous "
            "one failed — verify_ivf_pq_index, repair, then delete "
            "the marker to heal"
        )
    leases = _live_append_leases(fs, HPath, path)
    if leases:
        # back off cleanly: nothing was written, so un-fence
        fs.delete(marker, False)
        raise RuntimeError(
            f"IVF-PQ index at {path} has in-flight append lease(s) "
            f"{leases}; retry the compaction after they finish (a "
            "stale lease from a killed append must be deleted by "
            "the operator — see verify_ivf_pq_index)"
        )
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    id_col = meta["id_col"]
    codes = spark.read.parquet(f"{path}/codes")
    if deleted_ids is not None:
        ids = F.broadcast(
            deleted_ids.select(
                F.col(deleted_ids.columns[0]).alias(id_col)
            ).distinct()
        )
        codes = codes.join(ids, id_col, "left_anti")
    with partition_overwrite(spark, "static"):
        (
            codes.drop("batch_id")
            .select("*", F.lit(0).alias("batch_id"))
            .select(id_col, "codes", "batch_id", "cluster")
            .write.mode("overwrite")
            .partitionBy("batch_id", "cluster")
            .parquet(f"{path}/codes.staging")
        )
    _swap_dir(spark, f"{path}/codes")
    # released on SUCCESS only — a raise above leaves the index fenced
    fs.delete(marker, False)


def verify_ivf_pq_index(spark, path: str) -> dict:
    """Consistency check for the IVF-PQ layout — the verify_ivf_index
    twin, adapted to a codes table. Detects, without repairing:

    - ``bad_cluster_rows``: codes routed outside the centroid range
      (probe-invisible rows);
    - ``bad_code_rows``: code vectors whose length ≠ m or whose
      entries fall outside [0, k_codes) — a codebook/table mismatch
      (e.g. codes written against a different model than the
      persisted codebooks);
    - ``missing_centroids`` / ``missing_codewords``: gaps in the
      contiguous ranges the meta table promises;
    - ``n_duplicate_ids``: ids stored more than once (a replayed
      batch outside its own batch_id partition, or a stream batch
      replayed after a compaction folded it into batch 0);
    - ``stale_compact_marker`` / ``stale_staging_dir`` /
      ``stale_append_leases``: fence residue of a failed compaction
      or a hard-killed append (round 8, with the compaction path —
      same fields as verify_ivf_index).

    One scan of the codes table; all aggregates id- or shape-sized.

    Fence flags are checked BEFORE any table read (r10 review): the
    crashed-mid-rebuild state the ``_BUILDING`` marker exists for can
    leave the meta/codes dirs half-written, and the verifier is
    exactly the tool the heal protocol says to run then — a table
    read that fails while any fence flag is set is reported as
    ``read_error`` in a minimal (inconsistent) report instead of
    raising."""
    from .similarity import (
        _build_marker,
        _compact_marker,
        _ivf_fs,
        _live_append_leases,
    )

    fs, HPath = _ivf_fs(spark, path)
    fences = {
        "stale_compact_marker": bool(
            fs.exists(HPath(_compact_marker(path)))
        ),
        "stale_staging_dir": bool(
            fs.exists(HPath(f"{path}/codes.staging"))
        ),
        "stale_append_leases": _live_append_leases(fs, HPath, path),
        # a rebuild crashed between table overwrites: the tables may
        # MIX SPACES; probes/appends/health refuse while this exists
        "stale_build_marker": bool(
            fs.exists(HPath(_build_marker(path)))
        ),
    }
    fenced = any(bool(v) for v in fences.values())
    try:
        meta = spark.read.parquet(f"{path}/meta").collect()[0]
    except Exception as e:  # noqa: BLE001 — report under a fence
        if fenced:
            return {**fences, "consistent": False,
                    "read_error": repr(e)[:200]}
        raise
    id_col = meta["id_col"]
    k_clusters, m, k_codes = (
        int(meta["k_clusters"]), int(meta["m"]), int(meta["k_codes"])
    )
    try:
        cent_ids = {
            r["cluster"]
            for r in spark.read.parquet(f"{path}/centroids")
            .select("cluster").collect()
        }
        missing_centroids = sorted(set(range(k_clusters)) - cent_ids)
        cb = spark.read.parquet(f"{path}/codebooks")
        have_codewords = {
            (r["sub"], r["code"])
            for r in cb.select("sub", "code").collect()
        }
        missing_codewords = sorted(
            {(s, j) for s in range(m) for j in range(k_codes)}
            - have_codewords
        )
        codes = spark.read.parquet(f"{path}/codes")
        bad_code = (F.size("codes") != m) | F.exists(
            "codes", lambda x: (x < 0) | (x >= k_codes)
        )
        agg = codes.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.col(id_col)).alias("n_ids"),
            F.sum(
                (
                    (F.col("cluster") < 0)
                    | (F.col("cluster") >= k_clusters)
                ).cast("long")
            ).alias("bad_cluster"),
            F.sum(bad_code.cast("long")).alias("bad_code"),
        ).collect()[0]
    except Exception as e:  # noqa: BLE001 — report under a fence
        if fenced:
            return {**fences, "consistent": False,
                    "read_error": repr(e)[:200]}
        raise
    out = {
        "k_clusters": k_clusters,
        "m": m,
        "k_codes": k_codes,
        "n_vectors": int(agg["n"]),
        "bad_cluster_rows": int(agg["bad_cluster"] or 0),
        "bad_code_rows": int(agg["bad_code"] or 0),
        "missing_centroids": missing_centroids,
        "missing_codewords": missing_codewords,
        "n_duplicate_ids": int(agg["n"]) - int(agg["n_ids"]),
        **fences,
    }
    out["consistent"] = (
        out["bad_cluster_rows"] == 0
        and out["bad_code_rows"] == 0
        and not missing_centroids
        and not missing_codewords
        and out["n_duplicate_ids"] == 0
        and not fenced
    )
    return out


def ivf_pq_index_stats(
    spark, path: str, corpus: DataFrame, *, vec_col: str = "embedding"
) -> DataFrame:
    """Retrain-trigger observability for a (possibly appended) IVF-PQ
    index — the ivf_index_stats twin plus QUANTIZATION error: per
    cluster, the vector count, corpus share, and the mean/max L2
    reconstruction error ‖x̂ − (ĉ_cluster + recon(codes))‖ measured
    against the caller's float corpus (the index holds no floats).
    Appends under a frozen model grow reconstruction error as the
    distribution drifts — rebuild when the trend breaks, the FAISS
    retrain cadence. One broadcast-join scan of the codes table; the
    error kernel is a two-column Arrow UDF; output is k rows.

    The join is LEFT from the codes table: index rows whose ids are
    absent from the supplied corpus (an appended batch the caller
    forgot to include) surface as ``n_unmatched`` per cluster with
    null recon errors — exactly the drifted/orphaned rows a health
    report exists to expose, not rows to silently drop.

    OPQ indexes: the caller's float corpus rotates into the index's
    space before the error kernel (the stored centroids/codebooks
    live there)."""
    _check_not_building(spark, path)
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    id_col, m = meta["id_col"], int(meta["m"])
    R = _load_rotation(spark, path, meta_row=meta)
    if R is not None:
        corpus = rotate_vectors(
            corpus.select(F.col(id_col), F.col(vec_col).cast("array<double>")),
            R,
            vec_col=vec_col,
        )
    cent_rows = (
        spark.read.parquet(f"{path}/centroids").orderBy("cluster").collect()
    )
    cents_hat = _normalize(
        np.vstack(
            [np.asarray(r["centroid"], dtype=np.float64) for r in cent_rows]
        )
    )
    cb_rows = spark.read.parquet(f"{path}/codebooks").collect()
    cb = np.zeros((m, int(meta["k_codes"]), int(meta["dim"]) // m))
    for r in cb_rows:
        cb[r["sub"], r["code"]] = np.asarray(r["vec"], dtype=np.float64)

    @F.pandas_udf("double")
    def recon_err(
        vecs: pd.Series, codes: pd.Series, clusters: pd.Series
    ) -> pd.Series:
        # unmatched index rows carry a null vector — keep their error
        # null (they count in n_unmatched, not in the means)
        matched = vecs.notna().to_numpy()
        out = np.full(len(vecs), np.nan)
        if matched.any():
            x = _normalize(_as_matrix(vecs[matched]))
            cd = np.vstack(codes[matched].to_numpy())  # (n, m)
            cl = clusters.to_numpy()[matched]
            recon = cents_hat[cl] + np.concatenate(
                [cb[s][cd[:, s]] for s in range(m)], axis=1
            )
            out[matched] = np.sqrt(((x - recon) ** 2).sum(axis=1))
        return pd.Series(out)

    codes = spark.read.parquet(f"{path}/codes")
    joined = codes.join(
        corpus.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
        ),
        id_col,
        "left",
    ).select(
        "cluster",
        F.col("_v").isNull().alias("_unmatched"),
        recon_err(F.col("_v"), F.col("codes"), F.col("cluster")).alias("err"),
    )
    per = joined.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum(F.col("_unmatched").cast("long")).alias("n_unmatched"),
        F.round(F.avg("err"), 6).alias("mean_recon_err"),
        F.round(F.max("err"), 6).alias("max_recon_err"),
    )
    total = per.agg(F.sum("n_vectors").alias("n_total"))
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            "cluster",
            "n_vectors",
            "n_unmatched",
            F.round(F.col("n_vectors") / F.col("n_total"), 6).alias("share"),
            "mean_recon_err",
            "max_recon_err",
        )
        .orderBy("cluster")
    )
