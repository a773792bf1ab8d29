"""Semantic deduplication (SemDeDup, Abbas et al. 2023,
arXiv:2303.09540): cluster embeddings with k-means, then greedily
drop near-duplicate vectors WITHIN each cluster by cosine
similarity. The reference system has no embedding tier at all
(spark-job/etl_job.py is price ETL); this extends SURVEY §2.10 X1/X2
with the standard curation step LLM pipelines run between embedding
and training-set selection.

Why this shape scales: the quadratic cosine pass never crosses a
cluster boundary. With k chosen so clusters hold ~10k-20k vectors
(the paper uses k≈√N·c), each `applyInArrow` group is a sequence of
(block × kept) matmuls — no global all-pairs, no driver data, and
the only shuffle is the groupBy(cluster) hash partition that the
k-means assignment already requires. 100-TB posture: k grows with N,
per-cluster work stays bounded; skewed (oversized) clusters are the
known failure mode, so `max_cluster` caps the pair work and overflow
rows are kept verbatim (never silently dropped) with `overflow=true`
for the audit.

Memory is O(block × kept + n × d), NEVER O(n²): the greedy scan only
ever needs each candidate's similarity to the ALREADY-KEPT set, so
the kernel materializes (block, kept) similarity panels instead of
the full n×n matrix a naive `x @ x.T` builds. At the previous
100k-row cap the naive matrix was 100k² × 8 B = 80 GB in a single
Python task — an executor OOM the cap was supposed to prevent; the
blockwise panel at the same size is ≤ block×n×8 B ≈ 160 MB
(block=1024, n=20k → 160 MB worst case only when everything is
kept). The 20k default cap additionally bounds worst-case pair work
per task at 20k²/2 float ops ≈ 0.2 GFLOP·d — seconds, not minutes.

Determinism: k-means seeds are content-addressed (xxhash64, see
operators/clustering.py); the greedy scan orders by
(round(dist2, 9) DESC, vec_id ASC) — the paper's "keep the vector
farthest from the centroid" rule with a unique id tiebreak (rounding
makes float-sum jitter inert) — so the kept set is a pure function
of the input, independent of partitioning.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _greedy_blockwise(
    x: np.ndarray, eps: float, *, block: int = 1024
) -> tuple[np.ndarray, np.ndarray]:
    """Greedy cosine kept-set over ROW-NORMALIZED vectors ``x``
    (rows already in scan order): keep row i iff its max cosine to
    every already-kept row is < eps. Returns (kept bool[n],
    max_sim float[n] with NaN where no prior row was kept).

    Blockwise so peak extra memory is O(block·kept + block²), never
    n²: each panel holds the current block's similarities to the
    kept-so-far prefix plus the block's internal (block × block)
    self-similarities — rows kept earlier INSIDE the block must also
    suppress later rows of the same block, which is what a pure
    panel-vs-prefix formulation would miss.
    """
    n = x.shape[0]
    kept = np.zeros(n, dtype=bool)
    max_sim = np.full(n, np.nan)
    kept_rows: list[int] = []
    for start in range(0, n, block):
        stop = min(start + block, n)
        xb = x[start:stop]
        # (b, kept_prefix) panel: candidates vs rows kept BEFORE the
        # block. Empty kept set -> no panel.
        panel = xb @ x[kept_rows].T if kept_rows else None
        inner = xb @ xb.T  # (b, b) self panel for within-block kept
        blk_kept: list[int] = []  # block-local indices kept so far
        for j in range(stop - start):
            best = -np.inf
            if panel is not None and panel.shape[1]:
                best = float(panel[j].max())
            if blk_kept:
                best = max(best, float(inner[j, blk_kept].max()))
            if np.isfinite(best):
                max_sim[start + j] = best
                if best >= eps:
                    continue
            kept[start + j] = True
            blk_kept.append(j)
        kept_rows.extend(start + j for j in blk_kept)
    return kept, max_sim


def semantic_dedup(
    assigned: DataFrame,
    *,
    eps: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cluster: int = 20_000,
    block: int = 1024,
) -> DataFrame:
    """Greedy within-cluster cosine dedup over a pre-assigned frame.

    ``assigned`` must carry ``cluster`` and ``dist2`` columns (from
    operators/clustering.kmeans_assign). Returns the input ids plus
    ``kept`` (survived) and ``overflow`` (skipped the cosine pass
    because the cluster exceeded ``max_cluster``) flags.

    Greedy rule (per cluster, in (dist2 DESC, id ASC) order): keep a
    vector iff its max cosine similarity to every ALREADY-KEPT vector
    in the cluster is < eps. eps >= 1+1e-12 keeps everything;
    eps <= -1 keeps exactly the first vector per cluster.

    ``max_cluster`` bounds per-task PAIR WORK (the kernel's memory is
    O(block·kept), see _greedy_blockwise — a cluster at the cap costs
    ~160 MB of panels, not the 80 GB an n×n matrix would); clusters
    over the cap are the retrain-your-kmeans signal and pass through
    kept+flagged.
    """
    schema = (
        f"cluster int, {id_col} long, kept boolean, overflow boolean, "
        "max_sim double"
    )

    def dedup_one(table):
        """One cluster as a pyarrow Table (r13, guide §4.2: the
        applyInPandas form spent most of the pass converting the
        embedding column to a pandas object Series and vstacking it
        back). The (n, d) matrix is ONE zero-copy flatten+reshape of
        the list column's values buffer; the greedy kernel and its
        float64 arithmetic are unchanged. NaN max_sim (no prior kept
        row) is emitted as NULL — exactly what the pandas
        serializer's nan_as_null conversion produced before."""
        import pyarrow as pa

        cluster = table.column("cluster")[0].as_py()
        ids = table.column(id_col).to_numpy(zero_copy_only=False)
        n = len(ids)
        if n > max_cluster:
            return pa.table(
                {
                    "cluster": pa.array(
                        np.full(n, cluster, dtype=np.int32), pa.int32()
                    ),
                    id_col: pa.array(ids, pa.int64()),
                    "kept": pa.array(np.ones(n, dtype=bool)),
                    "overflow": pa.array(np.ones(n, dtype=bool)),
                    "max_sim": pa.nulls(n, pa.float64()),
                }
            )
        d9 = table.column("_d9").to_numpy(zero_copy_only=False)
        # paper order: farthest-from-centroid first; 9dp rounding
        # absorbs float-sum jitter, vec_id breaks ties uniquely
        order = np.lexsort((ids, -d9))
        emb = table.column(vec_col)
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = emb.flatten().to_numpy(zero_copy_only=False)
        x = np.ascontiguousarray(flat, dtype=np.float64).reshape(n, -1)
        x = x[order]
        norms = np.linalg.norm(x, axis=1)
        norms[norms == 0.0] = 1.0  # zero vectors: sim 0 to everything
        x = x / norms[:, None]
        kept, max_sim = _greedy_blockwise(x, eps, block=block)
        return pa.table(
            {
                "cluster": pa.array(
                    np.full(n, cluster, dtype=np.int32), pa.int32()
                ),
                id_col: pa.array(ids[order], pa.int64()),
                "kept": pa.array(kept),
                "overflow": pa.array(np.zeros(n, dtype=bool)),
                "max_sim": pa.array(
                    max_sim, pa.float64(), from_pandas=True
                ),  # from_pandas=True: NaN -> null, as before
            }
        )

    src = assigned.select(
        "cluster",
        F.col(id_col),
        F.col(vec_col),
        F.round(F.col("dist2"), 9).alias("_d9"),
    )
    return src.groupBy("cluster").applyInArrow(dedup_one, schema=schema)
