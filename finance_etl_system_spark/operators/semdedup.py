"""Semantic deduplication (SemDeDup, Abbas et al. 2023,
arXiv:2303.09540): cluster embeddings with k-means, then greedily
drop near-duplicate vectors WITHIN each cluster by cosine
similarity. The reference system has no embedding tier at all
(spark-job/etl_job.py is price ETL); this extends SURVEY §2.10 X1/X2
with the standard curation step LLM pipelines run between embedding
and training-set selection.

Why this shape scales: the quadratic cosine pass never crosses a
cluster boundary. With k chosen so clusters hold ~10k-50k vectors
(the paper uses k≈√N·c), each `applyInPandas` group is one
in-memory (n_c × d) matmul — no global all-pairs, no driver data,
and the only shuffle is the groupBy(cluster) hash partition that the
k-means assignment already requires. 100-TB posture: k grows with N,
per-cluster work stays bounded; skewed (oversized) clusters are the
known failure mode, so `max_cluster` caps the matrix and overflow
rows are kept verbatim (never silently dropped) with `overflow=true`
for the audit.

Determinism: k-means seeds are content-addressed (xxhash64, see
operators/clustering.py); the greedy scan orders by
(round(dist2, 9) DESC, vec_id ASC) — the paper's "keep the vector
farthest from the centroid" rule with a unique id tiebreak (rounding
makes float-sum jitter inert) — so the kept set is a pure function
of the input, independent of partitioning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def semantic_dedup(
    assigned: DataFrame,
    *,
    eps: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cluster: int = 100_000,
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
    """
    schema = (
        f"cluster int, {id_col} long, kept boolean, overflow boolean, "
        "max_sim double"
    )

    def dedup_one(pdf: pd.DataFrame) -> pd.DataFrame:
        cluster = int(pdf["cluster"].iloc[0])
        # paper order: farthest-from-centroid first; 9dp rounding
        # absorbs float-sum jitter, vec_id breaks ties uniquely
        pdf = pdf.sort_values(
            ["_d9", id_col], ascending=[False, True]
        ).reset_index(drop=True)
        n = len(pdf)
        if n > max_cluster:
            return pd.DataFrame(
                {
                    "cluster": cluster,
                    id_col: pdf[id_col],
                    "kept": True,
                    "overflow": True,
                    "max_sim": np.nan,
                }
            )
        x = np.vstack(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
        )
        norms = np.linalg.norm(x, axis=1)
        norms[norms == 0.0] = 1.0  # zero vectors: sim 0 to everything
        x = x / norms[:, None]
        sims = x @ x.T  # (n, n); one matmul per cluster
        kept_idx: list[int] = []
        kept = np.zeros(n, dtype=bool)
        max_sim = np.full(n, np.nan)
        for i in range(n):
            if kept_idx:
                s = float(sims[i, kept_idx].max())
                max_sim[i] = s
                if s >= eps:
                    continue
            kept[i] = True
            kept_idx.append(i)
        return pd.DataFrame(
            {
                "cluster": cluster,
                id_col: pdf[id_col],
                "kept": kept,
                "overflow": False,
                "max_sim": max_sim,
            }
        )

    src = assigned.select(
        "cluster",
        F.col(id_col),
        F.col(vec_col),
        F.round(F.col("dist2"), 9).alias("_d9"),
    )
    return src.groupBy("cluster").applyInPandas(dedup_one, schema=schema)
