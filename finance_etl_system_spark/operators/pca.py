"""Distributed PCA over an embedding column.

Classic N≫d decomposition: the cluster computes the exact sufficient
statistics (n, Σx, ΣxxᵀT) in one pass — partial per Arrow batch via
mapInArrow, reduced by a map-side-combinable (dim_i, dim_j) sum — and
the driver eigendecomposes the d×d covariance (d=64 here; the driver
never holds anything that scales with N). Projection is one
broadcast-matrix pandas-UDF pass, no shuffle.

This is the dimensionality-reduction step in front of the ANN /
dedup tier (operators/similarity.py): a 100 TB embedding table
projected to the top-q components before LSH/IVF cuts both the
signature cost and the index size.

Determinism: the one-pass moment sums are float adds whose grouping
varies with partitioning (like every distributed float sum); outputs
are rounded before comparison. Eigenvector SIGN is canonicalized:
the component with the largest |loading| (lowest index at ties) is
made positive, so runs and engines agree.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class PCAModel:
    mean: np.ndarray            # (d,)
    components: np.ndarray      # (q, d) rows = principal axes
    explained_var: np.ndarray   # (q,) eigenvalues (sample covariance)
    total_var: float            # trace of covariance


def pca_fit(df: DataFrame, *, vec_col: str = "embedding", q: int = 2) -> PCAModel:
    src = df.select(
        F.transform(vec_col, lambda x: x.cast("double")).alias("_v")
    )

    def partial(batches):
        # mapInArrow (r13, guide §4.2): the (n, d) matrix is ONE
        # zero-copy flatten+reshape of the list column instead of a
        # per-row object-column vstack. Same per-batch emission and
        # identical float64 values, so the map-side-combined sums —
        # and the fitted model — are bit-identical to the pandas form.
        import pyarrow as pa

        for b in batches:
            if not b.num_rows:
                continue
            col = b.column(0)
            flat = col.flatten().to_numpy(zero_copy_only=False)
            x = np.ascontiguousarray(flat, dtype=np.float64).reshape(
                b.num_rows, -1
            )
            d = x.shape[1]
            n = np.full(d * d, float(len(x)))
            s = np.tile(x.sum(axis=0), d)  # only first d used downstream
            ss = (x.T @ x).ravel()
            idx = np.arange(d * d)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(idx, pa.int64()),
                    pa.array(n, pa.float64()),
                    pa.array(s[: d * d], pa.float64()),
                    pa.array(ss, pa.float64()),
                ],
                names=["ij", "n", "s", "ss"],
            )

    # (d² rows per batch) -> groupBy(ij).sum: map-side combined, the
    # driver collects exactly d² reduced rows
    stats = (
        src.mapInArrow(partial, "ij long, n double, s double, ss double")
        .groupBy("ij")
        .agg(F.sum("n").alias("n"), F.sum("s").alias("s"), F.sum("ss").alias("ss"))
        .collect()
    )
    d = int(np.sqrt(len(stats)))
    n_total = None
    sum_x = np.zeros(d)
    ss = np.zeros((d, d))
    for r in stats:
        i, j = divmod(int(r["ij"]), d)
        ss[i, j] = r["ss"]
        if i == 0:
            sum_x[j] = r["s"]  # s was tiled; row 0 holds the true Σx
        if n_total is None:
            n_total = r["n"] / d  # n was replicated d² times per batch-row set
    # n replicated per ij: each ij row carries the full batch count
    n_total = float(stats[0]["n"])

    mean = sum_x / n_total
    cov = (ss - n_total * np.outer(mean, mean)) / (n_total - 1.0)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:q]
    comps = evecs[:, order].T  # (q, d)
    # canonical sign: largest-|loading| coordinate positive
    for r_i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[r_i])))
        if comps[r_i, j] < 0:
            comps[r_i] = -comps[r_i]
    return PCAModel(
        mean=mean,
        components=comps,
        explained_var=evals[order],
        total_var=float(np.trace(cov)),
    )


def pca_project(
    df: DataFrame,
    model: PCAModel,
    *,
    vec_col: str = "embedding",
    out_cols: list[str] | None = None,
) -> DataFrame:
    """Append score columns (x − μ)·vᵀ for each component. One
    broadcast pandas-UDF pass; the source column is pruned after."""
    comps = np.ascontiguousarray(model.components)
    mu = model.mean
    names = out_cols or [f"pc{i + 1}" for i in range(comps.shape[0])]
    schema = ", ".join(f"{c}: double" for c in names)

    @F.pandas_udf(f"struct<{schema}>")
    def proj(vecs: pd.Series) -> pd.DataFrame:
        x = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        scores = (x - mu) @ comps.T
        return pd.DataFrame({c: scores[:, i] for i, c in enumerate(names)})

    out = df.withColumn("_p", proj(F.col(vec_col)))
    for c in names:
        out = out.withColumn(c, F.col(f"_p.{c}"))
    return out.drop("_p")
