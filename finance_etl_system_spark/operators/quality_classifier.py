"""Classifier-based quality filtering — the fastText/logistic tier of
an LLM data pipeline (GPT-3 §appendix A, CCNet, RefinedWeb all gate on
a linear classifier over cheap text features; the heuristic filters in
queries/quality.py are the rule-based tier BELOW this).

The reference has no document pipeline (its scope stops at OHLCV rows,
`/root/reference/spark-job/etl_job.py`); SURVEY §2.10 training-data
extension tier.

Spark-first shapes:

- **Features** (``hashed_text_features``): hashed bag-of-words over
  the repo-wide tokenizer (polynomial rolling hash, pmod into
  ``n_features`` buckets, L2-normalized, +bias slot) — one Arrow
  pandas UDF, no vocabulary object, no shuffle. Hashing replaces the
  vocab lookup a fastText model would broadcast, so the feature step
  has NO driver state at all (the DSIR paper's hashing trick).
- **Train** (``logreg_train``): full-batch gradient descent with L2;
  each iteration is ONE mapInArrow pass emitting a (pid, gradient
  partial, loss partial, n) row per partition, folded through the
  SHARED deterministic 16-lane tree reduce
  (operators/pq.py::reduce_vector_partials — one implementation, so
  a lane/order fix can never miss a path) — the driver holds only
  the (n_features+1) weight vector. ``sample_fraction``
  trains on a seeded subset (classifiers are model artifacts; the
  standard practice at 100 TB).
- **Score** (``logreg_score``): sigmoid(w·x) as an Arrow pandas UDF —
  the per-document keep/drop signal, thresholded downstream like any
  quality column.

Determinism: the feature hash is an explicit polynomial over UTF-8
bytes (no Python ``hash()``, which is per-process salted); gradient
partials sum in sorted (lane, pid) order; GD from a zero init with a
fixed step — bit-identical weights on replay for a fixed input
layout (pinned by test).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .bpe import segment_words

_HASH_P = 1000003  # polynomial base (a prime > 2^8)
_HASH_MOD = (1 << 61) - 1  # Mersenne prime modulus


def _sigmoid(z: np.ndarray) -> np.ndarray:
    """Overflow-safe sigmoid: exp is only ever taken of -|z| (a raw
    1/(1+exp(-z)) overflows for strongly negative margins)."""
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def _token_hash(tok: str) -> int:
    """Deterministic polynomial hash over UTF-8 bytes — replay-stable
    across processes (unlike Python's salted hash())."""
    h = 0
    for b in tok.encode("utf-8"):
        h = (h * _HASH_P + b + 1) % _HASH_MOD
    return h


def hashed_text_features(
    df: DataFrame,
    *,
    text_col: str = "text",
    n_features: int = 256,
    out_col: str = "features",
) -> DataFrame:
    """Add ``out_col``: L2-normalized hashed bag-of-words of size
    ``n_features`` plus a trailing bias slot (always 1.0), as
    array<double>. Tokenization matches the repo-wide rule
    (``bpe.segment_words`` — the Python twin of ws_tokens)."""

    @F.pandas_udf("array<double>")
    def feats(texts: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def one(t):
            v = np.zeros(n_features + 1)
            for w in segment_words(t):
                b = cache.get(w)
                if b is None:
                    b = _token_hash(w) % n_features
                    cache[w] = b
                v[b] += 1.0
            n = math.sqrt(float((v * v).sum()))
            if n > 0:
                v /= n
            v[n_features] = 1.0  # bias AFTER normalization
            return v

        return texts.map(one)

    return df.withColumn(out_col, feats(F.col(text_col)))


def logreg_train(
    df: DataFrame,
    *,
    features_col: str = "features",
    label_col: str = "label",
    dim: int,
    iters: int = 30,
    lr: float = 1.0,
    l2: float = 1e-4,
    penalize_bias: bool = False,
    sample_fraction: float | None = None,
) -> np.ndarray:
    """Full-batch logistic regression: w ← w − lr·(∇NLL/n + l2·w),
    with the TRAILING weight slot excluded from the L2 penalty by
    default — hashed_text_features appends a bias feature there, and
    standard logistic regression does not shrink the intercept
    (advisor finding r9; set ``penalize_bias=True`` for feature
    layouts with no bias slot).
    Returns the weight vector (len = ``dim``, matching the feature
    arrays; hashed_text_features produces dim = n_features + 1).

    One distributed pass per iteration; gradient partials are
    (pid, dim floats, n) rows tree-reduced deterministically. The
    label column must be 0/1."""
    if sample_fraction is not None:
        df = df.sample(fraction=sample_fraction, seed=7)
    # LAZY checkpoint (r13): the first gradient pass below computes
    # every partition and doubles as the materialization job (the
    # kmeans_fit fusion); later iterations read the persisted blocks.
    src = df.select(
        F.col(features_col).alias("_x"),
        F.col(label_col).cast("double").alias("_y"),
    ).localCheckpoint(eager=False)  # scanned every iteration
    w = np.zeros(dim)

    def grad_pass(weights: np.ndarray):
        # mapInArrow (r13, guide §4.2): the (n, dim) feature matrix is
        # ONE zero-copy flatten+reshape per batch instead of a per-row
        # object-column vstack; same batch boundaries, so the float64
        # partials accumulate in the same order — bit-identical.
        def stats(batches):
            import pyarrow as pa

            g = np.zeros(dim)
            loss = 0.0
            n = 0
            pid = -1
            for b in batches:
                if not b.num_rows:
                    continue
                pid = int(b.column("_pid")[0].as_py())
                flat = b.column("_x").flatten().to_numpy(
                    zero_copy_only=False
                )
                x = np.ascontiguousarray(flat, dtype=np.float64).reshape(
                    b.num_rows, dim
                )
                y = b.column("_y").to_numpy(zero_copy_only=False).astype(
                    np.float64, copy=False
                )
                z = x @ weights
                p = _sigmoid(z)
                g += x.T @ (p - y)
                # numerically-stable NLL: log(1+e^-|z|) + max(z,0) - z*y
                loss += float(
                    (np.log1p(np.exp(-np.abs(z))) + np.maximum(z, 0) - z * y)
                    .sum()
                )
                n += len(y)
            if n:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array([pid], pa.int32()),
                        pa.array([np.append(g, loss)], pa.list_(pa.float64())),
                        pa.array([n], pa.int64()),
                    ],
                    names=["pid", "s", "n"],
                )

        return stats

    from .pq import reduce_vector_partials

    for _ in range(iters):
        partials = src.select(
            F.spark_partition_id().alias("_pid"), "_x", "_y"
        ).mapInArrow(
            grad_pass(w), schema="pid int, s array<double>, n long"
        )
        acc, n = reduce_vector_partials(partials, dim + 1)
        g = acc[:dim] / n
        reg = l2 * w
        if not penalize_bias:
            reg[-1] = 0.0
        w = w - lr * (g + reg)
    return w


def logreg_score(
    df: DataFrame,
    weights: np.ndarray,
    *,
    features_col: str = "features",
    out_col: str = "quality_prob",
) -> DataFrame:
    """Add ``out_col`` = sigmoid(w·x) — the classifier's keep
    probability. Threshold downstream (a keep-rate budget composes
    with operators/sampling.budget_take)."""
    w = np.asarray(weights, dtype=np.float64)

    @F.pandas_udf("double")
    def score(feats: pd.Series) -> pd.Series:
        x = np.vstack(feats.to_numpy()).astype(np.float64)
        return pd.Series(_sigmoid(x @ w))

    return df.withColumn(out_col, score(F.col(features_col)))
