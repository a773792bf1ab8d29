"""Worker-importable test doubles. Classes whose instances end up
pickled inside model blobs must live in an importable module (pickle
serializes them by reference) — a pytest-loaded test module is not
importable from Spark's Python workers."""

from __future__ import annotations

import numpy as np


class FakeLgbmRegressor:
    """Deterministic LightGBM-SHAPED stand-in: the exact sklearn
    contract train_external_per_group adapts (zero-arg-constructible,
    fit(X, y), predict(X), n_estimators attribute, picklable) — the
    library itself is not installable in this container, so this
    pins the adapter CONTRACT the real LGBMRegressor satisfies.
    Model: one split on the first feature's median with per-side
    means — enough nonlinearity to beat OLS on a step group."""

    def __init__(self, n_estimators: int = 25):
        self.n_estimators = n_estimators

    def fit(self, X, y):
        self._split = float(np.median(X[:, 0]))
        lo, hi = y[X[:, 0] <= self._split], y[X[:, 0] > self._split]
        self._lo = float(lo.mean()) if len(lo) else float(y.mean())
        self._hi = float(hi.mean()) if len(hi) else float(y.mean())
        return self

    def predict(self, X):
        return np.where(X[:, 0] <= self._split, self._lo, self._hi)
