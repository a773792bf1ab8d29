"""Classifier-based quality filter (operators/quality_classifier.py):
distributed full-batch logistic regression must match a local numpy
reference on the same data, separate planted good/spam corpora, and
replay bit-identically; hashed features are process-independent."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from finance_etl_system_spark.operators.quality_classifier import (
    _token_hash,
    hashed_text_features,
    logreg_score,
    logreg_train,
)

NF = 64
DIM = NF + 1

GOOD_WORDS = ["insight", "analysis", "method", "result", "careful"]
SPAM_WORDS = ["click", "winner", "free", "prize", "buy"]


def _corpus(spark, n=120):
    rows = []
    for i in range(n):
        if i % 2 == 0:
            words = [GOOD_WORDS[(i + j) % 5] for j in range(8)]
            label = 1
        else:
            words = [SPAM_WORDS[(i + j) % 5] for j in range(8)]
            label = 0
        rows.append((i, " ".join(words), label))
    return spark.createDataFrame(
        rows, "doc_id long, text string, label int"
    ).repartition(4, "doc_id")


def test_hash_is_process_independent():
    # pinned constants: a salted/per-process hash would break replay
    assert _token_hash("insight") == _token_hash("insight")
    assert _token_hash("a") != _token_hash("b")
    v = _token_hash("the")
    assert isinstance(v, int) and v >= 0


def test_features_shape_and_norm(spark):
    d = hashed_text_features(
        _corpus(spark, 8), n_features=NF
    ).select("features").collect()
    for r in d:
        x = np.asarray(r["features"])
        assert len(x) == DIM
        assert x[-1] == 1.0  # bias slot
        assert abs(float((x[:-1] ** 2).sum()) - 1.0) < 1e-9


def test_train_matches_local_numpy_and_separates(spark):
    feats = hashed_text_features(_corpus(spark), n_features=NF)
    w = logreg_train(
        feats, dim=DIM, iters=25, lr=1.0, l2=1e-4, label_col="label"
    )
    # local reference: identical GD on the collected matrix
    rows = feats.select("features", "label").collect()
    X = np.vstack([np.asarray(r["features"]) for r in rows])
    y = np.asarray([r["label"] for r in rows], dtype=np.float64)
    wl = np.zeros(DIM)
    for _ in range(25):
        p = 1.0 / (1.0 + np.exp(-(X @ wl)))
        g = X.T @ (p - y) / len(y)
        reg = 1e-4 * wl
        reg[-1] = 0.0  # bias slot is not regularized
        wl = wl - 1.0 * (g + reg)
    assert np.allclose(w, wl, atol=1e-8)
    scored = logreg_score(feats, w).collect()
    acc = np.mean(
        [(r["quality_prob"] > 0.5) == (r["label"] == 1) for r in scored]
    )
    assert acc >= 0.99, acc


def test_train_is_replay_stable(spark):
    feats = hashed_text_features(_corpus(spark), n_features=NF)
    w1 = logreg_train(feats, dim=DIM, iters=10, label_col="label")
    w2 = logreg_train(feats, dim=DIM, iters=10, label_col="label")
    assert np.array_equal(w1, w2)


@pytest.mark.timeout(300)
def test_registry_query_shape(spark):
    import __spark_entry__ as m

    q = m.queries()["quality_classifier_scores"]
    out = q(spark, "/root/testdata/sf0.001").collect()
    assert len(out) == 20
    assert [r["rnk"] for r in out] == list(range(1, 21))
    probs = [r["quality_prob"] for r in out]
    assert probs == sorted(probs, reverse=True)


# Certification tier (verdict r11 #4; markers registered in
# tests/conftest.py): this module is excluded from the fast tier
# `pytest -m "not certify"` and runs in the full per-round gate.
# Assignment is duration-measured (tools/tier_report.py), not guessed.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.certify
