"""Streaming classifier gate (streaming/classifier.py): frozen
weights route batches to kept/rejected deterministically, a retried
batch converges to the identical partitions, the audit recomputes
from the sinks, and the end-to-end availableNow stream matches the
batch scorer."""

from __future__ import annotations

import json

import numpy as np
from pyspark.sql import functions as F

from finance_etl_system_spark.operators.quality_classifier import (
    hashed_text_features,
    logreg_score,
    logreg_train,
)
from tests.streamutil import finish
from finance_etl_system_spark.streaming.classifier import (
    classifier_gate_audit,
    classifier_gate_batch,
    stream_classifier_gate,
)

NF = 64
GOOD = "insight analysis method result careful study"
SPAM = "click winner free prize buy now"


def _train_weights(spark):
    rows = [(i, GOOD, 1) for i in range(40)] + [
        (100 + i, SPAM, 0) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    return logreg_train(
        hashed_text_features(df, n_features=NF),
        dim=NF + 1,
        iters=20,
        label_col="label",
    )


def _batches():
    b0 = [{"doc_id": 1, "text": GOOD}, {"doc_id": 2, "text": SPAM}]
    b1 = [
        {"doc_id": 3, "text": GOOD + " extra tail"},
        {"doc_id": 4, "text": SPAM + " again"},
        {"doc_id": 5, "text": GOOD},
    ]
    return [b0, b1]


def test_gate_batch_routes_and_retry_converges(spark, tmp_path):
    w = _train_weights(spark)
    kept, rej = str(tmp_path / "kept"), str(tmp_path / "rej")
    df = spark.createDataFrame(
        [(d["doc_id"], d["text"]) for d in _batches()[1]],
        "doc_id long, text string",
    )
    classifier_gate_batch(df, 7, w, kept, rej, n_features=NF)
    first = sorted(
        tuple(r) for r in spark.read.parquet(kept).collect()
    )
    assert {r[0] for r in first} == {3, 5}
    assert {r.doc_id for r in spark.read.parquet(rej).collect()} == {4}
    # retry of the SAME batch_id rewrites its partition byte-equal
    classifier_gate_batch(df, 7, w, kept, rej, n_features=NF)
    again = sorted(
        tuple(r) for r in spark.read.parquet(kept).collect()
    )
    assert first == again


def test_stream_end_to_end_matches_batch_scorer(spark, tmp_path):
    w = _train_weights(spark)
    src = tmp_path / "src"
    src.mkdir()
    all_docs = []
    for i, docs in enumerate(_batches()):
        (src / f"b{i}.json").write_text(
            "\n".join(json.dumps(d) for d in docs)
        )
        all_docs += docs
    kept = str(tmp_path / "kept")
    rej = str(tmp_path / "rej")
    q = stream_classifier_gate(
        spark, str(src), kept, rej, str(tmp_path / "ckpt"), w,
        n_features=NF,
    )
    finish(q)
    got_kept = {r.doc_id for r in spark.read.parquet(kept).collect()}
    # batch reference: same weights, same threshold
    ref = logreg_score(
        hashed_text_features(
            spark.createDataFrame(
                [(d["doc_id"], d["text"]) for d in all_docs],
                "doc_id long, text string",
            ),
            n_features=NF,
        ),
        w,
    )
    ref_kept = {
        r.doc_id
        for r in ref.filter(F.round("quality_prob", 6) >= 0.5).collect()
    }
    assert got_kept == ref_kept == {1, 3, 5}
    audit = classifier_gate_audit(spark, kept, rej).collect()
    assert sum(r.n_docs for r in audit) == 5
    assert sum(r.n_kept for r in audit) == 3
    for r in audit:
        assert r.n_docs == r.n_kept + r.n_rejected


# Certification tier (verdict r11 #4; markers registered in
# tests/conftest.py): this module is excluded from the fast tier
# `pytest -m "not certify"` and runs in the full per-round gate.
# Assignment is duration-measured (tools/tier_report.py), not guessed.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.certify
