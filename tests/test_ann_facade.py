"""The similarity_search façade (operators/ann.py): every method —
in-session and persisted — must return the SAME (qid, rnk, cid,
score) schema, agree with its underlying kernel, and fail loudly on
missing inputs or unknown options.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finance_etl_system_spark.catalog import load_table
from finance_etl_system_spark.operators.ann import (
    METHODS,
    OUTPUT_COLUMNS,
    similarity_search,
)
from tests.conftest import SF_SMOKE

DIM = 64


@pytest.fixture(scope="module")
def corpus(spark):
    return load_table(spark, SF_SMOKE, "embeddings")


@pytest.fixture(scope="module")
def queries(corpus):
    return corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


@pytest.fixture(scope="module")
def ivf_path(corpus, tmp_path_factory):
    from finance_etl_system_spark.operators.similarity import (
        build_ivf_index,
    )

    p = str(tmp_path_factory.mktemp("ann") / "ivf")
    build_ivf_index(corpus, p, k_clusters=4, id_col="vec_id")
    return p


@pytest.fixture(scope="module")
def ivfpq_path(corpus, tmp_path_factory):
    from finance_etl_system_spark.operators.pq import build_ivf_pq_index

    p = str(tmp_path_factory.mktemp("ann") / "ivfpq")
    build_ivf_pq_index(
        corpus, p, dim=DIM, k_clusters=4, m=16, k_codes=32,
        id_col="vec_id",
    )
    return p


def test_every_method_same_schema(spark, corpus, queries, ivf_path, ivfpq_path):
    kwargs = {
        "brute": dict(corpus=corpus),
        "lsh": dict(corpus=corpus, dim=DIM),
        # probe every label bucket so the identity match is in reach
        # (nprobe=2 of the label buckets can miss a query's own
        # bucket — centroids of label groups aren't the query's NN)
        "ivf": dict(corpus=corpus, nprobe=64),
        "sq8": dict(corpus=corpus),
        "pq": dict(corpus=corpus, dim=DIM),
        "ivf_index": dict(index_path=ivf_path, nprobe=4),
        "ivf_pq_index": dict(
            index_path=ivfpq_path, corpus=corpus, nprobe=4
        ),
    }
    assert set(kwargs) == set(METHODS)
    for method, kw in kwargs.items():
        out = similarity_search(queries, method=method, k=5, **kw)
        assert out.columns == OUTPUT_COLUMNS, method
        rows = out.collect()
        assert rows, method
        by_q: dict[int, list] = {}
        for r in rows:
            by_q.setdefault(r["qid"], []).append(r)
        for qid, rs in by_q.items():
            rs.sort(key=lambda r: r["rnk"])
            assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
            assert len(rs) <= 5
            scores = [r["score"] for r in rs]
            assert scores == sorted(scores, reverse=True), (method, qid)
        # self-similarity: every method puts the query itself at rank 1
        # (all are exact or rerank-exact on the identity match)
        top1 = {q: rs[0]["cid"] for q, rs in by_q.items()}
        assert top1 == {q: q for q in by_q}, method


def test_pq_opq_option_same_contract(spark, corpus, queries):
    """method='pq' with opq=True (the FAISS OPQ,PQ composition) keeps
    the façade contract: one schema, rank-dense, self at rank 1 —
    rotation must be invisible to the caller."""
    out = similarity_search(
        queries, method="pq", corpus=corpus, dim=DIM, k=5, opq=True
    )
    assert out.columns == OUTPUT_COLUMNS
    rows = out.collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    top1 = {
        q: min(rs, key=lambda r: r["rnk"])["cid"] for q, rs in by_q.items()
    }
    assert top1 == {q: q for q in by_q}
    # the non-parametric refinement keeps the same contract
    out_np = similarity_search(
        queries, method="pq", corpus=corpus, dim=DIM, k=5, opq="np"
    )
    rows_np = out_np.collect()
    top1_np = {}
    for r in rows_np:
        if r["rnk"] == 1:
            top1_np[r["qid"]] = r["cid"]
    assert top1_np == {q: q for q in top1_np} and top1_np


def test_brute_matches_underlying_kernel(spark, corpus, queries):
    from finance_etl_system_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    via_facade = similarity_search(
        queries, method="brute", corpus=corpus, k=7
    ).collect()
    direct = (
        cosine_topk_bruteforce(queries, corpus, k=7)
        .select("qid", "rnk", "cid", F.col("cosine").alias("score"))
        .collect()
    )
    assert sorted(map(tuple, via_facade)) == sorted(map(tuple, direct))


def test_facade_input_validation(queries, corpus):
    with pytest.raises(ValueError, match="unknown method"):
        similarity_search(queries, method="faiss", corpus=corpus)
    with pytest.raises(ValueError, match="pass corpus="):
        similarity_search(queries, method="brute")
    with pytest.raises(ValueError, match="pass index_path="):
        similarity_search(queries, method="ivf_pq_index", corpus=corpus)
    with pytest.raises(ValueError, match="needs dim="):
        similarity_search(queries, method="pq", corpus=corpus)
    with pytest.raises(TypeError, match="unknown options"):
        similarity_search(
            queries, method="ivf_index", index_path="/nonexistent",
            bogus_knob=1,
        )


def test_ann_method_report_contract(spark):
    """The registry report: brute is its own ground truth (recall
    exactly 1.0), the rerank-exact sq8 path matches it, and the
    approximate tiers land within their documented floors."""
    import __spark_entry__ as m

    rows = {
        r["method"]: r
        for r in m.queries()["ann_method_report"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert set(rows) == {"brute", "lsh", "sq8", "pq", "pq_opq"}
    assert rows["brute"]["recall_avg"] == 1.0
    assert rows["sq8"]["recall_avg"] == 1.0  # rerank-exact
    assert rows["pq"]["recall_avg"] >= 0.9
    assert rows["pq_opq"]["recall_avg"] >= 0.85  # parity band
    assert rows["lsh"]["recall_avg"] >= 0.3  # 16-bit/4-band point
    for r in rows.values():
        assert r["recall_min"] <= r["recall_avg"] <= 1.0


# Certification tier (verdict r11 #4; markers registered in
# tests/conftest.py): this module is excluded from the fast tier
# `pytest -m "not certify"` and runs in the full per-round gate.
# Assignment is duration-measured (tools/tier_report.py), not guessed.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.certify
