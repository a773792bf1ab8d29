"""Streaming mixture-budget take (streaming/mixture.py): the budget
invariant must hold across micro-batches (each group's budget binds in
at most one batch, total take in [budget, budget + max_w)), exhausted
groups must take nothing later, and a same-batch_id retry must
converge to the identical partition.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from tests.streamutil import finish
from finance_etl_system_spark.streaming.mixture import (
    mixture_increment_batch,
    stream_mixture_budget,
)

BUDGETS = {"web": 40, "code": 12}


def _doc(doc_id: int, source: str, n_words: int) -> dict:
    return {
        "doc_id": doc_id,
        "source": source,
        "text": " ".join(f"w{i}" for i in range(n_words)),
    }


def _write_batch(src, name: str, docs: list[dict]) -> None:
    src.mkdir(parents=True, exist_ok=True)
    (src / name).write_text("\n".join(json.dumps(d) for d in docs))


def _prepared(spark, docs: list[dict]):
    df = spark.createDataFrame(
        [(d["doc_id"], d["source"], d["text"]) for d in docs],
        "doc_id long, source string, text string",
    )
    return df.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("w"),
        (
            ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761))
            % F.lit(4294967296)
        ).alias("h"),
    )


_KW = dict(
    group_col="source",
    weight_col="w",
    order_col="h",
    tiebreak_col="doc_id",
    budgets=BUDGETS,
)

# three batches of 5-word docs: web supply 25+25+25, code 10+10+10 —
# web's 40-token budget binds in batch 2, code's 12 binds in batch 2
_BATCHES = [
    [_doc(i, "web", 5) for i in range(5)]
    + [_doc(100 + i, "code", 5) for i in range(2)]
    + [_doc(200 + i, "tail", 5) for i in range(2)],  # unlisted: dropped
    [_doc(10 + i, "web", 5) for i in range(5)]
    + [_doc(110 + i, "code", 5) for i in range(2)],
    [_doc(20 + i, "web", 5) for i in range(5)]
    + [_doc(120 + i, "code", 5) for i in range(2)],
]


def test_budget_binds_once_across_batches(spark, tmp_path):
    kept_dir = str(tmp_path / "kept")
    for bid, docs in enumerate(_BATCHES):
        mixture_increment_batch(_prepared(spark, docs), bid, kept_dir, **_KW)
    kept = spark.read.parquet(kept_dir).collect()
    assert {r["source"] for r in kept} == set(BUDGETS)  # 'tail' dropped
    for src, budget in BUDGETS.items():
        total = sum(r["w"] for r in kept if r["source"] == src)
        assert budget <= total < budget + 5  # greedy overrun ≤ one doc
    # once bound, later batches take zero: web bound in batch 1 (25+25
    # ≥ 40), so batch 2 contributes no web rows
    assert not [
        r for r in kept if r["source"] == "web" and r["batch_id"] == 2
    ]


def test_retry_converges_bytewise(spark, tmp_path):
    kept_dir = str(tmp_path / "kept")
    for bid, docs in enumerate(_BATCHES[:2]):
        mixture_increment_batch(_prepared(spark, docs), bid, kept_dir, **_KW)
    snap = sorted(
        tuple(r) for r in spark.read.parquet(kept_dir)
        .select("doc_id", "source", "w", "cum_before", "batch_id").collect()
    )
    # replay batch 1: the carry must exclude batch 1's own first-try
    # rows, so the rewrite is identical
    mixture_increment_batch(
        _prepared(spark, _BATCHES[1]), 1, kept_dir, **_KW
    )
    again = sorted(
        tuple(r) for r in spark.read.parquet(kept_dir)
        .select("doc_id", "source", "w", "cum_before", "batch_id").collect()
    )
    assert snap == again


def test_zero_keep_batch_keeps_state_readable(spark, tmp_path):
    """A batch keeping nothing (all groups unlisted) writes no
    partition — and must not leave a _SUCCESS-only dir that breaks the
    next batch's carry read."""
    kept_dir = str(tmp_path / "kept")
    only_tail = [_doc(500 + i, "tail", 5) for i in range(3)]
    mixture_increment_batch(_prepared(spark, only_tail), 0, kept_dir, **_KW)
    mixture_increment_batch(
        _prepared(spark, _BATCHES[0]), 1, kept_dir, **_KW
    )
    kept = spark.read.parquet(kept_dir).collect()
    assert kept and all(r["batch_id"] == 1 for r in kept)


def test_stream_end_to_end(spark, tmp_path):
    src = tmp_path / "src"
    kept_dir = str(tmp_path / "kept")
    ckpt = str(tmp_path / "ckpt")
    for i, docs in enumerate(_BATCHES):
        _write_batch(src, f"b{i}.json", docs)
    q = stream_mixture_budget(
        spark, str(src), kept_dir, ckpt, budgets=BUDGETS
    )
    finish(q)
    kept = spark.read.parquet(kept_dir).collect()
    for src_name, budget in BUDGETS.items():
        total = sum(r["w"] for r in kept if r["source"] == src_name)
        assert budget <= total < budget + 5
