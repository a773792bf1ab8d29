"""Repeated-substring detection/scrub (operators/substring.py):
planted-boilerplate ground truth, span-merge semantics, within-doc
repeats, the hash128/string key equivalence, and short-doc edges."""

from __future__ import annotations

from tests.streamutil import finish
from finance_etl_system_spark.operators.substring import (
    repeated_spans,
    scrub_repeated_spans,
)

SF_SMOKE = "/root/testdata/sf0.001"

HEADER = "all rights reserved this page is auto generated do not edit"  # 11 words


def _docs(spark):
    """Three docs sharing a 12-word boilerplate header at position 1,
    two unique docs, one short doc. Bodies share no 4-gram."""
    rows = [
        (1, HEADER + " alpha beta gamma delta epsilon zeta"),
        (2, HEADER + " one two three four five six"),
        (3, HEADER + " red green blue cyan magenta yellow"),
        (4, "completely unique body with no repeated phrases here at all"),
        (5, "another singular document whose words never collide with others"),
        (6, "tiny doc"),  # < k tokens: never shingled
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_header_spans_exact(spark):
    spans = repeated_spans(_docs(spark), k=4, min_count=2).collect()
    # only the 3 header docs have spans; each span covers exactly the
    # 11 header tokens (hot grams at starts 1..8 merged: span 1..11)
    assert sorted(r.doc_id for r in spans) == [1, 2, 3]
    for r in spans:
        assert (r.span_start, r.span_end, r.span_tokens) == (1, 11, 11)


def test_scrub_removes_header_keeps_bodies(spark):
    out = {
        r.doc_id: r
        for r in scrub_repeated_spans(_docs(spark), k=4, min_count=2).collect()
    }
    assert out[1].clean_text == "alpha beta gamma delta epsilon zeta"
    assert out[2].clean_text == "one two three four five six"
    assert out[1].dup_tokens == 11 and out[1].n_spans == 1
    assert out[1].dup_ratio == round(11 / 17, 6)
    # untouched docs pass through with the normalized token stream
    assert out[4].dup_tokens == 0 and out[4].n_spans == 0
    assert out[4].clean_text.startswith("completely unique body")
    assert out[6].clean_text == "tiny doc" and out[6].dup_tokens == 0


def test_gap_below_k_merges_single_span(spark):
    # 'p q r s' repeats in both docs at starts 1 and 5 (gap 4 == k):
    # coverage [1,4] and [5,8] touch -> ONE maximal span [1,8]
    rows = [
        (1, "p q r s p q r s tail one two"),
        (2, "p q r s junk filler words p q r s more"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    spans = repeated_spans(d, k=4, min_count=2).collect()
    doc1 = [r for r in spans if r.doc_id == 1]
    assert len(doc1) == 1
    assert (doc1[0].span_start, doc1[0].span_end) == (1, 8)
    # doc 2's two occurrences are 8 apart (> k): two separate spans
    doc2 = sorted((r.span_start, r.span_end) for r in spans if r.doc_id == 2)
    assert doc2 == [(1, 4), (8, 11)]


def test_within_doc_repeat_counts_toward_min_count(spark):
    # the phrase appears twice in ONE doc and nowhere else -> hot
    rows = [
        (1, "x y z w filler x y z w done"),
        (2, "nothing shared with the first document at all okay"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    spans = repeated_spans(d, k=4, min_count=2).collect()
    # both occurrences live in doc 1, 5 apart (> k): two spans there,
    # nothing flagged in doc 2
    got = sorted((r.doc_id, r.span_start, r.span_end) for r in spans)
    assert got == [(1, 1, 4), (1, 6, 9)]


def test_hash128_key_matches_string_key(spark):
    from finance_etl_system_spark.catalog import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    a = {
        (r.doc_id, r.span_start, r.span_end)
        for r in repeated_spans(docs, k=8, min_count=2, key="string").collect()
    }
    b = {
        (r.doc_id, r.span_start, r.span_end)
        for r in repeated_spans(docs, k=8, min_count=2, key="hash128").collect()
    }
    assert a == b and len(a) > 0


# ---- streaming twin (streaming/boilerplate.py) ----

import json as _json
import os

import pytest


def _write_batch(path, rows, mtime):
    path.write_text(
        "\n".join(_json.dumps({"doc_id": d, "text": t}) for d, t in rows)
    )
    os.utime(path, (mtime, mtime))


B1 = [
    (1, "alpha beta gamma delta unique tail one"),
    (2, "totally fresh words nothing shared anywhere today"),
]
B2 = [
    (10, "alpha beta gamma delta fresh ending words"),
    (11, "zz yy xx ww filler zz yy xx ww"),
]


@pytest.mark.timeout(300)
def test_boilerplate_goes_hot_on_second_sight(spark, tmp_path):
    """Arrival-order semantics: a gram seen once in batch 0 and again
    in batch 1 flags batch 1's occurrence only; a within-batch repeat
    flags immediately."""
    from finance_etl_system_spark.streaming.boilerplate import (
        boilerplate_increment_batch,
    )

    verd, counts = str(tmp_path / "verd"), str(tmp_path / "counts")
    d1 = spark.createDataFrame(B1, "doc_id long, text string")
    d2 = spark.createDataFrame(B2, "doc_id long, text string")
    boilerplate_increment_batch(d1, 0, verd, counts, k=4, min_count=2)
    # batch 0: nothing repeated yet -> no verdict dir at all
    assert not os.path.isdir(verd)
    boilerplate_increment_batch(d2, 1, verd, counts, k=4, min_count=2)
    got = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in spark.read.parquet(verd).collect()
    )
    # doc 10 flagged via the cross-batch count; doc 11 via its own
    # within-batch repeat (two spans, 5 apart > k); doc 1 is NOT
    # retroactively rewritten
    assert got == [(10, 1, 4), (11, 1, 4), (11, 6, 9)]


@pytest.mark.timeout(300)
def test_boilerplate_batch_retry_is_idempotent(spark, tmp_path):
    from finance_etl_system_spark.streaming.boilerplate import (
        boilerplate_increment_batch,
    )

    verd, counts = str(tmp_path / "verd"), str(tmp_path / "counts")
    d1 = spark.createDataFrame(B1, "doc_id long, text string")
    d2 = spark.createDataFrame(B2, "doc_id long, text string")
    boilerplate_increment_batch(d1, 0, verd, counts, k=4, min_count=2)
    for _ in range(2):  # second call = the crash-retry
        boilerplate_increment_batch(d2, 1, verd, counts, k=4, min_count=2)
    got = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in spark.read.parquet(verd).collect()
    )
    assert got == [(10, 1, 4), (11, 1, 4), (11, 6, 9)]  # no duplication
    # the count log holds exactly one partition per batch and its
    # merge-by-addition total equals a direct count over the union
    log = spark.read.parquet(counts)
    assert {r.batch_id for r in log.select("batch_id").distinct().collect()} == {0, 1}
    from pyspark.sql import functions as F

    from finance_etl_system_spark.operators.substring import gram_keys

    union = d1.unionByName(d2)
    direct, keys = gram_keys(union, k=4, key="hash128")
    direct = direct.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    merged = log.groupBy(*keys).agg(F.sum("n").alias("n"))
    assert merged.exceptAll(direct).isEmpty()
    assert direct.exceptAll(merged).isEmpty()


@pytest.mark.timeout(600)
def test_stream_boilerplate_end_to_end(spark, tmp_path):
    from finance_etl_system_spark.streaming.boilerplate import (
        stream_boilerplate,
    )

    src = tmp_path / "src"
    src.mkdir()
    _write_batch(src / "b0.json", B1, 1_700_000_000)
    _write_batch(src / "b1.json", B2, 1_700_000_001)
    verd, counts, ckpt = (
        str(tmp_path / d) for d in ("verd", "counts", "ckpt")
    )
    q = stream_boilerplate(
        spark, str(src), verd, counts, ckpt, k=4, min_count=2
    )
    finish(q)
    got = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in spark.read.parquet(verd).collect()
    )
    assert got == [(10, 1, 4), (11, 1, 4), (11, 6, 9)]


def test_spans_from_flagged_matches_interval_merge(spark):
    """Property (hypothesis-style over fixed seeds): the windowed
    gaps-and-islands merge equals a brute-force interval merge of the
    coverage windows [i, i+k-1]."""
    import random

    from finance_etl_system_spark.operators.substring import (
        spans_from_flagged,
    )

    def brute(starts, k):
        ivs = sorted((i, i + k - 1) for i in starts)
        out = []
        for s, e in ivs:
            if out and s <= out[-1][1] + 1:
                out[-1] = (out[-1][0], max(out[-1][1], e))
            else:
                out.append((s, e))
        return out

    rng = random.Random(42)
    for trial in range(8):
        k = rng.choice([2, 4, 8])
        rows = []
        expect = {}
        for doc in range(1, 6):
            starts = sorted(
                rng.sample(range(1, 60), rng.randint(0, 12))
            )
            rows += [(doc, i) for i in starts]
            if starts:
                expect[doc] = brute(starts, k)
        if not rows:
            continue
        flagged = spark.createDataFrame(rows, "doc_id long, i int")
        got = {}
        for r in spans_from_flagged(flagged, k=k).collect():
            got.setdefault(r.doc_id, []).append(
                (r.span_start, r.span_end)
            )
        got = {d: sorted(v) for d, v in got.items()}
        assert got == expect, f"trial {trial} k={k}"


def test_contamination_spans_and_scrub_ground_truth(spark):
    """Planted contamination: a corpus doc quoting an eval passage
    mid-document. Spans must cover exactly the quoted window (every
    position whose 5-gram is an eval 5-gram, merged), the scrub must
    drop exactly those tokens, and hit-free docs pass through."""
    from finance_etl_system_spark.operators.substring import (
        contamination_spans,
        scrub_contamination,
    )

    eval_text = "the quick brown fox jumps over the lazy dog tonight"
    corpus_rows = [
        # quotes eval words 1..9 at positions 4..12 -> flagged gram
        # starts 4..8 (5-grams inside the quote), span 4..12
        (10, "prefix words here " + "the quick brown fox jumps over the lazy dog" + " suffix trailer"),
        (11, "no overlap with anything evaluative in this document at all"),
        (12, "tiny doc"),
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    eva = spark.createDataFrame(
        [(0, eval_text)], "doc_id long, text string"
    )
    spans = contamination_spans(corpus, eva, k=5).collect()
    assert len(spans) == 1
    r = spans[0]
    assert (r.doc_id, r.span_start, r.span_end, r.span_tokens) == (
        10, 4, 12, 9,
    )
    scrub = {
        r.doc_id: r
        for r in scrub_contamination(corpus, eva, k=5).collect()
    }
    assert set(scrub) == {10, 11, 12}
    assert scrub[10].dup_tokens == 9
    assert scrub[10].clean_text == "prefix words here suffix trailer"
    assert scrub[11].dup_tokens == 0
    assert scrub[11].clean_text.startswith("no overlap")
    assert scrub[12].n_spans == 0

    # hash128 key path is output-equivalent (the 100-TB shape)
    h = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in contamination_spans(corpus, eva, k=5, key="hash128").collect()
    )
    s = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in contamination_spans(corpus, eva, k=5, key="string").collect()
    )
    assert h == s


# Certification tier (verdict r11 #4; markers registered in
# tests/conftest.py): this module is excluded from the fast tier
# `pytest -m "not certify"` and runs in the full per-round gate.
# Assignment is duration-measured (tools/tier_report.py), not guessed.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.certify
