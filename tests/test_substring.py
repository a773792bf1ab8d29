"""Repeated-substring detection/scrub (operators/substring.py):
planted-boilerplate ground truth, span-merge semantics, within-doc
repeats, the hash128/string key equivalence, and short-doc edges."""

from __future__ import annotations

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
