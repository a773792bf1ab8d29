"""Unigram-LM tokenizer (operators/unigram.py): Viterbi optimality
against brute force, tier equivalence (local EM == distributed EM,
exact), char-coverage/OOV guarantees, prune monotonicity, encode
round-trip, and model persistence."""

from __future__ import annotations

import itertools
import math

import pytest

from finance_etl_system_spark.operators.unigram import (
    UnigramModel,
    load_unigram_model,
    save_unigram_model,
    unigram_encode,
    unigram_train,
    viterbi_segment,
)

CORPUS = [
    (1, "internationalization and localization of international tokens"),
    (2, "the internal nation notes international internationalization"),
    (3, "tokenize the tokens with a tokenizer tokenizing tokenization"),
    (4, "nation nation nation international tokens note the internal"),
    (5, "zebra quartz jukebox vexing fjords myth plucks"),
]


def _brute_best(word, logp, max_len):
    """All segmentations by cut positions; max score, tie -> the rule
    viterbi_segment implements (prefer longer LAST piece, applied
    left-to-right through the DP) — brute force mirrors it by maximal
    (score, last-piece-length chain) comparison on reversed pieces."""
    n = len(word)
    best = None
    for mask in itertools.product([0, 1], repeat=n - 1):
        cuts = [0] + [i + 1 for i, b in enumerate(mask) if b] + [n]
        pieces = [word[a:b] for a, b in zip(cuts, cuts[1:])]
        if any(len(p) > max_len for p in pieces):
            continue
        try:
            score = sum(logp[p] for p in pieces)
        except KeyError:
            continue
        key = (score, tuple(len(p) for p in reversed(pieces)))
        if best is None or key > best[0]:
            best = (key, pieces)
    return best


def test_viterbi_matches_bruteforce():
    logp = {
        "a": -2.0, "b": -2.0, "c": -2.5, "ab": -3.0, "bc": -3.1,
        "abc": -5.0, "abcab": -7.0, "ca": -3.3,
    }
    for word in ["abcab", "abcabc", "cabab", "abccba"[:5], "aabbc"]:
        got = viterbi_segment(word, logp, 5)
        assert "".join(got) == word
        bf = _brute_best(word, logp, 5)
        if bf is None:
            continue
        got_score = sum(logp[p] for p in got)
        assert math.isclose(got_score, bf[0][0], rel_tol=0, abs_tol=1e-12)


def test_unknown_chars_fall_back_to_char_pieces():
    logp = {"a": -1.0}
    assert viterbi_segment("axa", logp, 4) == ["a", "x", "a"]


def test_train_learns_frequent_pieces_and_covers_all_chars(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    m = unigram_train(
        df, vocab_size=80, seed_size=600, max_piece_len=8, em_iters=2
    )
    pieces = dict(m.pieces)
    assert len(pieces) <= 80 + 30  # vocab target + char exemptions
    # every corpus char survives (encodability guarantee)
    chars = {c for _, t in CORPUS for c in t.lower() if c != " "}
    assert chars <= {p for p in pieces if len(p) == 1}
    # frequent multi-char material earns pieces
    assert any(len(p) >= 4 for p in pieces)
    # probabilities are a (sub-unit) distribution
    total = sum(math.exp(lp) for lp in pieces.values())
    assert total == pytest.approx(1.0, abs=1e-9)


def test_tiers_are_equivalent(spark):
    """local EM (collect) == distributed EM (pandas-UDF E-step,
    exploded-substring seed) — exact, including log-prob floats."""
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    kw = dict(vocab_size=60, seed_size=300, max_piece_len=6, em_iters=2)
    local = unigram_train(df, **kw)
    dist = unigram_train(df, local_vocab_limit=0, **kw)
    assert local.pieces == dist.pieces
    # the distributed tier's driver round-trips stay vocab-shaped few
    assert dist.rounds < 20


def test_encode_roundtrip_and_memoized_udf(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    m = unigram_train(df, vocab_size=80, seed_size=600, max_piece_len=8)
    out = unigram_encode(df, m).collect()
    for r in out:
        toks = r.unigram_tokens
        # concatenating pieces reproduces the normalized word stream
        assert "".join(toks) == r.text.lower().replace(" ", "")
    # OOV text (chars never seen in training) still encodes
    oov = spark.createDataFrame(
        [(9, "ZZ@@ ##")], "doc_id long, text string"
    )
    got = unigram_encode(oov, m).collect()[0].unigram_tokens
    assert "".join(got) == "zz@@##"


def test_model_persistence_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    m = unigram_train(df, vocab_size=50, seed_size=300, max_piece_len=6)
    path = str(tmp_path / "unigram_model")
    save_unigram_model(spark, m, path)
    m2 = load_unigram_model(spark, path)
    assert m2.pieces == m.pieces


def test_empty_corpus(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    m = unigram_train(df, vocab_size=50)
    assert m.pieces == []


def test_unigram_score_ticks_match_manual(spark):
    from finance_etl_system_spark.operators.unigram import (
        unigram_score,
        viterbi_segment,
    )

    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    m = unigram_train(df, vocab_size=80, seed_size=600, max_piece_len=6)
    logp = dict(m.pieces)
    ticks = {p: round(lp * 1_000_000) for p, lp in logp.items()}
    max_len = max(len(p) for p in logp)
    got = {r.doc_id: r for r in unigram_score(df, m).collect()}
    for doc_id, text in CORPUS:
        n = s = 0
        for w in text.lower().split():
            pieces = viterbi_segment(w, logp, max_len)
            n += len(pieces)
            s += sum(ticks[p] for p in pieces)
        assert (got[doc_id].n_pieces, got[doc_id].logprob_ticks) == (n, s)


def test_uniform_model_perplexity_is_vocab_size():
    import math

    from finance_etl_system_spark.operators.unigram import viterbi_segment

    k = 8
    pieces = [chr(ord("a") + i) for i in range(k)]
    logp = {p: math.log(1.0 / k) for p in pieces}
    word = "abcabd"
    segs = viterbi_segment(word, logp, 1)
    total = sum(logp[p] for p in segs)
    ppl = math.exp(-total / len(segs))
    assert ppl == pytest.approx(k, rel=1e-12)
