"""BPE tokenizer training (operators/bpe.py): the JVM merge fold must
equal the reference left-to-right scan, and the distributed trainer
must reproduce a pure-Python reference trainer's merge list exactly —
the ground-truth contract a rows-only registry entry requires.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from finance_etl_system_spark.catalog import load_table
from finance_etl_system_spark.operators.bpe import (
    END_OF_WORD,
    bpe_encode,
    bpe_train,
    encode_word,
    merge_pass,
    load_bpe_model,
    merge_symbols,
    replay_word,
    save_bpe_model,
    word_freq,
)
from tests.conftest import SF_SMOKE


def _ref_train(
    wf: dict[str, int], num_merges: int, min_freq: int
) -> list[tuple[str, str, str, int]]:
    """Pure-Python BPE trainer with the same tie-break
    (freq DESC, left ASC, right ASC)."""
    vocab = [(list(w) + [END_OF_WORD], f) for w, f in wf.items()]
    merges: list[tuple[str, str, str, int]] = []
    for _ in range(num_merges):
        counts: Counter = Counter()
        for sym, f in vocab:
            for i in range(len(sym) - 1):
                counts[(sym[i], sym[i + 1])] += f
        if not counts:
            break
        (l, r), total = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if total < min_freq:
            break
        merges.append((l, r, l + r, total))
        vocab = [(merge_pass(sym, l, r), f) for sym, f in vocab]
    return merges


@settings(max_examples=60, deadline=None)
@given(
    word=st.text(alphabet="ab", min_size=0, max_size=12),
    pair=st.tuples(
        st.sampled_from(["a", "b", "ab", "ba", "aa"]),
        st.sampled_from(["a", "b", "ab", "ba", "aa"]),
    ),
)
def test_merge_pass_is_greedy_nonoverlapping(word, pair):
    """Overlapping occurrences merge left-to-right without cascading:
    the merged token never participates again within the pass."""
    l, r = pair
    sym = list(word) + [END_OF_WORD]
    out = merge_pass(sym, l, r)
    assert "".join(out) == "".join(sym)  # lossless
    for i in range(len(out) - 1):  # no unmerged (l, r) adjacency
        # remaining adjacency is legal only if its left element was
        # itself produced by this pass (ends with the merged token)
        if out[i] == l and out[i + 1] == r:
            raise AssertionError(f"unmerged pair survived: {out}")


def test_jvm_fold_equals_reference_scan(spark):
    """merge_symbols (F.aggregate) ≡ merge_pass on adversarial runs —
    overlapping pairs, pair at word start/end, merged-token adjacency."""
    words = [
        "aaaa", "aaab", "abab", "baaa", "abba", "bbbb", "a", "",
        "ababab", "aabbaabb",
    ]
    cases = [(list(w) + [END_OF_WORD],) for w in words]
    df = spark.createDataFrame(cases, "symbols array<string>")
    for l, r in [("a", "a"), ("a", "b"), ("b", "a"), ("a", END_OF_WORD)]:
        got = [
            row["m"]
            for row in df.select(
                merge_symbols(F.col("symbols"), l, r).alias("m")
            ).collect()
        ]
        want = [merge_pass(sym, l, r) for (sym,) in cases]
        assert got == want, (l, r)


def test_train_matches_reference_trainer(spark):
    d = load_table(spark, SF_SMOKE, "documents")
    model = bpe_train(d, num_merges=8, min_freq=2)
    wf = {
        row["term"]: row["freq"] for row in word_freq(d).collect()
    }
    assert model.merges == _ref_train(wf, 8, 2)
    assert len(model.merges) == 8  # corpus is word soup; no early stop


def test_train_min_freq_early_stop(spark):
    df = spark.createDataFrame([("xy zq",)], "text string")
    model = bpe_train(df, num_merges=10, min_freq=2)
    assert model.merges == []  # every pair occurs once -> below cutoff


def test_encode_replays_training_and_is_lossless(spark):
    d = load_table(spark, SF_SMOKE, "documents").limit(50)
    model = bpe_train(d, num_merges=6, min_freq=2)
    out = bpe_encode(d, model).select("text", "bpe_tokens").collect()
    assert out
    for row in out:
        toks = row["bpe_tokens"]
        # losslessness: concatenation restores normalized words+markers
        joined = "".join(toks)
        expect = "".join(
            w + END_OF_WORD for w in row["text"].lower().split()
        )
        assert joined == expect
        # faithfulness: per-word tokens equal the definitional replay
        i = 0
        for w in row["text"].lower().split():
            ref = replay_word(w, model.merges)
            assert toks[i : i + len(ref)] == ref
            i += len(ref)


def test_model_persistence_roundtrip(spark, tmp_path):
    d = load_table(spark, SF_SMOKE, "documents").limit(80)
    model = bpe_train(d, num_merges=5, min_freq=2)
    path = str(tmp_path / "bpe_model")
    save_bpe_model(spark, model, path)
    loaded = load_bpe_model(spark, path)
    assert loaded.merges == model.merges
    a = bpe_encode(d, model).select("bpe_tokens").collect()
    b = bpe_encode(d, loaded).select("bpe_tokens").collect()
    assert a == b


def test_pack_bpe_bins_respect_budget(spark):
    """Tokenizer-aware packing (queries/curation.q_pack_bpe): bins are
    contiguous from 0 and each bin's fill is within one document of
    the budget (the greedy start-bin contract)."""
    from collections import defaultdict

    from finance_etl_system_spark.queries.curation import (
        PACK_BUDGET,
        q_pack_bpe,
    )

    rows = q_pack_bpe(spark, SF_SMOKE).collect()
    assert rows
    fills: dict[int, int] = defaultdict(int)
    for r in rows:
        fills[r["bin_id"]] += r["n_tokens"]
    max_doc = max(r["n_tokens"] for r in rows)
    assert max_doc < PACK_BUDGET  # precondition for contiguity below
    assert set(fills) == set(range(len(fills)))  # contiguous bins
    for b, fill in fills.items():
        # start-bin greedy: fill = budget − spill_in + spill_out,
        # each spill < max_doc
        assert fill < PACK_BUDGET + max_doc
        if b != max(fills):
            assert fill > PACK_BUDGET - max_doc


def test_rank_greedy_encoder_equals_replay(spark):
    """encode_word (rank-greedy, |merges|-independent) ≡ replay_word
    (training-order replay) on every corpus word plus adversarial
    synthetic words, for a REAL trained merge list."""
    d = load_table(spark, SF_SMOKE, "documents")
    model = bpe_train(d, num_merges=12, min_freq=2)
    ranks = {(l, r): i for i, (l, r, _, _) in enumerate(model.merges)}
    words = {w["term"] for w in word_freq(d).collect()}
    words |= {"", "a", "aa" * 10, "spark" * 5, "mergemerge", "xyzzy"}
    for w in words:
        assert encode_word(w, model.merges, ranks) == replay_word(
            w, model.merges
        ), w
