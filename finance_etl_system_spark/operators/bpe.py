"""Distributed BPE tokenizer training (training-data tier, SURVEY
§2.10 X4).

Classic byte-pair-encoding vocabulary induction (Sennrich et al.
2016 — a public algorithm), expressed Spark-first:

- The corpus is collapsed ONCE to the word-frequency table — |vocab|
  rows. This is the standard BPE trick: adjacent-pair statistics are
  identical over (word, freq) and the raw token stream, so the
  iteration state is vocabulary-sized, not corpus-sized. At 100 TB
  the corpus scan happens exactly once; every merge round touches
  only the vocab frame.
- Each merge round is ONE map-combinable pair aggregate (explode the
  zip of adjacent symbols, groupBy(l, r) sum(freq)) followed by a
  top-1 TakeOrderedAndProject — the driver receives exactly one row
  (the argmax pair) per round, never the data.
- The merge is applied to the symbol arrays by a JVM higher-order
  fold (``F.aggregate``) — greedy left-to-right, provably equal to
  the reference scan (a token formed in this pass has label
  left+right ≠ left, so it can never cascade within the pass; see
  tests/test_bpe.py property test). No Python anywhere in the loop.
- The vocab frame is ``localCheckpoint``'ed each round so the plan
  stays flat across rounds (iterative-lineage truncation, the same
  policy as operators/clustering.kmeans_fit).

Determinism: ties break (freq DESC, left ASC, right ASC) — replay-
stable, no rand()/uuid; the trained merge list is a pure function of
the corpus.

Encoding new text replays the merge list in training order. That is
inherently sequential per merge, and chaining |merges| JVM folds
into one expression breaks down at real vocab sizes (10k–50k
merges), so ``bpe_encode`` uses an Arrow-batched pandas UDF with the
rank-dict greedy algorithm every production BPE implementation uses
— the documented "built-ins genuinely can't express it" case.

The reference has no tokenizer stage (its scope stops at OHLCV rows,
/root/reference/spark-job/etl_job.py); this extends the training-
data tier alongside queries/text.q_bpe_merge_pairs (which is exactly
one round's pair statistic, oracle-checked).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from .text import normalized

END_OF_WORD = "</w>"


@dataclass
class BPEModel:
    # (left, right, merged, corpus_freq) in training order
    merges: list[tuple[str, str, str, int]] = field(default_factory=list)


def word_freq(
    df: DataFrame, text_col: str = "text", max_word_chars: int = 64
) -> DataFrame:
    """(term, freq) over the normalized whitespace tokens — the one
    corpus-sized pass. ``max_word_chars`` drops degenerate "words"
    (URLs, base64 blobs) whose quadratic merge-pass cost would
    otherwise dominate a round — the same pre-tokenizer length cap
    every production trainer applies; at web scale such tokens are
    noise, not vocabulary."""
    return (
        df.select(
            F.explode(F.split(normalized(F.col(text_col)), " ")).alias("term")
        )
        .filter(
            (F.col("term") != "") & (F.length("term") <= max_word_chars)
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _symbolize(wf: DataFrame) -> DataFrame:
    """Initial symbol sequences: characters + the end-of-word marker
    (so merges can learn word-final units, per the original paper)."""
    return wf.select(
        F.concat(
            F.split(F.col("term"), ""), F.array(F.lit(END_OF_WORD))
        ).alias("symbols"),
        "freq",
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Corpus-weighted adjacent-pair counts: explode the zip of
    symbols[0:n-1] with symbols[1:n] — map-side combinable."""
    n = F.size("symbols")
    z = F.arrays_zip(
        F.slice("symbols", 1, n - 1).alias("l"),
        F.slice("symbols", 2, n - 1).alias("r"),
    )
    return (
        vocab.filter(n >= 2)
        .select(F.explode(z).alias("p"), "freq")
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").alias("total"))
    )


def merge_symbols(symbols: Column, left: str, right: str) -> Column:
    """One greedy left-to-right merge pass as a JVM fold: append each
    symbol, except when it is `right` and the accumulator ends in
    `left` — then replace that tail with the merged token."""
    merged = left + right
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    df: DataFrame,
    *,
    text_col: str = "text",
    num_merges: int = 20,
    min_freq: int = 2,
) -> BPEModel:
    """Learn up to ``num_merges`` merges; stops early when the best
    remaining pair's corpus frequency drops below ``min_freq`` (the
    long-tail cutoff every tokenizer trainer applies)."""
    vocab = _symbolize(word_freq(df, text_col)).localCheckpoint(eager=True)
    model = BPEModel()
    for _ in range(num_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("total").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["total"] < min_freq:
            break
        l, r, total = top[0]["l"], top[0]["r"], int(top[0]["total"])
        model.merges.append((l, r, l + r, total))
        vocab = vocab.select(
            merge_symbols(F.col("symbols"), l, r).alias("symbols"), "freq"
        ).localCheckpoint(eager=True)
    return model


def merge_pass(sym: list[str], left: str, right: str) -> list[str]:
    """Pure-Python twin of ``merge_symbols``: one greedy left-to-right
    pass merging every (left, right) occurrence. Used by encode and by
    the equivalence tests against the JVM fold."""
    out: list[str] = []
    i = 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def replay_word(
    word: str, merges: list[tuple[str, str, str, int]]
) -> list[str]:
    """Definitional BPE encode: replay the merge list in training
    order — exactly the transformation training applied to the vocab.
    O(|merges|·len) per word; the production path is ``encode_word``,
    whose equality with this is pinned in tests/test_bpe.py."""
    sym = list(word) + [END_OF_WORD]
    for left, right, _, _ in merges:
        if len(sym) < 2:
            break
        sym = merge_pass(sym, left, right)
    return sym


def encode_word(
    word: str,
    merges: list[tuple[str, str, str, int]],
    ranks: dict[tuple[str, str], int] | None = None,
) -> list[str]:
    """Rank-greedy BPE encode (the GPT-2/HF algorithm): repeatedly
    merge all occurrences of the lowest-rank adjacent pair present.
    O(len²) per word, INDEPENDENT of |merges| — at a 50k-merge vocab
    this is what makes corpus-scale encoding feasible. Equal to
    ``replay_word`` for any training-produced merge list: a merge's
    constituents always predate it, so pairs created by merging the
    current minimum have strictly higher ranks and can never preempt
    its remaining occurrences (equality pinned by test)."""
    if ranks is None:
        ranks = {(l, r): i for i, (l, r, _, _) in enumerate(merges)}
    sym = list(word) + [END_OF_WORD]
    while len(sym) >= 2:
        best = min(
            (
                ranks[p]
                for p in zip(sym, sym[1:])
                if p in ranks
            ),
            default=None,
        )
        if best is None:
            break
        left, right = merges[best][0], merges[best][1]
        sym = merge_pass(sym, left, right)
    return sym


def save_bpe_model(
    spark, model: BPEModel, path: str, *, overwrite: bool = True
) -> None:
    """Persist the merge list as a rank-ordered parquet artifact —
    the tokenizer-asset twin of the repo's model blob store: train
    once, encode from the artifact in any later session/stream. The
    table is |merges| rows (KB-scale for real vocabs)."""
    rows = [
        (i, l, r, m, f) for i, (l, r, m, f) in enumerate(model.merges)
    ]
    df = spark.createDataFrame(
        rows, "rank int, left string, right string, merged string, freq long"
    )
    mode = "overwrite" if overwrite else "errorifexists"
    df.coalesce(1).write.mode(mode).parquet(path)


def load_bpe_model(spark, path: str) -> BPEModel:
    """Load a persisted merge list; rank order restored explicitly
    (parquet row order is not a contract)."""
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return BPEModel(
        merges=[
            (r["left"], r["right"], r["merged"], int(r["freq"]))
            for r in rows
        ]
    )


def bpe_encode(
    df: DataFrame, model: BPEModel, text_col: str = "text"
) -> DataFrame:
    """Add ``bpe_tokens``: the text tokenized with the trained merge
    list. Arrow-batched pandas UDF running the rank-greedy encoder
    (see module docstring for why this is not a JVM expression);
    per-batch word memoization keeps the Python work at unique-words
    volume."""
    merges = list(model.merges)
    ranks = {(l, r): i for i, (l, r, _, _) in enumerate(merges)}

    @F.pandas_udf(ArrayType(StringType()))
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def one(t):
            out: list[str] = []
            for w in (t or "").lower().split():
                if w not in cache:
                    cache[w] = encode_word(w, merges, ranks)
                out.extend(cache[w])
            return out

        return texts.map(one)

    return df.withColumn("bpe_tokens", enc(F.col(text_col)))
