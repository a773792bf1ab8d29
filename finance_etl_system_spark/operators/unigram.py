"""Distributed unigram-LM tokenizer training (Kudo 2018, the
SentencePiece unigram model) — the second tokenizer family next to
operators/bpe.py, sharing its segmentation contract and two-tier
design.

The reference engine has no tokenizer (its scope stops at OHLCV rows,
`/root/reference/spark-job/etl_job.py`); SURVEY §2.10 training-data
extension tier.

Algorithm (Viterbi-EM with count-based pruning — the standard
reimplementation of Kudo 2018's trainer; exact full-lattice EM and
loss-based pruning are the paper variants, noted where they differ):

1. One corpus-sized pass builds the (term, freq) word table
   (``bpe.word_freq`` — identical normalization, so BPE and unigram
   train from the same state).
2. Seed vocabulary: every substring of every word up to
   ``max_piece_len`` chars, corpus-weighted by occurrence; keep the
   ``seed_size`` most frequent (count DESC, piece ASC — deterministic)
   plus ALL single characters (never pruned, so any word stays
   encodable).
3. EM rounds: E-step = per-word Viterbi segmentation under current
   piece log-probs (hard EM: the best path's pieces count, weighted
   by word freq — integer counts, so both tiers aggregate to
   IDENTICAL state); M-step = normalize counts to log-probs. Pieces
   with zero count drop out (chars get a smoothed floor).
4. Prune: keep the top ``shrink`` fraction by expected count (count
   DESC, piece ASC; chars exempt) until ``vocab_size`` remains, then
   one settling EM round.

Scale posture (100 TB): the corpus is scanned ONCE (word_freq); every
round after that is word-table-sized, not corpus-sized. The piece
table is vocab-sized and broadcast; the E-step is an Arrow-batched
pandas UDF over the DISTRIBUTED word table emitting (piece, count)
pairs pre-aggregated per partition, so the round's shuffle is
vocab-sized and map-combinable. Driver round-trips are structurally
few (~em_iters × prune_rounds ≈ 10–30 for any vocab size — unlike
sequential BPE's one-per-merge), so there is no round-latency cliff
to batch away. The seed prune also runs IN the plan (single chars
collect alphabet-sized; multi-char pieces via TakeOrderedAndProject
with the same count-DESC/piece-ASC order as the local ``_prune``), so
driver state is O(seed_size) — never O(unique substrings), which
grows with the vocabulary. Below ``bpe.LOCAL_VOCAB_LIMIT`` unique words the word
table collects once and the whole EM runs driver-local (identical
results — the tier equivalence is pinned by test, exact because hard
EM state is integer counts and the Viterbi DP's float additions run
in the same order in both tiers).

Determinism: Viterbi tie-break is fixed — higher score, then LONGER
last piece (both tiers and the encoder share ``viterbi_segment``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from .bpe import LOCAL_VOCAB_LIMIT, segment_words, word_freq

_CHAR_FLOOR_COUNT = 0.5  # smoothed count for kept-but-unused chars


@dataclass
class UnigramModel:
    # (piece, logprob), sorted by expected count DESC then piece ASC
    pieces: list[tuple[str, float]] = field(default_factory=list)
    rounds: int = 0  # driver round-trips (distributed tier) / EM rounds


def viterbi_segment(
    word: str, logp: dict[str, float], max_piece_len: int
) -> list[str]:
    """Best segmentation of ``word`` under piece log-probs. DP over
    end positions; tie-break: higher score, then longer last piece.
    Unknown single chars fall back to a -1e9 penalty piece so every
    word segments (the encoder's OOV guard; during training all chars
    are in the table)."""
    n = len(word)
    NEG = -1e9
    best: list[float] = [0.0] + [-math.inf] * n
    back: list[int] = [0] * (n + 1)  # length of last piece
    for j in range(1, n + 1):
        for l in range(1, min(max_piece_len, j) + 1):
            piece = word[j - l : j]
            lp = logp.get(piece)
            if lp is None:
                if l > 1:
                    continue
                lp = NEG  # unknown char
            cand = best[j - l] + lp
            if cand > best[j] or (cand == best[j] and l > back[j]):
                best[j] = cand
                back[j] = l
    out: list[str] = []
    j = n
    while j > 0:
        out.append(word[j - back[j] : j])
        j -= back[j]
    out.reverse()
    return out


def _seed_counts_local(
    rows: list[tuple[str, int]], max_piece_len: int
) -> dict[str, int]:
    counts: dict[str, int] = {}
    for term, freq in rows:
        n = len(term)
        for i in range(n):
            for l in range(1, min(max_piece_len, n - i) + 1):
                p = term[i : i + l]
                counts[p] = counts.get(p, 0) + freq
    return counts


def _normalize(counts: dict[str, int | float]) -> dict[str, float]:
    total = float(sum(counts.values()))
    return {p: math.log(c / total) for p, c in counts.items()}


def _prune(
    counts: dict[str, float], target: int
) -> dict[str, float]:
    """Keep the ``target`` highest-count pieces (count DESC, piece
    ASC); single chars are exempt and always kept."""
    chars = {p: c for p, c in counts.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )
    keep = dict(multi[: max(0, target - len(chars))])
    keep.update(chars)
    return keep


def _estep_local(
    rows: list[tuple[str, int]],
    logp: dict[str, float],
    max_piece_len: int,
) -> dict[str, int]:
    counts: dict[str, int] = {}
    for term, freq in rows:
        for piece in viterbi_segment(term, logp, max_piece_len):
            counts[piece] = counts.get(piece, 0) + freq
    return counts


def _with_char_floor(
    counts: dict[str, int], chars: set[str]
) -> dict[str, float]:
    """Unused single chars stay in the table with a smoothed floor
    count so every word remains encodable after normalization."""
    out: dict[str, float] = {p: float(c) for p, c in counts.items() if c > 0}
    for ch in chars:
        if ch not in out:
            out[ch] = _CHAR_FLOOR_COUNT
    return out


def unigram_train(
    df: DataFrame,
    *,
    text_col: str = "text",
    vocab_size: int = 400,
    seed_size: int = 4000,
    max_piece_len: int = 8,
    shrink: float = 0.75,
    em_iters: int = 2,
    min_freq: int = 1,
    local_vocab_limit: int = LOCAL_VOCAB_LIMIT,
) -> UnigramModel:
    """Train a unigram-LM tokenizer over ``df[text_col]`` (module
    docstring for the algorithm and the two-tier contract)."""
    wf = word_freq(df, text_col)
    if min_freq > 1:
        wf = wf.filter(F.col("freq") >= min_freq)
    n_words = wf.count()
    if n_words == 0:
        return UnigramModel(pieces=[], rounds=0)
    spark = df.sparkSession
    rounds = 1  # the word count / collect round-trip

    if n_words <= local_vocab_limit:
        rows = [(r["term"], int(r["freq"])) for r in wf.collect()]
        get_counts = lambda lp: _estep_local(  # noqa: E731
            rows, lp, max_piece_len
        )
        seed = _seed_counts_local(rows, max_piece_len)
    else:  # distributed tier: word table never collects
        wf = wf.localCheckpoint(eager=True)  # reused every round

        def get_counts(lp: dict[str, float]) -> dict[str, int]:
            b = spark.sparkContext.broadcast(lp)

            @F.pandas_udf("map<string,long>")
            def seg_counts(terms: pd.Series, freqs: pd.Series) -> pd.Series:
                out = []
                for t, f in zip(terms, freqs):
                    c: dict[str, int] = {}
                    for piece in viterbi_segment(
                        t, b.value, max_piece_len
                    ):
                        c[piece] = c.get(piece, 0) + int(f)
                    out.append(c)
                return pd.Series(out)

            try:
                agg = (
                    wf.select(
                        F.explode(seg_counts("term", "freq")).alias(
                            "piece", "c"
                        )
                    )
                    .groupBy("piece")
                    .agg(F.sum("c").alias("c"))
                    .collect()
                )
            finally:
                # each EM round's vocab-sized log-prob broadcast is
                # dead after the collect; without this they accumulate
                # on executors for the session lifetime
                b.unpersist(blocking=False)
            return {r["piece"]: int(r["c"]) for r in agg}

        # distributed seed: positional substring explode, vocab-sized agg
        sub = wf.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.sequence(F.lit(1), F.length("term")),
                        lambda i: F.transform(
                            F.sequence(
                                F.lit(1),
                                F.least(
                                    F.lit(max_piece_len),
                                    F.length("term") - i + 1,
                                ),
                            ),
                            lambda l: F.substring(F.col("term"), i, l),
                        ),
                    )
                )
            ).alias("piece"),
            "freq",
        )
        # the prune runs IN the plan, not on the driver: unique short
        # substrings grow with the vocabulary (a web-scale corpus has
        # 10^7-10^8 of them), so collecting them all to keep seed_size
        # would be a multi-GB driver collect. Single chars (exempt
        # from pruning, alphabet-sized) collect separately; multi-char
        # pieces go through orderBy+limit — a TakeOrderedAndProject
        # whose ordering (count DESC, piece ASC) is exactly _prune's,
        # so the two tiers stay bit-identical. Driver state is
        # O(seed_size), never O(unique substrings).
        pc = sub.groupBy("piece").agg(F.sum("freq").alias("c"))
        pc = pc.localCheckpoint(eager=True)  # chars + top-k share it
        char_rows = pc.filter(F.length("piece") == 1).collect()
        target = max(seed_size, vocab_size)
        multi_rows = (
            pc.filter(F.length("piece") > 1)
            .orderBy(F.desc("c"), F.asc("piece"))
            .limit(max(0, target - len(char_rows)))
            .collect()
        )
        seed = {
            r["piece"]: int(r["c"]) for r in char_rows + multi_rows
        }
        rounds += 2

    chars = {p for p in seed if len(p) == 1}
    # state is always an exact-count dict (ints + 0.5 floors): sums of
    # such values are exact floats, so _normalize is ORDER-INDEPENDENT
    # and the local/distributed tiers produce bit-identical log-probs
    state: dict[str, float] = _prune(
        dict(seed), max(seed_size, vocab_size)
    )
    logp = _normalize(state)
    # EM + prune until the vocab target, then one settling round
    while True:
        for _ in range(em_iters):
            counts = get_counts(logp)
            rounds += 1
            state = _with_char_floor(counts, chars)
            logp = _normalize(state)
        if len(logp) <= vocab_size:
            break
        target = max(vocab_size, int(len(logp) * shrink))
        if target >= len(logp):  # shrink stalled (all-char vocab etc.)
            break
        state = _prune(state, target)
        logp = _normalize(state)
    # final ordering by last expected count (count DESC, piece ASC)
    counts = get_counts(logp)
    rounds += 1
    floored = _with_char_floor(counts, chars)
    kept = {p: c for p, c in floored.items() if p in logp}
    final = _normalize(kept)
    order = sorted(kept.items(), key=lambda pc: (-pc[1], pc[0]))
    return UnigramModel(
        pieces=[(p, final[p]) for p, _ in order], rounds=rounds
    )


def unigram_encode(
    df: DataFrame, model: UnigramModel, text_col: str = "text"
) -> DataFrame:
    """Add ``unigram_tokens``: Viterbi segmentation under the trained
    piece table. Arrow-batched pandas UDF, memoized per unique word
    (the bpe_encode pattern); segmentation rule identical to
    training's (shared ``viterbi_segment``)."""
    logp = dict(model.pieces)
    max_len = max((len(p) for p in logp), default=1)

    @F.pandas_udf(ArrayType(StringType()))
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def one(t):
            out: list[str] = []
            for w in segment_words(t):
                if w not in cache:
                    cache[w] = viterbi_segment(w, logp, max_len)
                out.extend(cache[w])
            return out

        return texts.map(one)

    return df.withColumn("unigram_tokens", enc(F.col(text_col)))


def unigram_score(
    df: DataFrame, model: UnigramModel, text_col: str = "text"
) -> DataFrame:
    """Add ``n_pieces`` and ``logprob_ticks``: per-document piece
    count and total piece log-probability in 1e-6 ticks under the
    trained model — the inputs of a CCNet-style perplexity quality
    filter. Ticks are the repo's exact-integer-accumulation policy:
    each piece's logprob rounds ONCE to integer micro-nats, so sums
    are engine- and order-independent. One Arrow pandas UDF, memoized
    per unique word (each word's (pieces, ticks) is computed once per
    batch)."""
    logp = dict(model.pieces)
    ticks = {p: round(lp * 1_000_000) for p, lp in logp.items()}
    max_len = max((len(p) for p in logp), default=1)
    oov_ticks = round(-1e9 * 1_000_000)  # matches viterbi's NEG guard

    @F.pandas_udf("struct<n_pieces:long,logprob_ticks:long>")
    def score(texts: pd.Series) -> pd.DataFrame:
        cache: dict[str, tuple[int, int]] = {}

        def one(t):
            n = 0
            s = 0
            for w in segment_words(t):
                if w not in cache:
                    pieces = viterbi_segment(w, logp, max_len)
                    cache[w] = (
                        len(pieces),
                        sum(ticks.get(p, oov_ticks) for p in pieces),
                    )
                wn, ws = cache[w]
                n += wn
                s += ws
            return {"n_pieces": n, "logprob_ticks": s}

        return pd.DataFrame(list(texts.map(one)))

    return df.withColumn("_s", score(F.col(text_col))).select(
        "*", "_s.n_pieces", "_s.logprob_ticks"
    ).drop("_s")


def save_unigram_model(
    spark, model: UnigramModel, path: str
) -> None:
    """Persist as a rank-ordered parquet artifact (the BPE model-store
    convention: plain columnar data, no pickles)."""
    rows = [
        (i, p, float(lp)) for i, (p, lp) in enumerate(model.pieces)
    ]
    spark.createDataFrame(
        rows, "rank long, piece string, logprob double"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_unigram_model(spark, path: str) -> UnigramModel:
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return UnigramModel(
        pieces=[(r["piece"], float(r["logprob"])) for r in rows]
    )
