"""Text-analysis operators for training-data pipelines (SURVEY §2.10 X4).

All hot-path functions are built-in ``pyspark.sql.functions`` (JVM,
whole-stage codegen) — tokenization, ratios, hashes. Nothing here
drops to Python.

Scale notes: every operator is a narrow per-row projection — no
shuffle at all. Fingerprints/hashes enable downstream groupBy dedup
whose shuffle keys are 64-hex strings (uniform, no skew).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language marker lexicons for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
    "zh": ["的", "是", "了", "在", "我"],
}

STOPWORDS_EN = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def normalized(text: Column) -> Column:
    """Lowercase + whitespace collapse — the canonical form used by
    every downstream hash/dedup step."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def ws_tokens(text: Column) -> Column:
    """THE repo-wide whitespace tokenizer: lowercase, split on runs of
    ANY whitespace (Java ``\\s`` class — spaces, tabs, newlines), drop
    empty tokens. Equivalent to ``F.split(normalized(text), " ")``
    modulo empties, and to ``bpe.segment_words``'s Python twin. Every
    corpus-token operator (substring/gram analysis, curation,
    quality, retrieval, streaming mixture) shares this ONE rule — a
    second rule (the pre-r9 ``' +'`` space-run split) silently
    disagreed on tab/newline-joined tokens."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda x: x != "")


def ws_tokens_sql(col: str = "text") -> str:
    """DuckDB twin of :func:`ws_tokens` — keep in lockstep.

    The class is spelled out instead of ``\\s`` because the engines'
    shorthands differ: Java's ``\\s`` is exactly [ \\t\\n\\x0B\\f\\r]
    (vertical tab INCLUDED) while DuckDB's RE2 ``\\s`` excludes
    \\x0B — a divergence tests/test_tokenizer_parity.py caught on
    adversarial input and would otherwise sit invisible until a
    vertical tab reached production text."""
    return (
        f"list_filter(string_split_regex(lower({col}),"
        " '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '')"
    )


def ws_tokens_expr(col: str) -> str:
    """Spark-SQL-text twin of :func:`ws_tokens` — keep in lockstep
    with it and with :func:`ws_tokens_sql` (the DuckDB twin). One
    JVM-parsed string instead of ~8 py4j round trips incl. a lambda
    registration (r14, guide §1.2 step 2); the parsed tree is the
    identical filter(split(lower(...))) chain. Parity pinned in
    tests/test_retrieval_sqltext.py and tests/test_substring_sqltext
    .py."""
    return f"filter(split(lower(`{col}`), '\\\\s+'), x -> x != '')"


def tokens(text: Column) -> Column:
    """Whitespace tokenization of the normalized text."""
    return F.split(normalized(text), " ")


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish token estimate: word-piece regex split. Counts runs of
    letters, digits, or single punctuation — a deterministic stand-in
    for a real BPE vocab (which would be a broadcast lookup)."""
    pieces = F.regexp_extract_all(
        F.lower(text), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9 \t\n\x0B\f\r]"), 0
    )
    return F.array_size(pieces)


def word_count(text: Column) -> Column:
    return F.array_size(tokens(text))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are punctuation."""
    stripped = F.regexp_replace(text, r"[^\p{L}\p{N} \t\n\x0B\f\r]", "")
    return (F.length(text) - F.length(stripped)) / F.greatest(
        F.length(text), F.lit(1)
    )


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are stopwords (quality signal)."""
    sw = F.array(*[F.lit(s) for s in (stopwords or STOPWORDS_EN)])
    toks = tokens(text)
    hits = F.size(F.array_intersect(toks, sw))  # distinct-hit variant
    n_hits = F.aggregate(
        toks,
        F.lit(0),
        lambda acc, t: acc + F.when(F.array_contains(sw, t), 1).otherwise(0),
    )
    _ = hits  # distinct-hit kept for reference; ratio uses occurrence count
    return n_hits / F.greatest(F.array_size(toks), F.lit(1))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation
    + reasonable mean word length. Deterministic, SQL-expressible."""
    n_chars = F.length(text)
    wc = word_count(text)
    mean_word_len = n_chars / F.greatest(wc, F.lit(1))
    len_ok = F.when((n_chars >= 100) & (n_chars <= 20000), 1.0).otherwise(0.5)
    punct_ok = F.when(punct_ratio(text) < 0.1, 1.0).otherwise(0.5)
    mwl_ok = F.when((mean_word_len >= 3) & (mean_word_len <= 12), 1.0).otherwise(0.5)
    return (len_ok + punct_ok + mwl_ok) / 3.0


def lang_id(text: Column) -> Column:
    """Marker-lexicon language ID: count per-language marker tokens,
    take the argmax (ties → first language in a fixed order, no hits →
    'und'). A real system would use fastText; the heuristic keeps the
    whole operator JVM-side and oracle-checkable."""
    toks = tokens(text)
    best_lang = F.lit("und")
    best_hits = F.lit(0)

    def _counter(marker_arr):
        return lambda acc, t: acc + F.when(
            F.array_contains(marker_arr, t), 1
        ).otherwise(0)

    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        hits = F.aggregate(toks, F.lit(0), _counter(arr))
        is_better = hits > best_hits
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(is_better, hits).otherwise(best_hits)
    return best_lang


def fingerprint(text: Column) -> Column:
    """Content fingerprint: sha2-256 of the normalized text — the
    exact-dedup key (SURVEY §2.10 X1 first pass)."""
    return F.sha2(normalized(text), 256)


def add_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass projection of the full feature set."""
    t = F.col(text_col)
    return (
        df.withColumn("char_count", F.length(t))
        .withColumn("word_count", word_count(t))
        .withColumn("token_count", token_count_bpe_ish(t))
        .withColumn("punct_ratio", F.round(punct_ratio(t), 6))
        .withColumn("stopword_ratio", F.round(stopword_ratio(t), 6))
        .withColumn("quality_score", F.round(quality_score(t), 6))
        .withColumn("lang_pred", lang_id(t))
        .withColumn("fingerprint", fingerprint(t))
    )
