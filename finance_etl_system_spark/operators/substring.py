"""Corpus-level repeated-substring (boilerplate span) detection and
scrubbing — the distributed analog of exact-substring training-data
dedup (Lee et al. 2022, "Deduplicating Training Data Makes Language
Models Better"), re-expressed for Spark.

The reference engine has no document pipeline at all
(`/root/reference/spark-job/etl_job.py` stops at OHLCV rows); this
extends the SURVEY §2.10 training-data tier alongside
operators/dedup.py (whole-document near-dup) with the SUB-document
failure mode near-dup misses: licence headers, navigation chrome, and
templated paragraphs pasted into otherwise-unique documents.

Semantics
---------
Tokenize on any-whitespace runs (operators/text.py::ws_tokens — THE
repo-wide rule, identical to the DuckDB oracle since the round-9
unification), slide a ``k``-word gram over each document, and call
a gram *hot* when its corpus-wide occurrence count (including repeats
inside one document) reaches ``min_count``. Every hot gram start
position is flagged; flagged starts whose coverage windows touch or
overlap (gap <= k) merge into one maximal span covering tokens
``[min_start, max_start + k - 1]``. Spans are therefore maximal,
non-overlapping, and deterministic. The scrub drops every token
covered by any span — the aggressive mode: boilerplate that appears
``min_count``+ times is removed from EVERY occurrence (a
keep-one-canonical-copy mode would need a global occurrence ranking;
for boilerplate the aggressive cut is what production pipelines run).

Scale posture (100 TB)
----------------------
- One gram-shaped shuffle: the occurrence count is a map-side
  combinable groupBy on the gram key; the flag join back to
  (doc_id, position) is a plain equi join AQE can re-plan.
- Key width: ``key="string"`` groups by the gram text itself —
  exact, zero collision risk, and what the oracle can reproduce;
  ``key="hash128"`` groups by two xxhash64 lanes — one over the gram,
  one over the gram PREFIXED WITH A SALT literal (PySpark's xxhash64
  does not expose the seed parameter, so the second lane is salted
  input, not an independent seed; the lanes are distinct hash
  functions of the gram but their independence is empirical, so treat
  the ~10^-14 birthday bound at 10^12 grams as an estimate, not a
  guarantee). This cuts shuffle bytes ~k*avg_word wide down to 16
  bytes. Both modes are output-equivalent (tested); hash128 is the
  100-TB default recommendation.
- Span merge is a per-document window over FLAGGED positions only
  (`hashpartitioning(doc_id)` on the hit subset, typically a tiny
  fraction of the corpus) — never a window over the full gram
  stream.
- The scrub's token filter runs inside higher-order functions on the
  document row (JVM codegen, no token-level explode/shuffle); cost is
  O(n_tokens * n_spans) per document with n_spans already merged to
  the maximal form.
- The explode builds INTEGER start positions first and the gram
  string after (the curation-module lesson: explode(transform(...))
  drops the stage out of codegen).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .partitioning import spread_for_expansion

_H2_SEED = 0x9E3779B9  # second-lane salt for key="hash128"


def _toks(text_col: str) -> Column:
    """Whitespace tokens, lowercased — the ONE repo-wide rule
    (operators/text.py::ws_tokens, any-whitespace split), shared with
    queries/curation.py and the DuckDB oracle
    (operators/text.py::ws_tokens_sql)."""
    from .text import ws_tokens

    return ws_tokens(F.col(text_col))


def _gram_positions(
    docs: DataFrame, *, text_col: str, id_col: str, k: int
) -> DataFrame:
    """(id, i, gram): every k-gram start position, 1-based."""
    d = (
        spread_for_expansion(docs, id_col)
        .select(id_col, _toks(text_col).alias("_toks"))
        .filter(F.size("_toks") >= k)
    )
    return d.select(
        id_col,
        "_toks",
        F.explode(F.sequence(F.lit(1), F.size("_toks") - (k - 1))).alias("i"),
    ).select(
        id_col,
        "i",
        F.concat_ws(" ", F.slice("_toks", F.col("i"), k)).alias("gram"),
    )


def gram_keys(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    key: str = "string",
) -> tuple[DataFrame, list[str]]:
    """(id, i, <key cols>) for every k-gram start position, plus the
    key column names. key="string" carries the gram text (exact,
    oracle-comparable); key="hash128" carries two xxhash64 lanes (the
    second over salt+gram — see module docstring for the independence
    caveat) — 16 bytes per gram regardless of k, the 100-TB
    shuffle/state path (also what the streaming twin persists)."""
    if key not in ("string", "hash128"):
        raise ValueError(f"key must be 'string' or 'hash128', got {key!r}")
    grams = _gram_positions(docs, text_col=text_col, id_col=id_col, k=k)
    if key == "hash128":
        return (
            grams.select(
                id_col,
                "i",
                F.xxhash64("gram").alias("_h1"),
                F.xxhash64(F.lit(_H2_SEED), F.col("gram")).alias("_h2"),
            ),
            ["_h1", "_h2"],
        )
    return grams, ["gram"]


def repeated_gram_positions(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_count: int = 2,
    key: str = "string",
) -> DataFrame:
    """Flagged gram-start positions: (id, i) where the k-gram starting
    at token i (1-based) occurs >= min_count times corpus-wide."""
    grams, key_cols = gram_keys(
        docs, text_col=text_col, id_col=id_col, k=k, key=key
    )
    hot = (
        grams.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= min_count)
        .select(*key_cols)
    )
    return grams.join(hot, key_cols).select(id_col, "i")


def spans_from_flagged(
    flagged: DataFrame, *, id_col: str = "doc_id", k: int = 8
) -> DataFrame:
    """Merge flagged gram starts (id, i) into maximal non-overlapping
    spans. Window over the flagged subset only, partitioned by id."""
    w = Window.partitionBy(id_col).orderBy("i")
    islands = flagged.withColumn(
        "_new",
        F.when(
            F.col("i") - F.lag("i").over(w) <= k, F.lit(0)
        ).otherwise(F.lit(1)),
    ).withColumn("_island", F.sum("_new").over(w))
    return (
        islands.groupBy(id_col, "_island")
        .agg(
            F.min("i").alias("span_start"),
            (F.max("i") + (k - 1)).alias("span_end"),
        )
        .select(
            id_col,
            F.col("span_start").cast("long").alias("span_start"),
            F.col("span_end").cast("long").alias("span_end"),
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("long")
            .alias("span_tokens"),
        )
    )


def repeated_spans(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_count: int = 2,
    key: str = "string",
) -> DataFrame:
    """Maximal repeated spans per document:
    (id, span_start, span_end, span_tokens), token positions 1-based
    inclusive. Flagged starts i, j (i < j) share a span iff
    j - i <= k (their coverage windows [i, i+k-1], [j, j+k-1] touch
    or overlap), applied transitively — so spans never overlap."""
    flagged = repeated_gram_positions(
        docs, text_col=text_col, id_col=id_col, k=k, min_count=min_count,
        key=key,
    )
    return spans_from_flagged(flagged, id_col=id_col, k=k)


def contamination_spans(
    corpus: DataFrame,
    eval_docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    key: str = "string",
) -> DataFrame:
    """WHERE a corpus document overlaps the eval benchmark, not just
    whether: maximal spans (id, span_start, span_end, span_tokens)
    covering every corpus position whose k-gram appears anywhere in
    ``eval_docs`` — the span-level view of benchmark decontamination
    (queries/curation.py counts hits per doc; production pipelines
    scrub the contaminated WINDOW and keep the rest of the document).

    Scale: the eval gram set is benchmark-sized by construction
    (benchmarks are MBs) → broadcast; the corpus gram stream meets it
    in a broadcast hash join, so only HIT positions are ever
    shuffled, then the same flagged-subset span merge as
    repeated_spans (window over hits only, never the full stream).
    ``key="hash128"`` applies here too for the 16-byte 100-TB path."""
    grams_c, key_cols = gram_keys(
        corpus, text_col=text_col, id_col=id_col, k=k, key=key
    )
    eval_grams = (
        gram_keys(eval_docs, text_col=text_col, id_col=id_col, k=k, key=key)[0]
        .select(*key_cols)
        .distinct()
    )
    flagged = grams_c.join(F.broadcast(eval_grams), key_cols).select(
        id_col, "i"
    )
    return spans_from_flagged(flagged, id_col=id_col, k=k)


def scrub_contamination(
    corpus: DataFrame,
    eval_docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    key: str = "string",
) -> DataFrame:
    """Window-level decontamination: every token inside a
    contamination span removed, the rest of the document kept —
    (id, n_tokens, n_spans, dup_tokens, dup_ratio, clean_text), the
    scrub_repeated_spans report shape (dup_* = contaminated-token
    counts here). Every flagged k-gram occurrence loses ALL its
    tokens; note the standard caveat that removing a window can
    juxtapose previously-distant tokens into a NEW k-gram — rerun
    detection to fixpoint if the guarantee must be closed under
    concatenation (one pass is the Lee et al. practice)."""
    spans = contamination_spans(
        corpus, eval_docs, text_col=text_col, id_col=id_col, k=k, key=key
    )
    return _scrub_with_spans(corpus, spans, text_col=text_col, id_col=id_col)


def scrub_repeated_spans(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_count: int = 2,
    key: str = "string",
) -> DataFrame:
    """Per-document scrub report: every token covered by a repeated
    span removed. (id, n_tokens, n_spans, dup_tokens, dup_ratio,
    clean_text); documents with no spans pass through with
    dup_tokens=0 and clean_text = the normalized token stream.

    The token filter is a higher-order exists() over the (merged,
    non-overlapping) span array inside the document row — no
    token-level shuffle. dup_ratio is rounded to 6dp, once, matching
    the oracle."""
    spans = repeated_spans(
        docs, text_col=text_col, id_col=id_col, k=k, min_count=min_count,
        key=key,
    )
    return _scrub_with_spans(docs, spans, text_col=text_col, id_col=id_col)


def _scrub_with_spans(
    docs: DataFrame,
    spans: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Shared scrub kernel: drop every token covered by a merged span
    (higher-order exists() inside the document row, no token-level
    shuffle); emit the report frame."""
    per_doc = spans.groupBy(id_col).agg(
        F.sort_array(
            F.collect_list(F.struct("span_start", "span_end"))
        ).alias("_spans"),
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("span_tokens").alias("dup_tokens"),
    )
    d = docs.select(id_col, _toks(text_col).alias("_toks")).join(
        per_doc, id_col, "left"
    )
    spans_arr = F.coalesce(
        F.col("_spans"),
        F.array().cast("array<struct<span_start:long,span_end:long>>"),
    )
    covered = lambda t: F.exists(  # noqa: E731 — local plan builder
        spans_arr,
        lambda sp: (t >= sp["span_start"]) & (t <= sp["span_end"]),
    )
    kept = F.filter(
        F.transform(
            F.col("_toks"), lambda x, i: F.struct(x.alias("x"), i.alias("i"))
        ),
        lambda s: ~covered(s["i"] + 1),
    )
    return d.select(
        id_col,
        F.size("_toks").cast("long").alias("n_tokens"),
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        # explicit zero-token guard: Spark 0/0.0 is NULL, DuckDB NaN —
        # pin both engines to NULL
        F.when(
            F.size("_toks") > 0,
            F.round(
                F.coalesce("dup_tokens", F.lit(0))
                / F.size("_toks").cast("double"),
                6,
            ),
        ).alias("dup_ratio"),
        F.concat_ws(
            " ", F.transform(kept, lambda s: s["x"])
        ).alias("clean_text"),
    )
