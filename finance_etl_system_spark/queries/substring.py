"""Repeated-substring (boilerplate span) detection and scrubbing over
the documents table — the sub-document dedup tier (Lee et al. 2022
exact-substring dedup, Spark-first; kernel in operators/substring.py).

Whole-document near-dup (queries/dedup.py) misses licence headers,
navigation chrome, and templated paragraphs pasted into otherwise-
unique documents; these two queries find and remove them. The
reference has no document pipeline (its scope stops at OHLCV rows,
`/root/reference/spark-job/etl_job.py`); SURVEY §2.10 extension tier.

Both queries are exactly SQL-expressible and oracle-checked: the
engine side groups grams by the gram STRING (what DuckDB can
reproduce; the 128-bit-hash key is the documented 100-TB path and is
output-equivalence-tested against the string key in
tests/test_substring.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.substring import repeated_spans, scrub_repeated_spans
from ..operators.text import ws_tokens_sql

K = 8  # gram width (words) — spans are maximal unions of hot k-grams
MIN_COUNT = 2  # corpus-wide occurrences (incl. same-doc repeats)

_TOKS_SQL = ws_tokens_sql("text")

# shared oracle CTE chain: tokens -> positioned grams -> hot grams ->
# flagged starts -> merged maximal spans (gap <= K, transitive)
_SPANS_CTE = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS s FROM documents
),
grams AS (
  SELECT doc_id, i,
         array_to_string(list_slice(s, i, i + {K - 1}), ' ') AS gram
  FROM toks, unnest(generate_series(1, len(s) - {K - 1})) AS u(i)
  WHERE len(s) >= {K}
),
hot AS (
  SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= {MIN_COUNT}
),
flagged AS (
  SELECT doc_id, i FROM grams JOIN hot USING (gram)
),
marks AS (
  SELECT doc_id, i,
         CASE WHEN i - LAG(i) OVER (PARTITION BY doc_id ORDER BY i)
                   <= {K} THEN 0 ELSE 1 END AS new_island
  FROM flagged
),
isl AS (
  SELECT doc_id, i,
         SUM(new_island)
           OVER (PARTITION BY doc_id ORDER BY i) AS island
  FROM marks
),
spans AS (
  SELECT doc_id, MIN(i) AS span_start, MAX(i) + {K - 1} AS span_end
  FROM isl GROUP BY doc_id, island
)
"""


def q_repeated_substring_spans(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Maximal repeated spans: every run of word {K}-grams occurring
    >= {MIN_COUNT} times corpus-wide, merged per document into
    non-overlapping token ranges (1-based inclusive). One gram-keyed
    shuffle + a window over flagged positions only."""
    return (
        repeated_spans(
            load_table(spark, sf_dir, "documents"),
            k=K,
            min_count=MIN_COUNT,
            key="string",
        )
        .orderBy("doc_id", "span_start")
    )


_REPEATED_SPANS_SQL = (
    _SPANS_CTE
    + """
SELECT doc_id,
       CAST(span_start AS BIGINT) AS span_start,
       CAST(span_end AS BIGINT) AS span_end,
       CAST(span_end - span_start + 1 AS BIGINT) AS span_tokens
FROM spans
ORDER BY doc_id, span_start
"""
)


def q_boilerplate_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggressive boilerplate scrub: per document, every token covered
    by a repeated span removed; reports token counts, span count,
    dup_ratio (6dp) and the cleaned text. Documents without spans
    pass through (clean_text = normalized token stream)."""
    return (
        scrub_repeated_spans(
            load_table(spark, sf_dir, "documents"),
            k=K,
            min_count=MIN_COUNT,
            key="string",
        )
        .orderBy("doc_id")
    )


_BOILERPLATE_SCRUB_SQL = (
    _SPANS_CTE
    + """,
agg AS (
  SELECT doc_id,
         COUNT(*) AS n_spans,
         SUM(span_end - span_start + 1) AS dup_tokens
  FROM spans GROUP BY doc_id
),
tok_pos AS (
  SELECT doc_id, t, s[t] AS tok
  FROM toks, unnest(generate_series(1, len(s))) AS u(t)
),
kept AS (
  SELECT tp.doc_id, tp.t, tp.tok
  FROM tok_pos tp
  WHERE NOT EXISTS (
    SELECT 1 FROM spans sp
    WHERE sp.doc_id = tp.doc_id AND tp.t BETWEEN sp.span_start AND sp.span_end
  )
),
clean AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY t) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(d.s) AS BIGINT) AS n_tokens,
       CAST(COALESCE(a.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(COALESCE(a.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       CASE WHEN len(d.s) > 0
            THEN ROUND(COALESCE(a.dup_tokens, 0) / CAST(len(d.s) AS DOUBLE), 6)
       END AS dup_ratio,
       COALESCE(c.clean_text, '') AS clean_text
FROM toks d
LEFT JOIN agg a USING (doc_id)
LEFT JOIN clean c USING (doc_id)
ORDER BY d.doc_id
"""
)


def q_boilerplate_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The top-20 repeated {K}-grams by corpus occurrence count, with
    the number of distinct documents carrying each — the triage view
    an engineer reads BEFORE scrubbing (is this licence boilerplate
    or legitimate common phrasing?). One map-combinable gram groupBy;
    top-20 is TakeOrderedAndProject (count desc, gram asc)."""
    from ..functions.frames import ranked_topk
    from ..operators.substring import gram_keys

    grams, _ = gram_keys(
        load_table(spark, sf_dir, "documents"), k=K, key="string"
    )
    agg = grams.groupBy("gram").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.count_distinct("doc_id").alias("n_docs"),
    ).filter(F.col("n_occurrences") >= MIN_COUNT)
    key = [F.col("n_occurrences").desc(), F.col("gram").asc()]
    return ranked_topk(agg, key, 20).select(
        "rnk", "gram", "n_occurrences", "n_docs"
    )


_BOILERPLATE_CATALOG_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS s FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(list_slice(s, i, i + {K - 1}), ' ') AS gram
  FROM toks, unnest(generate_series(1, len(s) - {K - 1})) AS u(i)
  WHERE len(s) >= {K}
),
agg AS (
  SELECT gram,
         CAST(COUNT(*) AS BIGINT) AS n_occurrences,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM grams GROUP BY gram HAVING COUNT(*) >= {MIN_COUNT}
)
SELECT * FROM (
  SELECT ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, gram ASC) AS rnk,
         gram, n_occurrences, n_docs
  FROM agg
) WHERE rnk <= 20
"""


def q_decontaminate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE the corpus overlaps the eval benchmark: maximal spans of
    corpus positions whose word {NGRAM}-gram appears in the held-out
    eval slice (doc_id % {EVAL_MOD} == 0 — the q_decontaminate_ngrams
    convention), merged per document (gap <= {NGRAM}, transitive).
    The span-level companion to the per-doc hit counts: production
    pipelines scrub the contaminated WINDOW, not the whole document.

    Plan: eval grams collapse to a broadcast set (benchmark-sized by
    construction); corpus gram positions meet it in a broadcast hash
    join, so only HIT positions shuffle into the flagged-subset span
    window (operators/substring.py::spans_from_flagged)."""
    from ..operators.substring import contamination_spans
    from .curation import EVAL_MOD, NGRAM

    d = load_table(spark, sf_dir, "documents")
    return contamination_spans(
        d.filter(F.col("doc_id") % EVAL_MOD != 0),
        d.filter(F.col("doc_id") % EVAL_MOD == 0),
        k=NGRAM,
        key="string",
    ).orderBy("doc_id", "span_start")


def q_decontaminate_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-level decontamination report over every non-eval
    document: contaminated tokens removed, the rest kept —
    (doc_id, n_tokens, n_spans, dup_tokens, dup_ratio, clean_text);
    clean documents pass through with dup_tokens=0."""
    from ..operators.substring import scrub_contamination
    from .curation import EVAL_MOD, NGRAM

    d = load_table(spark, sf_dir, "documents")
    return scrub_contamination(
        d.filter(F.col("doc_id") % EVAL_MOD != 0),
        d.filter(F.col("doc_id") % EVAL_MOD == 0),
        k=NGRAM,
        key="string",
    ).orderBy("doc_id")


def _contamination_ctes() -> str:
    from .curation import EVAL_MOD, NGRAM

    return f"""
WITH alltoks AS (
  SELECT doc_id, {_TOKS_SQL} AS s FROM documents
),
toks AS (
  SELECT doc_id, s FROM alltoks WHERE doc_id % {EVAL_MOD} <> 0
),
eg AS (
  SELECT DISTINCT array_to_string(list_slice(s, i, i + {NGRAM - 1}), ' ')
           AS gram
  FROM alltoks, unnest(generate_series(1, len(s) - {NGRAM - 1})) AS u(i)
  WHERE len(s) >= {NGRAM} AND doc_id % {EVAL_MOD} = 0
),
grams AS (
  SELECT doc_id, i,
         array_to_string(list_slice(s, i, i + {NGRAM - 1}), ' ') AS gram
  FROM toks, unnest(generate_series(1, len(s) - {NGRAM - 1})) AS u(i)
  WHERE len(s) >= {NGRAM}
),
flagged AS (
  SELECT doc_id, i FROM grams JOIN eg USING (gram)
),
marks AS (
  SELECT doc_id, i,
         CASE WHEN i - LAG(i) OVER (PARTITION BY doc_id ORDER BY i)
                   <= {NGRAM} THEN 0 ELSE 1 END AS new_island
  FROM flagged
),
isl AS (
  SELECT doc_id, i,
         SUM(new_island)
           OVER (PARTITION BY doc_id ORDER BY i) AS island
  FROM marks
),
spans AS (
  SELECT doc_id, MIN(i) AS span_start, MAX(i) + {NGRAM - 1} AS span_end
  FROM isl GROUP BY doc_id, island
)
"""


def _decontaminate_spans_sql() -> str:
    return (
        _contamination_ctes()
        + """
SELECT doc_id,
       CAST(span_start AS BIGINT) AS span_start,
       CAST(span_end AS BIGINT) AS span_end,
       CAST(span_end - span_start + 1 AS BIGINT) AS span_tokens
FROM spans
ORDER BY doc_id, span_start
"""
    )


def _decontaminate_scrub_sql() -> str:
    return (
        _contamination_ctes()
        + """,
agg AS (
  SELECT doc_id,
         COUNT(*) AS n_spans,
         SUM(span_end - span_start + 1) AS dup_tokens
  FROM spans GROUP BY doc_id
),
tok_pos AS (
  SELECT doc_id, t, s[t] AS tok
  FROM toks, unnest(generate_series(1, len(s))) AS u(t)
),
kept AS (
  SELECT tp.doc_id, tp.t, tp.tok
  FROM tok_pos tp
  WHERE NOT EXISTS (
    SELECT 1 FROM spans sp
    WHERE sp.doc_id = tp.doc_id AND tp.t BETWEEN sp.span_start AND sp.span_end
  )
),
clean AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY t) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(d.s) AS BIGINT) AS n_tokens,
       CAST(COALESCE(a.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(COALESCE(a.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       CASE WHEN len(d.s) > 0
            THEN ROUND(COALESCE(a.dup_tokens, 0) / CAST(len(d.s) AS DOUBLE), 6)
       END AS dup_ratio,
       COALESCE(c.clean_text, '') AS clean_text
FROM toks d
LEFT JOIN agg a USING (doc_id)
LEFT JOIN clean c USING (doc_id)
ORDER BY d.doc_id
"""
    )


QUERIES = {
    "repeated_substring_spans": q_repeated_substring_spans,
    "boilerplate_scrub": q_boilerplate_scrub,
    "boilerplate_catalog": q_boilerplate_catalog,
    "decontaminate_spans": q_decontaminate_spans,
    "decontaminate_scrub": q_decontaminate_scrub,
}

ORACLE = {
    "repeated_substring_spans": _REPEATED_SPANS_SQL,
    "boilerplate_scrub": _BOILERPLATE_SCRUB_SQL,
    "boilerplate_catalog": _BOILERPLATE_CATALOG_SQL,
    "decontaminate_spans": _decontaminate_spans_sql(),
    "decontaminate_scrub": _decontaminate_scrub_sql(),
}
