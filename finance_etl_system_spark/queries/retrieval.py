"""Full-text retrieval scoring over the documents table: BM25.

Extends SURVEY §2.10 X4 (the reference indexes documents into
Elasticsearch and queries by relevance — reference
spark-job/etl_job.py ES sink; this is the engine-native equivalent
of that ranked-retrieval path, so a user can score a keyword query
without an external search cluster).

BM25(d, Q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
with the Lucene-style non-negative idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).

Scale shape: one explode over the corpus feeds BOTH the per-doc
length aggregate and the per-(doc, term) tf for the query terms —
two map-side-combinable shuffles keyed by doc_id. The document
frequency table is vocabulary-of-the-query-sized (broadcast), and
avgdl/N are two scalars. Nothing driver-side grows with the corpus.

Determinism: the score is rounded to 6dp on both engines and the
top-k ranks by (rounded score desc, doc_id) — a unique tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

K1 = 1.2
B = 0.75
QUERY_TERMS = ["stream", "merge", "partition"]
TOP_K = 20


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents for a fixed keyword query, BM25-ranked."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), " +"), lambda x: x != "")
        ).alias("term"),
    )
    # one scan feeds both aggregates; Catalyst reuses the exchange
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    )
    tf = (
        toks.filter(F.col("term").isin(QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn("avgdl", F.col("total_dl") / F.col("n_docs"))
        .withColumn(
            "contrib",
            F.col("idf")
            * F.col("tf")
            * F.lit(K1 + 1.0)
            / (
                F.col("tf")
                + F.lit(K1)
                * (F.lit(1.0 - B) + F.lit(B) * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("contrib"), 6).alias("bm25"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
    )
    w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("rnk", "doc_id", "bm25", "n_terms_hit")
    )


_BM25_SQL = f"""
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents,
       LATERAL unnest(string_split_regex(lower(text), ' +')) AS t(term)
  WHERE t.term <> ''
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
corpus AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_dl FROM dl),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM toks
  WHERE term IN ('stream', 'merge', 'partition')
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         ROUND(SUM(
           ln(1.0 + (corpus.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * tf.tf * ({K1} + 1.0)
           / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl
                              / (CAST(corpus.total_dl AS DOUBLE) / corpus.n_docs)))
         ), 6) AS bm25,
         COUNT(*) AS n_terms_hit
  FROM tf
  JOIN dfreq USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN corpus
  GROUP BY tf.doc_id
)
SELECT * FROM (
  SELECT ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rnk,
         doc_id, bm25, n_terms_hit
  FROM scored
) WHERE rnk <= {TOP_K}
"""

QUERIES = {"bm25_search": q_bm25_search}
ORACLE = {"bm25_search": _BM25_SQL}
