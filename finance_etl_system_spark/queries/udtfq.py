"""Python-UDTF query: LATERAL table-function expansion from SQL.

Exercises functions/udtfs.py::ChunkText end-to-end — each document row
expands to one row per fixed-size chunk via ``..., LATERAL
chunk_text(text, 48)``. The 5%-of-docs filter keeps the Python-path
row count honest at any SF; the production chunker is the JVM-side
chunk_documents (queries/curation.py) — this query is the
extensibility proof (SURVEY §2.9 UDTF surface).

The DuckDB oracle reproduces the expansion with generate_series +
substr — exact string equality, no floats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..functions.udtfs import register_udtfs

_CHUNK = 48

_UDTF_CHUNK_SQL_SPARK = f"""
SELECT d.doc_id, c.idx, c.chunk,
       CAST(LENGTH(c.chunk) AS INT) AS chunk_len
FROM documents d, LATERAL chunk_text(d.text, {_CHUNK}) c
WHERE d.doc_id % 20 = 0
"""

_UDTF_CHUNK_SQL_DUCKDB = f"""
SELECT doc_id,
       CAST(g AS INT) AS idx,
       substr(text, CAST(g AS INT) * {_CHUNK} + 1, {_CHUNK}) AS chunk,
       CAST(LENGTH(substr(text, CAST(g AS INT) * {_CHUNK} + 1, {_CHUNK})) AS INT)
         AS chunk_len
FROM (
  SELECT doc_id, text,
         unnest(generate_series(0,
           CAST(ceil(length(text) / {_CHUNK}.0) - 1 AS BIGINT))) AS g
  FROM documents
  WHERE doc_id % 20 = 0 AND length(text) > 0
) t
"""


def q_udtf_chunk_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size document chunking through a registered Python UDTF
    (LATERAL join); oracle re-derives chunks with generate_series."""
    register_udtfs(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_UDTF_CHUNK_SQL_SPARK)


QUERIES = {"udtf_chunk_text": q_udtf_chunk_text}
ORACLE = {"udtf_chunk_text": _UDTF_CHUNK_SQL_DUCKDB}
