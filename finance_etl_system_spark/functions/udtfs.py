"""Python UDTF surface (Spark 3.5+ ``@udtf``): user-defined TABLE
functions callable from SQL with LATERAL — the row-expanding extension
point the reference approximates with driver-side Python loops over
cursors (reference ml-service/ml_pipeline.py iterates symbols in
Python; here expansion happens inside the plan, per-partition).

UDTFs are the Python slow path: use them to prove the extension
surface, not for hot-path chunking (queries/curation.py's
chunk_documents does the same work with built-in SQL functions at JVM
speed). Scale: a UDTF runs per-partition with no shuffle of its own —
cost is the Python round-trip, parallelism is the scan's.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="idx int, chunk string")
class ChunkText:
    """Split a string into fixed-size chunks: one output row per
    chunk, (chunk index, chunk text). Empty/NULL input yields no
    rows — mirrors generate_series semantics in the SQL oracle."""

    def eval(self, text: str, size: int):  # noqa: D102
        if not text or size is None or size <= 0:
            return
        for i in range(0, len(text), size):
            yield i // size, text[i : i + size]


def register_udtfs(spark: SparkSession) -> None:
    """Register every engine UDTF on the given session (idempotent)."""
    spark.udtf.register("chunk_text", ChunkText)
