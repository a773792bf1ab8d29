"""Scalar int8 quantization of embedding columns (SURVEY §2.10 X2
adjunct — the memory-side half of similarity search at scale).

A 100 TB embedding corpus at float32 is 4 bytes/dim; symmetric int8
scalar quantization cuts that 4x (plus a per-vector scale), which is
the difference between an ANN index fitting in cluster RAM or not.
This module implements the standard symmetric scheme

    scale = max_i |v_i| / 127,   q_i = floor(v_i / scale + 0.5)

entirely with JVM array expressions (``transform`` / ``aggregate`` /
``zip_with``) — no Python in the row path, so quantization runs inside
whole-stage codegen and is embarrassingly parallel (zero shuffles).

``floor(x + 0.5)`` is used instead of ``round`` deliberately: its
semantics are identical in every engine (Spark, DuckDB, numpy), while
round-half-to-even vs half-up differs — keeping the quantized codes
bit-reproducible across engines is what lets the oracle check the
whole pipeline value-exactly.

Reference parity note: the reference system has no quantization tier
(its ES vectors stay float); this is part of the mandated
training-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Q_MAX = 127


def _as_double(col: Column) -> Column:
    # kept as a local alias; the canonical fold helpers (_dot/_norm)
    # live in operators/similarity.py and cosine_topk_sq8 imports them
    from .similarity import _as_double as impl

    return impl(col)


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    *,
    out_codes: str = "qv",
    out_scale: str = "q_scale",
) -> DataFrame:
    """Add symmetric-int8 codes and the per-vector scale.

    All-zero vectors quantize to all-zero codes with scale 0 (the
    CASE guard mirrors the SQL oracle exactly). Codes are longs in
    [-127, 127]; a sink can cast to byte for storage.
    """
    v = _as_double(F.col(vec_col))
    maxabs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = maxabs / F.lit(float(Q_MAX))
    codes = F.transform(
        v,
        lambda x: F.when(scale == 0, F.lit(0).cast("long")).otherwise(
            F.floor(x / scale + F.lit(0.5))
        ),
    )
    return df.withColumn(out_scale, scale).withColumn(out_codes, codes)


def dequantize(codes: Column, scale: Column) -> Column:
    """Reconstruct doubles from int8 codes: q_i * scale."""
    return F.transform(codes, lambda q: q.cast("double") * scale)


def cosine_topk_sq8(
    queries: "DataFrame",
    corpus: "DataFrame",
    *,
    k: int = 10,
    rerank: int = 50,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> "DataFrame":
    """Scalar-quantized (SQ8) similarity search: int8 coarse scoring,
    exact float rerank — the FAISS-SQ8 pattern in pure DataFrame ops.

    The coarse cosine needs NO float vector data at all:

        cos ≈ Σ q_i c_i / sqrt(Σ q_i² · Σ c_i²)

    (the per-vector scales cancel), so the scan-side work is integer
    multiply-adds over int8 codes — the form a columnar engine
    vectorizes hardest, and the corpus can be stored 4× smaller with
    the float vectors fetched only for the ≤``rerank`` survivors per
    query. Integer dots are EXACT in any order, which is why even the
    coarse tier oracle-checks value-identically across engines.

    Plan shape: broadcast(queries) ⋈ corpus (corpus never shuffles),
    coarse top-``rerank`` per query via window, exact cosine on
    survivors only, top-``k``.
    """
    from pyspark.sql import Window

    from .similarity import _as_double, _dot, _norm

    def prep(df, id_col, alias):
        q = quantize_int8(df, vec_col, out_codes="c", out_scale="s")
        return q.select(
            F.col(id_col).alias(alias),
            F.col("c").alias(f"{alias}_c"),
            F.aggregate(
                F.col("c"), F.lit(0).cast("long"), lambda a, x: a + x * x
            ).alias(f"{alias}_n2"),
        )

    # the coarse pass touches ONLY codes + norms — no float vectors
    # on the corpus scan or through the top-rerank window (that 4×
    # payload cut is the operator's whole point)
    qd = prep(queries, query_id, "qid")
    cd = prep(corpus, corpus_id, "cid")
    intdot = F.aggregate(
        F.zip_with(F.col("qid_c"), F.col("cid_c"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    coarse_scored = cd.crossJoin(F.broadcast(qd)).select(
        "qid",
        "cid",
        F.round(
            intdot
            / F.sqrt((F.col("qid_n2") * F.col("cid_n2")).cast("double")),
            6,
        ).alias("coarse"),
    )
    wc = Window.partitionBy("qid").orderBy(
        F.col("coarse").desc(), F.col("cid").asc()
    )
    survivors = (
        coarse_scored.withColumn("crnk", F.row_number().over(wc))
        .filter(F.col("crnk") <= rerank)
        .select("qid", "cid", "coarse")
    )

    # float vectors fetched ONLY for the ≤ n_queries×rerank survivors:
    # broadcast the survivor id set into the corpus scan (a
    # semi-join-shaped broadcast hash join — the corpus still never
    # shuffles), queries re-broadcast by qid
    qv = queries.select(
        F.col(query_id).alias("qid"), _as_double(F.col(vec_col)).alias("qv")
    )
    cv = corpus.select(
        F.col(corpus_id).alias("cid"), _as_double(F.col(vec_col)).alias("cv")
    )
    exact = (
        cv.join(F.broadcast(survivors), "cid")
        .join(F.broadcast(qv), "qid")
        .select(
            "qid",
            "cid",
            "coarse",
            F.round(
                _dot(F.col("qv"), F.col("cv"))
                / (_norm(F.col("qv")) * _norm(F.col("cv"))),
                6,
            ).alias("cosine"),
        )
    )
    we = Window.partitionBy("qid").orderBy(
        F.col("cosine").desc(), F.col("cid").asc()
    )
    return (
        exact.withColumn("rnk", F.row_number().over(we))
        .filter(F.col("rnk") <= k)
        .select("qid", "rnk", "cid", "cosine", "coarse")
    )
