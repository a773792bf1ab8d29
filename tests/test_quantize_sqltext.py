"""Bit-exactness pins for the r14 SQL-text construction paths in
operators/quantize.py (symmetric int8 quantization + the SQ8
exact-rerank projection).

Same discipline as the other *_sqltext pins: each converted piece is
compared against the pre-r14 Column formulation rebuilt verbatim
inline, on real fixture embeddings — schemas equal and ``exceptAll``
empty in BOTH directions.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from finance_etl_system_spark.catalog import load_table
from finance_etl_system_spark.operators.quantize import (
    Q_MAX,
    cosine_topk_sq8,
    quantize_int8,
)
from finance_etl_system_spark.operators.similarity import (
    _as_double,
    _dot,
    _norm,
)

from tests.conftest import SF_SMOKE


def _frames_equal(a, b):
    assert a.schema == b.schema, f"{a.schema} != {b.schema}"
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def _quantize_int8_columns(df, vec_col="embedding", *, out_codes="qv",
                           out_scale="q_scale"):
    """Pre-r14 Column formulation, verbatim."""
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


def test_quantize_int8_sql_matches_columns(spark):
    e = load_table(spark, SF_SMOKE, "embeddings")
    _frames_equal(quantize_int8(e), _quantize_int8_columns(e))


def test_sq8_exact_rerank_matches_columns(spark):
    """End-to-end SQ8 search vs a reference whose exact-rerank block
    is the pre-r14 Column formulation (the coarse pandas-UDF pass is
    shared code, so any divergence isolates to the converted
    projection)."""
    from pyspark.sql import Window

    e = load_table(spark, SF_SMOKE, "embeddings")
    queries = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    new = cosine_topk_sq8(queries, e, k=10, rerank=50)

    coarse = cosine_topk_sq8(queries, e, k=10, rerank=50).select(
        "qid", "cid", "coarse"
    )
    qv = queries.select(
        F.col("query_id").alias("qid"),
        _as_double(F.col("embedding")).alias("qv"),
    )
    cv = e.select(
        F.col("vec_id").alias("cid"),
        _as_double(F.col("embedding")).alias("cv"),
    )
    ref = (
        cv.join(F.broadcast(coarse), "cid")
        .join(F.broadcast(qv), "qid")
        .select(
            "qid",
            "cid",
            "coarse",
            F.round(
                F.try_divide(
                    _dot(F.col("qv"), F.col("cv")),
                    _norm(F.col("qv")) * _norm(F.col("cv")),
                ),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cosine").desc(), F.col("cid").asc()
    )
    ref = (
        ref.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select("qid", "rnk", "cid", "cosine", "coarse")
    )
    _frames_equal(new, ref)
