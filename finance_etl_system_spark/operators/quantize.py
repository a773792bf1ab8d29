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
    return F.transform(col, lambda x: x.cast("double"))


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
