"""Skew mitigation (SURVEY §2.10 scale posture: "salted keys for skew").

AQE's skew-join split handles most batch cases; explicit salting
remains necessary when (a) AQE is unavailable (stream-stream joins,
stateful ops), (b) one key dominates so heavily that even split
partitions overwhelm a task, or (c) a skewed groupBy needs two-phase
aggregation. These operators implement the classic patterns with
deterministic salts (hash-derived, not random — replay-stable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to left-side key skew.

    Left rows get a deterministic salt in [0, salt) derived from a
    row-content hash; right rows are replicated salt×. The join key
    becomes (key, salt), splitting each hot key across ``salt``
    shuffle partitions. Right-side replication cost: |right| × salt —
    use for dimension-sized right sides (for big-big skew, prefer AQE).

    ``how`` is restricted to joins where right-side replication cannot
    change the result: inner/cross match sets are unaffected, left
    outer/semi/anti see the right side only as a match probe. Right and
    full outer joins would emit every unmatched right row salt× and are
    rejected.
    """
    allowed = {"inner", "cross", "left", "leftouter", "left_outer",
               "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: the right side is "
            f"replicated {salt}x, so right/full outer joins would duplicate "
            "unmatched right rows. Use AQE skew handling for those."
        )
    non_key_cols = [c for c in left.columns if c != key]
    salt_src = F.xxhash64(*[F.col(c) for c in non_key_cols]) if non_key_cols else F.xxhash64(F.col(key))
    l = left.withColumn("_salt", F.pmod(salt_src, F.lit(salt)).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    r = right.withColumn("_salt", salts)
    return l.join(r, [key, "_salt"], how).drop("_salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    aggs: list[tuple[str, str, str]],
    *,
    salt: int = 16,
) -> DataFrame:
    """Skewed groupBy as partial→final aggregation with an explicit
    salted first phase.

    ``aggs``: (col, fn, alias) with fn ∈ {sum, count, min, max}
    (the re-aggregatable family — avg is sum/count composed by the
    caller). Catalyst already does map-side partial aggregation; the
    explicit salt additionally splits a hot key across reducers when
    one key's partials still overwhelm a single reduce task.

    The salt is a content hash of the full row — replay-stable even if
    a shuffle partition is recomputed with a different row order
    (monotonically_increasing_id would not be: SPARK-23207). Exact
    duplicate rows share a salt bucket; that skews the split only when
    one identical row dominates, which the re-aggregation still handles
    correctly.
    """
    supported = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    refold = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for _, fn, _ in aggs:
        if fn not in supported:
            raise ValueError(f"unsupported agg {fn!r}; use {sorted(supported)}")

    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))
    )
    phase1 = salted.groupBy(key, "_salt").agg(
        *[supported[fn](c).alias(f"_p_{alias}") for c, fn, alias in aggs]
    )
    return phase1.groupBy(key).agg(
        *[refold[fn](f"_p_{alias}").alias(alias) for _, fn, alias in aggs]
    )
