"""Join operators beyond plain ``df.join`` (SURVEY §2.3 J1-J9).

The reference has zero DataFrame joins — its join-like semantics are
Mongo key lookups (reference spark-job/etl_job.py:102) and pandas
``shift`` alignment (reference ml-service/ml_pipeline.py:142). The new
engine exposes the full join family; this module adds the two shapes
Spark has no single primitive for: **as-of join** and a helper for
**range joins** that keeps an equi-key so Catalyst doesn't fall back
to a cartesian product.

Scale notes: ``asof_join`` is the union+window formulation — ONE
shuffle on (keys), no join explosion, state bounded per key. That is
the 100 TB-safe plan; a ``merge_asof`` via ``applyInPandas`` would
materialize each key group in pandas instead (kept as an alternative
for exotic tolerance semantics, not the default).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] = (),
    right_values: Sequence[str] = (),
    *,
    suffix: str = "_right",
    strict: bool = False,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, the most recent right row
    with ``right.on <= left.on`` (``<`` when ``strict``), per ``by`` keys.
    With ``tolerance_seconds`` (pandas ``merge_asof(tolerance=...)``
    parity), a carried value older than the tolerance is nulled out —
    each value column carries its own observation timestamp through
    the same LOCF window (one extra column per value, not a second
    join), so staleness is judged against the row that actually
    provided the value under the skip-null LOCF semantics.

    Implemented as union + last-observation-carried-forward window:

    1. tag sides, union aligned columns
    2. per ``by`` key ordered by (on, side-priority), carry the last
       non-null right value forward
    3. keep only left rows

    Matches DuckDB ``ASOF JOIN`` semantics (used as this operator's
    oracle). Right rows are deduplicated to the last row per
    (by, on) — ties on the timestamp resolve to the right row, like
    ASOF's ``>=``.

    Caveat: a right row whose VALUE column is genuinely NULL is
    skipped by the carried-forward window (``last(ignorenulls)``) —
    the previous non-null observation wins, LOCF-style — whereas a
    true ASOF join would surface that NULL. Pre-filter or sentinel
    such rows if NULL observations are meaningful.
    """
    by = list(by)
    right_values = list(right_values) or [
        c for c in right.columns if c != on and c not in by
    ]
    if tolerance_seconds is not None:
        # staleness arithmetic needs an ordered temporal/numeric axis;
        # a string `on` would cast to NULL and silently disable the
        # tolerance instead of erroring
        from pyspark.sql.types import NumericType, TimestampType

        for side in (left, right):
            dt = side.schema[on].dataType
            if not isinstance(dt, (TimestampType, NumericType)):
                raise TypeError(
                    f"tolerance_seconds requires a timestamp or numeric "
                    f"'{on}' column, got {dt.simpleString()}"
                )

    out_cols = [f"{c}{suffix}" for c in right_values]
    # Deterministic right side: collapse duplicate (by, on) rows via
    # per-column max (DuckDB ASOF picks an arbitrary one; we pin it).
    r = (
        right.select(
            *by,
            F.col(on).alias(on),
            *[F.col(c).alias(oc) for c, oc in zip(right_values, out_cols)],
        )
        .groupBy(*by, on)
        .agg(*[F.max(oc).alias(oc) for oc in out_cols])
        .withColumn("__is_right", F.lit(1))
    )
    if tolerance_seconds is not None:
        # ONE carried observation timestamp PER value column, nulled
        # wherever that value column is null — so each value's
        # staleness is judged against the row that actually PROVIDED
        # it under the LOCF skip-null semantics (a single shared
        # timestamp would take its age from a newer NULL-valued right
        # row and pass a beyond-tolerance value off as fresh)
        for oc in list(out_cols):
            r = r.withColumn(
                f"__ron_{oc}",
                F.when(F.col(oc).isNotNull(), F.col(on)),
            )
        out_cols = out_cols + [f"__ron_{oc}" for oc in out_cols]
    l = left.select(
        *left.columns, F.lit(0).alias("__is_right")
    )
    for oc in out_cols:
        l = l.withColumn(oc, F.lit(None).cast(r.schema[oc].dataType))
    union_cols = by + [on] + out_cols + ["__is_right"]
    extra_left_cols = [c for c in left.columns if c not in union_cols]
    for c in extra_left_cols:
        r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l.select(*union_cols, *extra_left_cols).unionByName(
        r.select(*union_cols, *extra_left_cols)
    )

    # Right rows sort before left rows at equal `on` so a tie is
    # visible to the left row (ASOF >=). With strict=True, left rows
    # sort first, hiding the tie (ASOF >).
    side_order = F.col("__is_right").desc() if not strict else F.col("__is_right").asc()
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *union_cols,
        *extra_left_cols,
        *[
            F.last(oc, ignorenulls=True).over(w).alias(f"__filled_{oc}")
            for oc in out_cols
        ],
    )
    result = filled.filter(F.col("__is_right") == 0).select(
        *by,
        on,
        *extra_left_cols,
        *[F.col(f"__filled_{oc}").alias(oc) for oc in out_cols],
    )
    if tolerance_seconds is not None:
        out_cols = [oc for oc in out_cols if not oc.startswith("__ron_")]
        from pyspark.sql.types import TimestampType

        is_ts = isinstance(result.schema[on].dataType, TimestampType)
        for oc in out_cols:
            ron = F.col(f"__ron_{oc}")
            if is_ts:
                # integer-microsecond arithmetic: exact, and identical
                # to the DuckDB oracle's epoch_us() diff (no double
                # rounding at the tolerance boundary)
                stale = (F.unix_micros(F.col(on)) - F.unix_micros(ron)) > F.lit(
                    int(tolerance_seconds * 1_000_000)
                )
            else:
                stale = (F.col(on).cast("double") - ron.cast("double")) > F.lit(
                    float(tolerance_seconds)
                )
            result = result.withColumn(
                oc, F.when(stale, F.lit(None)).otherwise(F.col(oc))
            ).drop(f"__ron_{oc}")
    return result


def banded_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    *,
    after_seconds: int,
    bucket_seconds: int | None = None,
) -> DataFrame:
    """Big-big time-interval join WITHOUT an equi key: every left row
    matched to right rows with right_ts in [left_ts, left_ts + after].

    A bare interval predicate degenerates to BroadcastNestedLoopJoin —
    quadratic, and impossible when neither side broadcasts. Banding
    restores an equi key: time is cut into fixed buckets, the right
    side keys by its own bucket, the left side EXPLODES to every
    bucket its interval overlaps (⌈after/bucket⌉+1 rows, a small
    constant), and the join runs hash-partitioned on the bucket id
    with the exact interval predicate as a post-filter. Each right row
    lives in exactly one bucket, so no pair meets twice and no dedup
    pass is needed. Shuffle volume: |left|·(k+1) + |right| rows — at
    100 TB this is the only viable shape for keyless interval joins.

    Both timestamp columns must be actual timestamps; sub-second
    precision is preserved (epoch arithmetic in double only picks
    candidate buckets — the final predicate compares raw timestamps).
    """
    w = int(bucket_seconds or after_seconds)
    if w <= 0:
        raise ValueError("bucket_seconds must be positive")
    l_epoch = F.col(left_ts).cast("double")
    r_epoch = F.col(right_ts).cast("double")
    l = left.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(l_epoch / w).cast("long"),
                F.floor((l_epoch + after_seconds) / w).cast("long"),
            )
        ),
    )
    r = right.withColumn("_bucket", F.floor(r_epoch / w).cast("long"))
    exact = (F.col(right_ts) >= F.col(left_ts)) & (
        F.col(right_ts)
        <= F.col(left_ts) + F.expr(f"INTERVAL {after_seconds} SECONDS")
    )
    return l.join(r, "_bucket").filter(exact).drop("_bucket")


def range_join(
    fact: DataFrame,
    dim: DataFrame,
    equi: Sequence[tuple[str, str]],
    range_cond: Column,
    how: str = "inner",
    *,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Theta/range join that keeps its equi-keys explicit.

    A bare ``a.join(b, theta_cond)`` degenerates to
    BroadcastNestedLoopJoin; passing the equi part separately lets
    Catalyst hash-partition on it and apply the range predicate as a
    post-filter. For a small dim, broadcast wins outright.
    """
    cond = None
    for lc, rc in equi:
        piece = fact[lc] == dim[rc]
        cond = piece if cond is None else cond & piece
    cond = range_cond if cond is None else cond & range_cond
    d = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(d, cond, how)
