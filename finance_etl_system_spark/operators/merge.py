"""CDC merge-apply: apply a keyed change feed (upsert/delete ops with
a change sequence) onto a snapshot — MERGE INTO semantics as a pure
DataFrame composition, the type-1 sibling of pipeline/scd.py's type-2
history builder.

The reference's closest behavior is the ETL job's per-symbol
overwrite and the Mongo/ES upsert-by-id sinks
(`/root/reference/spark-job/etl_job.py` write paths) — it re-writes
whole partitions instead of merging a delta. This operator is the
general primitive: latest-change-wins per key, deletes drop rows,
inserts survive for keys absent from the snapshot.

Plan shape / scale posture:
- the change feed collapses to ONE row per key first (max_by over the
  sequence — a map-side-combinable aggregate, NOT a window sort), so
  the join that follows moves |keys-changed| rows, not |changes|.
- snapshot ⋈ latest is a single full-outer shuffle join on the key.
  The snapshot side dominates at 100 TB; when both sides are written
  bucketed by the key (sources/bucketing.py) the merge is
  shuffle-free. A small delta against a huge snapshot is the classic
  case for storage-side merge-on-read; engine-side, AQE broadcasts
  the delta automatically when it fits.
- every output column is a coalesce over the two sides — pure
  projection, whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OP_COL = "op"  # 'U' upsert, 'D' delete
SEQ_COL = "seq"  # change ordering; highest wins per key


def latest_change_per_key(changes: DataFrame, key: str) -> DataFrame:
    """One surviving change per key: the one with the highest SEQ_COL
    (ties impossible when seq is unique per key; callers guarantee).

    max_by keeps this a regular aggregate — partial map-side combine,
    no per-key sort state — unlike the row_number window idiom."""
    payload = [c for c in changes.columns if c not in (key, SEQ_COL)]
    agg = [F.max_by(F.struct(*payload), F.col(SEQ_COL)).alias("_p")]
    return (
        changes.groupBy(key)
        .agg(*agg)
        .select(key, *[F.col(f"_p.{c}").alias(c) for c in payload])
    )


def merge_apply(
    snapshot: DataFrame,
    changes: DataFrame,
    *,
    key: str,
    set_cols: Mapping[str, str],
) -> DataFrame:
    """Apply ``changes`` (key, SEQ_COL, OP_COL, payload...) to
    ``snapshot``. ``set_cols`` maps snapshot column -> change payload
    column updated on upsert; unmapped snapshot columns carry through
    (null for fresh inserts). Returns the merged snapshot plus a
    ``merge_action`` column ('inserted' | 'updated' | 'kept').
    """
    latest = latest_change_per_key(changes, key)
    ch = latest.select(
        F.col(key).alias("_k"),
        F.col(OP_COL).alias("_op"),
        *[F.col(src).alias(f"_v_{dst}") for dst, src in set_cols.items()],
    )
    joined = snapshot.join(ch, snapshot[key] == ch._k, "full_outer")
    merged = joined.filter(F.col("_op").isNull() | (F.col("_op") != "D"))
    out_cols = [F.coalesce(F.col(key), F.col("_k")).alias(key)]
    for c in snapshot.columns:
        if c == key:
            continue
        if c in set_cols:
            out_cols.append(
                F.when(F.col("_op") == "U", F.col(f"_v_{c}"))
                .otherwise(F.col(c))
                .alias(c)
            )
        else:
            out_cols.append(F.col(c).alias(c))
    out_cols.append(
        F.when(F.col(key).isNull(), F.lit("inserted"))
        .when(F.col("_op") == "U", F.lit("updated"))
        .otherwise(F.lit("kept"))
        .alias("merge_action")
    )
    return merged.select(*out_cols)
