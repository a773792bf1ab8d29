"""Distributed sequence packing: assign rows (documents) to
fixed-token-budget bins in a deterministic global order WITHOUT a
single-partition window.

A pretraining tokenizer pipeline packs documents into context windows
(e.g. 4k/8k tokens). The natural formulation — ``bin = cum_tokens
div budget`` over a global order — needs a global prefix sum, and the
naive ``Window.orderBy(...)`` with no partition key collapses to ONE
task (Spark even warns). At 100 TB that is the difference between a
non-starter and a two-pass plan.

Two-phase prefix sum (the classic parallel scan, expressed
declaratively):

1. range-bucket the order key: ``bucket = h div (key_space //
   buckets)``. The bucketing is MONOTONE in ``h``, so bucket order ==
   global order and within-bucket windows compose into a global scan.
2. per-bucket window cumsum (shuffle keyed by bucket — parallel), plus
   a buckets-sized aggregate of per-bucket totals whose running offset
   (a window over ≤ a few thousand rows — trivially small) is
   broadcast-joined back.

``cum_before = offset + within_cum - weight``; ``bin = cum_before div
budget``. All integer arithmetic → bit-identical on any partitioning,
bucket count, or engine — which is what lets the DuckDB oracle use the
naive one-window formulation (queries/curation.py) and still
hash-match.

Semantics ("streaming fill"): documents are laid head-to-tail in hash
order; a document whose span crosses a budget boundary belongs to the
bin where it STARTS, so bins can overrun by at most one document — the
standard greedy packing used when documents are not split.

The reference has no packing/tokenization stage (its scope stops at
OHLCV rows, `/root/reference/spark-job/etl_job.py`); this is part of
the training-data extension tier (SURVEY §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KEY_SPACE = 2**32  # order keys are expected in [0, KEY_SPACE)


def prefix_pack(
    df: DataFrame,
    *,
    weight_col: str,
    order_col: str,
    tiebreak_col: str,
    budget: int,
    buckets: int = 64,
    base_offset: int = 0,
    materialize: bool = True,
) -> DataFrame:
    """Add ``bin_id``: fixed-``budget`` bin in the total order
    (order_col, tiebreak_col), via a two-phase distributed prefix sum.

    ``order_col`` must be integral in [0, KEY_SPACE); weights must be
    non-negative longs. The result is independent of ``buckets``
    (tested) — it only controls scan parallelism. ``base_offset``
    shifts the whole scan by a carried token total, letting an
    INCREMENTAL caller continue bin numbering exactly where the
    previous batch stopped (pipeline/corpus.py corpus_increment).

    ``materialize`` (default) eagerly localCheckpoints the input
    first (r13, guide §3.3/§5): the scan below fans the input into
    TWO branches (per-bucket window + per-bucket totals) whose
    column-pruning differences defeat exchange reuse, so an
    unmaterialized caller pipeline — typically a full
    tokenize/score pass — executed twice per pack. The input is
    doc-level (one row per packable unit), the sanctioned
    materialization class. Pass False if the input is already a
    materialization barrier.
    """
    if materialize:
        df = df.localCheckpoint(eager=True)
    width = max(1, KEY_SPACE // buckets)
    b = df.withColumn("_bucket", F.expr(f"{order_col} div {width}"))
    w_in = (
        Window.partitionBy("_bucket")
        .orderBy(order_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    b = b.withColumn("_cum_in", F.sum(weight_col).over(w_in))
    totals = b.groupBy("_bucket").agg(F.sum(weight_col).alias("_total"))
    w_off = (
        Window.orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "_bucket",
        F.coalesce(F.sum("_total").over(w_off), F.lit(0)).alias("_offset"),
    )
    return (
        b.join(F.broadcast(offsets), "_bucket")
        .withColumn(
            "bin_id",
            F.expr(
                f"({int(base_offset)} + _offset + _cum_in - {weight_col})"
                f" div {int(budget)}"
            ).cast("long"),
        )
        .drop("_bucket", "_cum_in", "_offset")
    )
