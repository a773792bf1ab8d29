"""Hand-built mergeable Misra-Gries heavy-hitters sketch — the
custom-sketch template next to the builtin-backed approximate tier
(approx_count_distinct / approx_percentile in queries/aggregates.py).

Why not just count everything: at 100 TB a token/URL/key frequency
table can itself be billions of rows. Misra-Gries summarizes a stream
with k counters and the classic guarantee: every item with true count
> n/(k+1) survives, and each reported count underestimates the truth
by at most n_partition_items/(k+1) summed over merges. The sketch is
MERGEABLE (Agarwal et al., "Mergeable Summaries", PODS'12): combine
two sketches by summing counts and subtracting the (k+1)-th largest.

Spark-first layout — both phases are DataFrame aggregates:
1. map phase: per-partition sketches via mapInPandas (one dict of k
   counters per partition — bounded memory however large the
   partition);
2. merge phase: explode the per-partition counters and sum per item
   (map-side combinable groupBy — the counter streams are tiny:
   partitions × k rows), then keep the global top k after applying
   the mergeable-summaries offset.

The result intentionally reports LOWER BOUNDS (the MG invariant),
so `count_lo <= true count` always, verified in tests together with
the no-false-negative guarantee. Deterministic for a fixed
partitioning is NOT claimed (per-partition eviction depends on row
order) — the guarantee bounds are what's stable, hence a rows-only
driver entry with accuracy pinned by tests (CLAUDE.md policy).

Reference parity: the reference has no sketches at all (nearest:
exact Mongo $group counts, `/root/reference/spark-job/etl_job.py`);
this belongs to the beyond-reference scale tier.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition(k: int, col: str):
    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in pdfs:
            for item in pdf[col]:
                if item in counters:
                    counters[item] += 1
                elif len(counters) < k:
                    counters[item] = 1
                else:
                    # decrement-all: evict zeroed counters
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame(
            {"item": list(counters), "count_lo": list(counters.values())}
        )

    return run


def heavy_hitters(df: DataFrame, col: str, *, k: int = 64) -> DataFrame:
    """(item, count_lo) for the heavy hitters of ``df[col]``: every
    item with true frequency > n/(k+1) is present; count_lo never
    exceeds the true count. Two aggregates, no full frequency table."""
    partials = df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        _mg_partition(k, col), schema="item string, count_lo long"
    )
    merged = partials.groupBy("item").agg(F.sum("count_lo").alias("count_lo"))
    # mergeable-summaries prune: keep top k by summed lower bound
    return merged.orderBy(F.col("count_lo").desc(), "item").limit(k)
