"""Input-parallelism guard for cheap-rows → expensive-expansion operators.

Shingling, MinHash folding, and n-gram explosion are CPU-heavy per
row. Small local sources (one parquet file, a couple of row groups)
arrive as 1–few partitions, so without a spread the whole expansion
runs on one core. But at 100 TB the scan's file splits already
provide the parallelism, and an unconditional ``repartition`` before
the expansion is a full reshuffle of the raw text — the one
scale-killer-class habit flagged in round 2. This module makes the
spread conditional so both regimes get the right plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread_for_expansion(
    df: DataFrame, key_col: str, *, spread: bool | None = None
) -> DataFrame:
    """Repartition ``df`` by ``key_col`` only when it would help.

    ``spread=None`` (default) auto-detects: reshuffle only when the
    plan's current partition count is below the cluster's default
    parallelism — i.e. a small local source whose expansion would
    otherwise be single-threaded. An already-parallel input (a real
    multi-split scan) passes through UNTOUCHED: no Exchange is added
    ahead of the expansion (plan-asserted in tests/test_plans.py).

    ``spread=True`` forces the reshuffle; ``spread=False`` forbids it
    (the explicit escape hatches for callers that know their layout).

    Trade-off note: when the spread fires, its Exchange doubles as a
    materialization point — multi-consumer downstreams (e.g. a
    shingle frame feeding both a sizes branch and a postings explode)
    reuse it instead of re-deriving the expansion per branch. When an
    already-parallel input passes through untouched, those branches
    recompute from the scan (bounded constant-factor CPU, streaming-
    safe). The alternative — localCheckpoint/cache of the expansion —
    pins corpus-sized state in executor storage, which at 100 TB is a
    worse failure mode than re-scanning; callers that want it anyway
    can checkpoint the returned frame themselves.

    The auto-probe reads the physical partition count off the plan
    (``df.rdd.getNumPartitions()``) — plan conversion only, no job.
    """
    if spread is False:
        return df
    par = df.sparkSession.sparkContext.defaultParallelism
    if spread is None and df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par, F.col(key_col))
