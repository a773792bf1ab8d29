"""Pandas UDAF surface (grouped-aggregate ``pandas_udf``) — the
user-defined AGGREGATE extension point, completing the UDF / UDAF /
UDTF triad (SURVEY §2.9; scalar pandas UDFs live in operators/dedup.py
and operators/similarity.py, the UDTF in functions/udtfs.py).

A grouped-agg pandas UDF receives each group's columns as pandas
Series (one Arrow batch per group) and returns ONE scalar — Spark
runs it inside HashAggregate, so the shuffle shape is identical to a
builtin aggregate: partial batches per partition are NOT possible
(no partial aggregation / map-side combine for pandas UDAFs), which
is exactly why the builtin-function path stays the default and this
surface is reserved for aggregates Spark lacks.

Demonstrator: exact WEIGHTED median — no builtin computes it
(percentile/median ignore weights), yet it is the right robust center
for volume-weighted prices. Integer-tick inputs keep it exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


# LongType() (not the DDL string "long"): parsing a DDL string needs an
# active SparkSession, which would make importing this module fail when
# the registry is enumerated before the driver creates one.
@F.pandas_udf(LongType())
def weighted_median_ticks(ticks: pd.Series, w: pd.Series) -> int:
    """Lower weighted median: smallest tick t whose cumulative weight
    (over ticks sorted ascending) reaches half the total.

    All-integer arithmetic (2*cum >= total avoids the float half) —
    bit-deterministic for any row order, so the aggregate is safe
    under shuffle-partition recomputation. NULL/NaN ticks or weights
    are dropped pairwise (an int64 cast of NaN would otherwise crash
    executor-side); an all-null group aggregates to NULL."""
    mask = ticks.notna() & w.notna()
    if not mask.any():
        return None
    ticks, w = ticks[mask], w[mask]
    t = np.asarray(ticks, dtype=np.int64)
    wt = np.asarray(w, dtype=np.int64)
    order = np.argsort(t, kind="stable")
    cum = np.cumsum(wt[order])
    total = int(cum[-1])
    idx = int(np.searchsorted(cum * 2, total, side="left"))
    return int(t[order][idx])
