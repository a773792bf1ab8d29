"""Reusable DataFrame shapes.

``ranked_topk`` encodes the repo's top-k policy: a global
``row_number()`` window ranks the WHOLE frame through one
single-partition WindowExec — the classic hidden scale-killer — while
``orderBy(...).limit(k)`` plans as a distributed
TakeOrderedAndProject (per-partition heaps, driver merges k rows).
The rank column is assigned AFTER the limit, so the only
single-partition window in the plan runs over k rows. Output is
bit-identical to the window form whenever the sort key is total
(callers follow the oracle policy: rounded score + unique id
tiebreak).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ranked_topk(df: DataFrame, key: list[Column], k: int) -> DataFrame:
    """Top-``k`` rows of ``df`` by ``key`` (a total order), with a
    1-based ``rnk`` column — TakeOrderedAndProject, not a global
    window."""
    w = Window.orderBy(*key)
    return (
        df.orderBy(*key).limit(k).withColumn("rnk", F.row_number().over(w))
    )
