"""Per-group time-series forecasting: Holt's linear-trend (double
exponential smoothing) — the classical short-horizon forecaster a
finance ETL runs after the indicator pass (the reference's ML tier
predicts next-day price from indicator features,
ml-service/ml_pipeline.py; Holt is the model-free twin that needs no
feature matrix, just the series).

    level_t = alpha * y_t + (1 - alpha) * (level_{t-1} + trend_{t-1})
    trend_t = beta * (level_t - level_{t-1}) + (1 - beta) * trend_{t-1}
    yhat_{T+h} = level_T + h * trend_T

The recursion is sequential per series but the corpus is
many-small-series (millions of symbols × thousands of ticks at
100 TB), and grouped ``applyInPandas`` pays a per-group Arrow/pandas
round-trip that dominates when groups are small (measured ~6 ms/group
= 10 s for 1500 series of ~70 rows, vs 0.12 s of actual math). So
this operator uses the partition-vectorized shape instead:

    repartition(group) → sortWithinPartitions(group, time)
      → mapInPandas(whole-partition batches, carry split groups)

One Python invocation handles ~n_rows/n_partitions rows covering many
complete series (a pandas groupby inside), and a carry buffer stitches
the one series that Arrow may split across adjacent batches of the
same partition. Same O(series) parallelism, ~1/50th the Python
boundary crossings.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def holt_numpy(
    y: np.ndarray, alpha: float, beta: float
) -> tuple[float, float]:
    """Final (level, trend) of Holt's method, initialized with
    level = y[0], trend = y[1] - y[0] (classical init; series of
    length 1 gets trend 0)."""
    level = float(y[0])
    trend = float(y[1] - y[0]) if len(y) > 1 else 0.0
    for v in y[1:]:
        prev = level
        level = alpha * float(v) + (1.0 - alpha) * (level + trend)
        trend = beta * (level - prev) + (1.0 - beta) * trend
    return level, trend


def holt_forecast(
    df: DataFrame,
    *,
    group_col: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.5,
    beta: float = 0.3,
    horizon: int = 5,
) -> DataFrame:
    """Holt linear-trend forecast per group: ``horizon`` rows per
    group with columns (group, h, forecast, level, trend).

    Rows arrive at the Python worker already sorted by
    (group, time) — sortWithinPartitions does the ordering JVM-side —
    and nulls are dropped per series before the recursion (dropna
    preserves the time order). Deterministic for a fixed series
    regardless of partitioning; (group, time) uniqueness is the
    SCALE.md fixture invariant that pins the fold order.
    """
    from pyspark.sql.types import (
        IntegerType,
        DoubleType,
        StructField,
        StructType,
    )

    # the group column keeps its incoming type (symbols are usually
    # strings; the fixture key is a long) — hardcoding would break
    # any non-long key at the Arrow boundary
    schema = StructType(
        [
            StructField(group_col, df.schema[group_col].dataType),
            StructField("h", IntegerType()),
            StructField("forecast", DoubleType()),
            StructField("level", DoubleType()),
            StructField("trend", DoubleType()),
        ]
    )
    hs = np.arange(1, horizon + 1)

    def series_rows(g: pd.DataFrame) -> pd.DataFrame | None:
        y = g[value_col].dropna().to_numpy(dtype=np.float64)
        if len(y) == 0:
            return None
        level, trend = holt_numpy(y, alpha, beta)
        return pd.DataFrame(
            {
                group_col: g[group_col].iloc[0],
                "h": hs.astype(np.int32),
                "forecast": level + hs * trend,
                "level": level,
                "trend": trend,
            }
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            # the last group in the batch may continue in the next
            # Arrow batch of this partition — hold it back
            last = pdf[group_col].iloc[-1]
            boundary = pdf[group_col] == last
            carry = pdf[boundary]
            complete = pdf[~boundary]
            if len(complete):
                out = [
                    r
                    for _, g in complete.groupby(group_col, sort=False)
                    if (r := series_rows(g)) is not None
                ]
                if out:
                    yield pd.concat(out, ignore_index=True)
        if carry is not None and len(carry):
            r = series_rows(carry)
            if r is not None:
                yield r

    return (
        df.select(group_col, time_col, value_col)
        .repartition(group_col)
        .sortWithinPartitions(group_col, time_col)
        .mapInPandas(run, schema=schema)
    )
