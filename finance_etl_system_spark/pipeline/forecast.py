"""Per-group time-series forecasting: Holt's linear-trend (double
exponential smoothing) — the classical short-horizon forecaster a
finance ETL runs after the indicator pass (the reference's ML tier
predicts next-day price from indicator features,
ml-service/ml_pipeline.py; Holt is the model-free twin that needs no
feature matrix, just the series).

    level_t = alpha * y_t + (1 - alpha) * (level_{t-1} + trend_{t-1})
    trend_t = beta * (level_t - level_{t-1}) + (1 - beta) * trend_{t-1}
    yhat_{T+h} = level_T + h * trend_T

The recursion is inherently sequential per series, so each series is
one ``applyInPandas`` group — the same shape as the exact-EMA tier
(pipeline/indicators.py): one shuffle keyed by symbol, state = one
pandas frame per series in a worker, series count parallelism. That
is the right decomposition at 100 TB, where you have millions of
short series, not one long one.
"""

from __future__ import annotations

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

    Rows inside each group are sorted by ``time_col`` in the worker
    (Spark does not guarantee group order into applyInPandas), nulls
    dropped, and the recursion runs in float64 — deterministic for a
    fixed series regardless of partitioning.
    """
    schema = (
        f"{group_col} long, h int, forecast double, "
        "level double, trend double"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.dropna(subset=[value_col]).sort_values(time_col)
        key = pdf[group_col].iloc[0]
        y = pdf[value_col].to_numpy(dtype=np.float64)
        if len(y) == 0:
            return pd.DataFrame(
                columns=[group_col, "h", "forecast", "level", "trend"]
            )
        level, trend = holt_numpy(y, alpha, beta)
        hs = np.arange(1, horizon + 1)
        return pd.DataFrame(
            {
                group_col: key,
                "h": hs.astype(np.int32),
                "forecast": level + hs * trend,
                "level": level,
                "trend": trend,
            }
        )

    return df.select(group_col, time_col, value_col).groupBy(group_col).applyInPandas(
        fit, schema=schema
    )
