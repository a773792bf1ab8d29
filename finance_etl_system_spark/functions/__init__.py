"""Scalar/column expression library shared by the query tiers."""

from .columns import (
    accuracy_pct,
    cents,
    discounted_revenue,
    money,
    money_sum,
    ratio,
    row_key,
    tick_avg,
    tick_sum,
)

__all__ = [
    "accuracy_pct",
    "cents",
    "discounted_revenue",
    "money",
    "money_sum",
    "ratio",
    "tick_avg",
    "tick_sum",
    "row_key",
]
