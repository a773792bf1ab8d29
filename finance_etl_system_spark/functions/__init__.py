"""Scalar/column expression library shared by the query tiers."""

from .columns import (
    accuracy_pct,
    cents,
    discounted_revenue,
    money,
    ratio,
    row_key,
)

__all__ = [
    "accuracy_pct",
    "cents",
    "discounted_revenue",
    "money",
    "ratio",
    "row_key",
]
