"""Plan inspection: programmatic access to the physical-plan
properties the 100 TB design depends on (SURVEY §4)."""

from .inspect import (
    broadcast_join_count,
    exchange_count,
    explain_text,
    has_cartesian_product,
    has_dynamic_partition_pruning,
    has_take_ordered,
    partition_filters,
    pushed_filters,
    read_schemas,
    shuffle_join_count,
    wholestage_codegen_spans,
)

__all__ = [
    "broadcast_join_count",
    "exchange_count",
    "explain_text",
    "has_cartesian_product",
    "has_dynamic_partition_pruning",
    "has_take_ordered",
    "partition_filters",
    "pushed_filters",
    "read_schemas",
    "shuffle_join_count",
    "wholestage_codegen_spans",
]
