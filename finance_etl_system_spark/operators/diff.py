"""Snapshot reconciliation: keyed table diff (the data-diff a
migration or CDC pipeline runs to answer "what changed between
yesterday's table and today's?").

One FULL OUTER join on the key classifies every row as
added / removed / changed / unchanged, with the list of changed
columns computed null-safely per row. At 100 TB this is one big-big
equi join (both sides hash-partition on the key; AQE skew-handles),
and the usual deployment diffs only changed partitions — the operator
composes with partition pruning because the classification predicates
are row-local.

Column-change detection uses null-safe equality (``eqNullSafe`` /
``IS DISTINCT FROM``) so NULL→value and value→NULL count as changes,
and the changed-column list is emitted as a comma-joined sorted
string — portable across engines for the oracle's value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str],
    *,
    include_unchanged: bool = False,
) -> DataFrame:
    """Classify rows by key between two snapshots.

    Returns (key, change_type, n_cols_changed, changed_cols) where
    change_type ∈ {added, removed, changed, unchanged} and
    changed_cols is a comma-joined sorted column list (empty for
    non-'changed' rows).
    """
    o = old.select(F.col(key).alias("__ok"), *compare_cols)
    for c in compare_cols:
        o = o.withColumnRenamed(c, f"__o_{c}")
    n = new.select(F.col(key).alias("__nk"), *compare_cols)
    for c in compare_cols:
        n = n.withColumnRenamed(c, f"__n_{c}")

    j = o.join(n, o["__ok"] == n["__nk"], "full_outer")
    diffs = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")),
                    F.lit(c),
                )
                for c in sorted(compare_cols)
            ]
        )
    )
    out = j.select(
        F.coalesce("__ok", "__nk").alias(key),
        F.when(F.col("__ok").isNull(), F.lit("added"))
        .when(F.col("__nk").isNull(), F.lit("removed"))
        .when(F.size(diffs) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("change_type"),
        F.when(
            F.col("__ok").isNotNull() & F.col("__nk").isNotNull(),
            F.size(diffs),
        )
        .otherwise(F.lit(0))
        .alias("n_cols_changed"),
        F.when(
            F.col("__ok").isNotNull() & F.col("__nk").isNotNull(),
            F.array_join(diffs, ","),
        )
        .otherwise(F.lit(""))
        .alias("changed_cols"),
    )
    if not include_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    return out
