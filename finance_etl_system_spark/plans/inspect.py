"""Physical-plan inspection helpers.

The reference never inspects plans — it trusts Catalyst defaults
(reference spark-job/etl_job.py:122-157 sets configs and nothing
else). At 100 TB that is not enough: a silent regression from
broadcast to shuffle join, or a filter that stops reaching the
parquet scan, is the difference between minutes and hours. These
helpers turn `df.explain()` text into assertable facts; the test
suite (tests/test_plans.py) pins them for every headline query and
users can call them interactively before shipping a new pipeline.

All functions take a DataFrame and parse explain output — no Spark
internals, so they survive Spark upgrades that keep the explain
format stable.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def explain_text(df: DataFrame, mode: str = "formatted") -> str:
    """`df.explain(mode)` as a string (explain only prints)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """Every predicate that reached a parquet scan, flattened.
    Empty list ⇒ nothing pushed — usually a bug for filtered reads."""
    text = explain_text(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        body = m.group(1).strip()
        if body:
            # split on top-level commas (filters don't nest brackets)
            out.extend(p.strip() for p in re.split(r",(?![^(]*\))", body))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings, one per scan — audit column pruning:
    a scan reading columns the query never touches is a regression."""
    return re.findall(r"ReadSchema: (struct<[^\n]*)", explain_text(df))


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (broadcast exchanges excluded).
    Every one is a full network re-distribution of its input."""
    text = explain_text(df, "simple")
    return len(re.findall(r"\bExchange (?:hash|range|Single)", text))


def broadcast_join_count(df: DataFrame) -> int:
    return explain_text(df, "simple").count("BroadcastHashJoin")


def shuffle_join_count(df: DataFrame) -> int:
    text = explain_text(df, "simple")
    return text.count("SortMergeJoin") + text.count("ShuffledHashJoin")


def has_cartesian_product(df: DataFrame) -> bool:
    text = explain_text(df, "simple")
    return "CartesianProduct" in text or "BroadcastNestedLoopJoin" in text


def has_take_ordered(df: DataFrame) -> bool:
    """True when a sort+limit planned as top-k (TakeOrderedAndProject)
    instead of a full global sort."""
    return "TakeOrderedAndProject" in explain_text(df, "simple")


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Count of whole-stage-codegen regions. More operators fused into
    fewer spans ⇒ more of the query runs as generated JVM loops; a
    span count that jumps after a change usually means a Python UDF or
    unsupported expression broke fusion. NOTE: with AQE enabled the
    pre-execution plan hides codegen ids — disable AQE around the call
    when asserting (tests/test_plans.py does)."""
    return len(set(re.findall(r"codegen id : (\d+)", explain_text(df))))


def partition_filters(df: DataFrame) -> list[str]:
    """PartitionFilters per scan — the predicates resolved at FILE
    LISTING time (static partition pruning, plus
    ``dynamicpruningexpression`` entries injected by DPP). A
    partitioned-table join without a dynamicpruning entry scans every
    partition however selective the dim side is."""
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", explain_text(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in re.split(r",(?![^(]*\))", body))
    return out


def has_dynamic_partition_pruning(df: DataFrame) -> bool:
    """True when some scan carries a runtime DPP subquery filter."""
    return any("dynamicpruning" in f.lower() for f in partition_filters(df))
