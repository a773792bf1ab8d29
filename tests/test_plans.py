"""Physical-plan assertions (SURVEY §4): lock in the plan properties
the 100 TB design depends on. A regression that turns a broadcast join
into a shuffle join, drops a pushed filter, or adds a second window
shuffle fails HERE, not in a cluster.
"""

from __future__ import annotations

import pytest

from finance_etl_system_spark.queries.aggregates import q_global_topk
from finance_etl_system_spark.queries.indicators import q_technical_indicators
from finance_etl_system_spark.queries.joins import (
    q_join_asof,
    q_join_big_big,
    q_join_broadcast_dims,
)
from finance_etl_system_spark.queries.relational import q_pricing_summary
from tests.conftest import SF_SMOKE


def _capture_explain(df, mode) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def _plan(df) -> str:
    return _capture_explain(df, "simple")


def _formatted(df) -> str:
    return _capture_explain(df, "formatted")


def test_dim_joins_are_broadcast(spark):
    plan = _plan(q_join_broadcast_dims(spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_filter_pushdown_reaches_scan(spark):
    plan = _formatted(q_join_big_big(spark, SF_SMOKE))
    assert "EqualTo(o_orderstatus,F)" in plan  # pushed to parquet scan


def test_pricing_summary_prunes_columns(spark):
    plan = _formatted(q_pricing_summary(spark, SF_SMOKE))
    # ReadSchema must not include columns the query never touches
    assert "l_partkey" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_global_topk_avoids_full_sort(spark):
    plan = _plan(q_global_topk(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan


def test_indicators_single_window_shuffle(spark):
    """The 15-indicator suite must shuffle ONCE (hashpartitioning on
    symbol) — the reference's per-symbol loop equivalent would show up
    as N jobs; a bad window spec would add exchanges."""
    plan = _plan(q_technical_indicators(spark, SF_SMOKE))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "rangepartitioning" not in plan


def test_asof_join_is_one_shuffle_no_join_explosion(spark):
    plan = _plan(q_join_asof(spark, SF_SMOKE))
    # union+window formulation: no join operator over the event tables
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Bucketed layout pays the join shuffle once at write time: a
    join of two tables bucketed on the same key into the same bucket
    count must plan with ZERO shuffle exchanges (broadcast disabled so
    the assertion is about bucketing, not about side size)."""
    from finance_etl_system_spark.catalog import load_table
    from finance_etl_system_spark.sources.bucketing import read_bucketed, write_bucketed

    o = load_table(spark, SF_SMOKE, "orders")
    l = load_table(spark, SF_SMOKE, "lineitem")
    write_bucketed(
        o, "orders_b", keys=["o_orderkey"], buckets=4, sort_by=["o_orderkey"],
        path=str(tmp_path / "orders_b"),
    )
    write_bucketed(
        l, "lineitem_b", keys=["l_orderkey"], buckets=4, sort_by=["l_orderkey"],
        path=str(tmp_path / "lineitem_b"),
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ob, lb = read_bucketed(spark, "orders_b"), read_bucketed(spark, "lineitem_b")
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        plan = _plan(joined)
        assert "Exchange hashpartitioning" not in plan
        assert "SortMergeJoin" in plan
        # and the same count as the shuffle join would produce
        plain = l.join(o, l.l_orderkey == o.o_orderkey)
        assert joined.count() == plain.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_whole_stage_codegen_covers_indicators(spark):
    # AQE wraps the plan and hides codegen markers until execution;
    # disable it for the assertion (markers print as *(N) in the
    # non-adaptive plan).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = _plan(q_technical_indicators(spark, SF_SMOKE))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "*(" in plan  # WholeStageCodegen stage markers — JVM-side exprs
