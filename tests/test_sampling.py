"""Deterministic-sampling operator tests (training-data tier).

The oracle gate proves Spark/DuckDB agreement; these pin the
statistical and structural properties: fraction accuracy, run-to-run
and partitioning invariance, nested-sample subset law, and
group-aware split leakage-safety.
"""

from __future__ import annotations

import pytest

from finance_etl_system_spark.catalog import load_table
from finance_etl_system_spark.operators.sampling import (
    hash_bucket,
    hash_sample,
    stratified_hash_sample,
    train_test_split_by_key,
)
from tests.conftest import SF_SMOKE


def test_fraction_accuracy(spark):
    l = load_table(spark, SF_SMOKE, "lineitem")
    n = l.count()
    got = hash_sample(l, ["l_orderkey", "l_linenumber"], 0.10).count()
    assert got == pytest.approx(0.10 * n, rel=0.15)


def test_membership_is_partitioning_invariant(spark):
    """The same rows are sampled however the data is laid out — the
    property `df.sample(seed)` does NOT have."""
    l = load_table(spark, SF_SMOKE, "lineitem")
    keys = lambda df: {  # noqa: E731
        (r["l_orderkey"], r["l_linenumber"])
        for r in df.select("l_orderkey", "l_linenumber").collect()
    }
    a = keys(hash_sample(l, ["l_orderkey", "l_linenumber"], 0.10))
    b = keys(hash_sample(l.repartition(7, "l_suppkey"), ["l_orderkey", "l_linenumber"], 0.10))
    assert a == b and a


def test_nested_samples_are_subsets(spark):
    """1% ⊂ 5% ⊂ 20% by construction (same hash, growing threshold) —
    lets a pipeline publish one 'sample tier' column and serve every
    downstream fraction consistently."""
    o = load_table(spark, SF_SMOKE, "orders")
    k = lambda df: {r["o_orderkey"] for r in df.select("o_orderkey").collect()}  # noqa: E731
    s1, s5, s20 = (k(hash_sample(o, ["o_orderkey"], f)) for f in (0.01, 0.05, 0.20))
    assert s1 <= s5 <= s20
    assert len(s20) > len(s5) > len(s1) > 0


def test_full_fraction_keeps_everything(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    assert hash_sample(o, ["o_orderkey"], 1.0).count() == o.count()
    assert hash_sample(o, ["o_orderkey"], 0.0).count() == 0


def test_stratified_rates_and_dropped_strata(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    out = stratified_hash_sample(
        o, "o_orderpriority", {"1-URGENT": 1.0, "2-HIGH": 0.2}, key_cols=["o_orderkey"]
    )
    by = {r["o_orderpriority"]: r["n"] for r in
          out.groupBy("o_orderpriority").count().withColumnRenamed("count", "n").collect()}
    full = {r["o_orderpriority"]: r["n"] for r in
            o.groupBy("o_orderpriority").count().withColumnRenamed("count", "n").collect()}
    assert set(by) == {"1-URGENT", "2-HIGH"}  # unlisted strata dropped
    assert by["1-URGENT"] == full["1-URGENT"]
    assert by["2-HIGH"] == pytest.approx(0.2 * full["2-HIGH"], rel=0.25)


def test_split_is_leakage_safe_and_total(spark):
    """Every lineitem of one order lands wholly in train or test."""
    l = load_table(spark, SF_SMOKE, "lineitem")
    train, test = train_test_split_by_key(l, ["l_orderkey"], 0.25)
    assert train.count() + test.count() == l.count()
    both = (
        train.select("l_orderkey").distinct()
        .intersect(test.select("l_orderkey").distinct())
        .count()
    )
    assert both == 0
    assert test.count() == pytest.approx(0.25 * l.count(), rel=0.2)


def test_bucket_column_is_reusable(spark):
    """hash_bucket persisted once reproduces hash_sample membership."""
    o = load_table(spark, SF_SMOKE, "orders").withColumn(
        "tier", hash_bucket("o_orderkey")
    )
    via_col = o.filter(o.tier < "1999").select("o_orderkey")
    via_op = hash_sample(
        load_table(spark, SF_SMOKE, "orders"), ["o_orderkey"], 0.10
    ).select("o_orderkey")
    assert {r[0] for r in via_col.collect()} == {r[0] for r in via_op.collect()}
