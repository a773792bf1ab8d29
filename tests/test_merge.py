"""CDC merge-apply (operators/merge.py): unit semantics on a
hand-built feed, plus invariants of the derived query."""

from __future__ import annotations

from pyspark.sql import functions as F

from finance_etl_system_spark.catalog import load_table
from finance_etl_system_spark.operators.merge import latest_change_per_key, merge_apply
from finance_etl_system_spark.queries.cdc import q_cdc_merge
from tests.conftest import SF_SMOKE


def test_merge_apply_semantics(spark):
    snap = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k BIGINT, name STRING, bal DOUBLE",
    )
    changes = spark.createDataFrame(
        [
            (1, 100, "U", 11.0),  # stale update …
            (1, 200, "D", None),  # … superseded by delete
            (2, 150, "U", 21.0),  # plain update
            (9, 160, "U", 99.0),  # fresh insert
            (8, 170, "D", None),  # delete of unknown key: no-op
        ],
        "k BIGINT, seq BIGINT, op STRING, bal_new DOUBLE",
    )
    got = {
        r.k: (r.name, r.bal, r.merge_action)
        for r in merge_apply(
            snap, changes, key="k", set_cols={"bal": "bal_new"}
        ).collect()
    }
    assert got == {
        2: ("b", 21.0, "updated"),
        3: ("c", 30.0, "kept"),
        9: (None, 99.0, "inserted"),
    }


def test_latest_change_is_aggregate_not_window(spark):
    changes = spark.createDataFrame(
        [(1, 2, "U", 5.0), (1, 3, "D", None), (1, 1, "U", 4.0)],
        "k BIGINT, seq BIGINT, op STRING, v DOUBLE",
    )
    latest = latest_change_per_key(changes, "k")
    [r] = latest.collect()
    assert (r.k, r.op, r.v) == (1, "D", None)
    plan = latest._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_cdc_merge_invariants(spark):
    cust = load_table(spark, SF_SMOKE, "customer")
    orders = load_table(spark, SF_SMOKE, "orders")
    out = q_cdc_merge(spark, SF_SMOKE)
    rows = out.collect()
    assert {"inserted", "updated"} <= {r.merge_action for r in rows}
    # deleted = customers whose LATEST order key is % 10 == 0
    latest_ok = {
        r.o_custkey: r.ok
        for r in orders.groupBy("o_custkey")
        .agg(F.max_by("o_orderkey", "o_orderkey").alias("ok"))
        .collect()
    }
    snap_keys = {r.c_custkey for r in cust.select("c_custkey").collect()}
    out_keys = {r.c_custkey for r in rows}
    for k, ok in latest_ok.items():
        if k in snap_keys:
            assert (k not in out_keys) == (ok % 10 == 0), k
    # inserts carry null passthrough columns and the new balance
    ins = [r for r in rows if r.merge_action == "inserted"]
    assert ins and all(
        r.c_name is None and r.c_custkey >= 10_000_000 for r in ins
    )
    # untouched customers keep their snapshot balance
    touched = set(latest_ok)
    bal = {r.c_custkey: r.c_acctbal for r in cust.collect()}
    for r in rows:
        if r.merge_action == "kept" and r.c_custkey not in touched:
            assert r.c_acctbal == bal[r.c_custkey]
