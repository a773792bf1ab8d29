"""Keyed table diff (operators/diff.py): classification semantics on
a constructed pair of snapshots, including null transitions."""

from __future__ import annotations

from finance_etl_system_spark.operators.diff import table_diff


def test_table_diff_classifies_all_transitions(spark):
    old = spark.createDataFrame(
        [
            (1, 10.0, "A"),   # unchanged
            (2, 20.0, "B"),   # value change
            (3, None, "C"),   # null -> value (change)
            (4, 40.0, None),  # value -> null (change)
            (5, 50.0, "E"),   # removed
        ],
        "k LONG, bal DOUBLE, seg STRING",
    )
    new = spark.createDataFrame(
        [
            (1, 10.0, "A"),
            (2, 21.0, "B"),
            (3, 3.0, "C"),
            (4, 40.0, None),
            (6, 60.0, "F"),   # added
        ],
        "k LONG, bal DOUBLE, seg STRING",
    )
    # row 4: seg stays NULL on both sides -> null-safe equal -> the
    # only change driver is bal (none) => unchanged
    got = {
        r.k: (r.change_type, r.n_cols_changed, r.changed_cols)
        for r in table_diff(
            old, new, key="k", compare_cols=["bal", "seg"],
            include_unchanged=True,
        ).collect()
    }
    assert got[1] == ("unchanged", 0, "")
    assert got[2] == ("changed", 1, "bal")
    assert got[3] == ("changed", 1, "bal")
    assert got[4] == ("unchanged", 0, "")
    assert got[5] == ("removed", 0, "")
    assert got[6] == ("added", 0, "")

    # default drops unchanged rows
    keys = {r.k for r in table_diff(old, new, "k", ["bal", "seg"]).collect()}
    assert keys == {2, 3, 5, 6}


def test_table_diff_multi_column_change_list_sorted(spark):
    old = spark.createDataFrame([(1, 1.0, "X")], "k LONG, bal DOUBLE, seg STRING")
    new = spark.createDataFrame([(1, 2.0, "Y")], "k LONG, bal DOUBLE, seg STRING")
    [r] = table_diff(old, new, "k", ["seg", "bal"]).collect()
    assert r.change_type == "changed"
    assert r.n_cols_changed == 2
    assert r.changed_cols == "bal,seg"  # sorted regardless of input order
