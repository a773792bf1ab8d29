"""Driver-contract smoke tests (SURVEY §5 item 3)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_queries_and_oracle_keys_align(spark):
    qs = entrymod.queries()
    oracle = entrymod.oracle_sql()
    assert qs, "no queries registered"
    assert set(oracle) <= set(qs)


# NOTE: the every-query-runs sweep lives ONLY in
# tests/test_registry_smoke.py::test_every_registered_query_runs —
# it counts every frame AND lints every plan. A second full sweep
# here cost ~6 min of suite wall for zero extra coverage (r10 verdict
# item 2: the '~6 min' suite had drifted to ~38 min).


def test_bench_headline_names_all_registered():
    """bench.py silently skips headline names missing from queries()
    (`if n in qs`) — a renamed query would silently shrink the bench
    and corrupt round-over-round comparability. Pin the contract."""
    import __spark_entry__ as entry
    from bench import HEADLINE

    qs = set(entry.queries())
    missing = [n for n in HEADLINE if n not in qs]
    assert not missing, missing
    assert len(HEADLINE) == len(set(HEADLINE))  # no duplicate timings
