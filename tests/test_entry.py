"""Driver-contract smoke tests (SURVEY §5 item 3)."""

from __future__ import annotations

import __spark_entry__ as entrymod

from tests.conftest import SF_SMOKE


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


def test_every_query_runs_at_smoke_sf(spark):
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_SMOKE)
        assert df.count() >= 0, name


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
