"""Registry-wide smoke: every queries() entry must run and return a
well-formed frame at sf0.001, and every oracle entry must map to a
registered query. The DuckDB value-compare lives in
tools/oracle_check.py (the driver's gate); this guard catches a
broken registration or a query that stopped running at pytest time.
"""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_every_registered_query_runs(spark):
    import __spark_entry__ as entry

    qs = entry.queries()
    oracle = entry.oracle_sql()
    assert set(oracle) <= set(qs)
    assert len(qs) >= 130

    failures = {}
    for name, fn in qs.items():
        try:
            df = fn(spark, SF_SMOKE)
            assert df.columns, name
            df.count()
        except Exception as exc:  # noqa: BLE001 — collect all failures
            failures[name] = repr(exc)[:200]
    assert not failures, failures
