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


def test_oracle_column_names_match_spark(spark):
    """The driver's compare sorts columns by name before hashing — an
    alias mismatch fails every value check. Verify name parity for
    EVERY oracle entry without executing either engine: Spark gives
    the schema from the unexecuted plan, DuckDB from DESCRIBE."""
    import duckdb

    import __spark_entry__ as entry

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events"
        " documents embeddings"
    ).split():
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    qs, oracle = entry.queries(), entry.oracle_sql()
    mismatches = {}
    for name, sql in oracle.items():
        spark_cols = sorted(qs[name](spark, SF_SMOKE).columns)
        duck_cols = sorted(r[0] for r in con.sql(f"DESCRIBE {sql}").fetchall())
        if spark_cols != duck_cols:
            mismatches[name] = (spark_cols, duck_cols)
    assert not mismatches, mismatches
