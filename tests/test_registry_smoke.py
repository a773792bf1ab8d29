"""Registry-wide smoke: every queries() entry must run and return a
well-formed frame at sf0.001, and every oracle entry must map to a
registered query. The DuckDB value-compare lives in
tools/oracle_check.py (the driver's gate); this guard catches a
broken registration or a query that stopped running at pytest time.

The same loop lints every plan for UNPARTITIONED windows
(plans/lint.py): a WindowExec with an empty partition spec drags its
whole input through one task — fatal at 100 TB unless the input is
bounded. The lint proves boundedness structurally (a limit or 1-row
aggregate below the window); anything it can't prove must be listed
in ``_GLOBAL_WINDOW_ALLOWED`` with a written justification, so a
future genuinely-unbounded global window fails this test instead of
hiding among the benign "No Partition Defined" log warnings
(judge finding r9).
"""

from __future__ import annotations

from tests.conftest import SF_SMOKE

# Global windows whose boundedness is SEMANTIC (the lint can't see it
# in the plan). Each entry documents why the window input is small.
_GLOBAL_WINDOW_ALLOWED = {
    # prefix sum over per-bucket totals: input is groupBy(_bucket)
    # where _bucket = pmod(hash, n_buckets) — ≤ n_buckets rows
    # (operators/packing.py two-phase grouped prefix sum)
    "pack_sequences",
    "pack_bpe",
    # curriculum_pack embeds the same prefix_pack bucket windows plus
    # a bucket-boundary lag over the n_buckets-row offset frame
    "curriculum_pack",
    # the same packing stage composed inside the corpus pipeline
    "corpus_pipeline",
    "corpus_incremental",
    # rolling stats over a per-trading-DATE aggregate: input rows =
    # distinct dates (calendar-bounded, ~10^4 even at decades)
    "rolling_correlation",
    # KS bracket's cumulative/lag windows over the ≤100-row histogram
    # bucket table (queries/drift.py docstrings carry the bound); the
    # groupBy(bucket) child is bounded by bisect edges, not by a
    # limit the lint can see
    "drift_ks_histogram",
    "drift_ks_refined",
    # NTILE over the per-customer aggregate (|customers| rows, not
    # fact rows) — kept as the portable-SQL showcase; the 100x-safe
    # twin is its own oracle-checked, lint-clean query
    # (sql_customer_segments_scalable, queries/sqlapi.py — r11)
    "sql_customer_segments",
}

# Cartesian-shaped joins (CartesianProduct / BroadcastNestedLoopJoin)
# with no structurally bounded side. Each entry documents why the
# actual row counts are bounded even though the lint can't prove it.
_CROSS_JOIN_ALLOWED = {
    # corpus × query-set: the query frame is embeddings filtered to
    # ≤5 ids — driver-sized by the kNN contract (queries are always
    # collected for LUTs/brute scoring), but structurally a filtered
    # scan the lint can't bound
    "knn_bruteforce",
    "knn_ivf",
    "hybrid_search_rrf",
    # documented exact all-pairs ground-truth path; the LSH variant
    # (dedup_embedding_cosine_lsh) is the scale path
    "dedup_embedding_cosine",
    # supplier-name self-join banded by |len(a)-len(b)| ≤ 2 — a
    # dim-sized entity-resolution primitive (queries/text.py)
    "fuzzy_match",
}


def test_every_registered_query_runs(spark):
    import __spark_entry__ as entry
    from finance_etl_system_spark.plans.lint import (
        unbounded_cross_joins,
        unbounded_global_windows,
    )

    qs = entry.queries()
    oracle = entry.oracle_sql()
    assert set(oracle) <= set(qs)
    assert len(qs) >= 130

    failures = {}
    window_violations = {}
    cross_violations = {}
    window_hits = set()
    cross_hits = set()
    for name, fn in qs.items():
        try:
            df = fn(spark, SF_SMOKE)
            assert df.columns, name
            bad = unbounded_global_windows(df)
            if bad:
                if name in _GLOBAL_WINDOW_ALLOWED:
                    window_hits.add(name)
                else:
                    window_violations[name] = bad[0][:160]
            bad = unbounded_cross_joins(df)
            if bad:
                if name in _CROSS_JOIN_ALLOWED:
                    cross_hits.add(name)
                else:
                    cross_violations[name] = bad[0][:160]
            df.count()
        except Exception as exc:  # noqa: BLE001 — collect all failures
            failures[name] = repr(exc)[:200]
    assert not failures, failures
    assert not window_violations, window_violations
    assert not cross_violations, cross_violations
    # the allowlists must not rot: an entry whose query no longer
    # plans the flagged shape should be removed with its justification
    assert window_hits == _GLOBAL_WINDOW_ALLOWED, (
        _GLOBAL_WINDOW_ALLOWED - window_hits
    )
    assert cross_hits == _CROSS_JOIN_ALLOWED, (
        _CROSS_JOIN_ALLOWED - cross_hits
    )


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
