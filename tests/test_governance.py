"""k-anonymity / l-diversity audit (queries/governance.py): semantic
invariants on top of the oracle value-hash — the flag and the counts
must relate to each other and to the input the way the definitions
say, not merely match DuckDB.
"""

from __future__ import annotations

from finance_etl_system_spark.catalog import load_table
from finance_etl_system_spark.queries.governance import q_k_anonymity
from tests.conftest import SF_SMOKE


def test_k_anonymity_invariants(spark):
    out = q_k_anonymity(spark, SF_SMOKE).collect()
    assert out
    n_customers = load_table(spark, SF_SMOKE, "customer").count()
    assert sum(r["class_size"] for r in out) == n_customers  # partition
    for r in out:
        assert 1 <= r["l_diversity"] <= r["class_size"]
        assert r["at_risk"] == int(r["class_size"] < 5)
    # the dataset's k is the smallest class — the audit's headline
    k = min(r["class_size"] for r in out)
    assert any(r["class_size"] == k for r in out)
