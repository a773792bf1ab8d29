"""Training-data curation queries (queries/quality.py): semantic
properties recomputed independently on the smoke fixture."""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd

from finance_etl_system_spark.queries.quality import (
    q_data_mix_rebalance,
    q_pii_scrub,
    q_quality_repetition,
)
from tests.conftest import SF_SMOKE


def test_repetition_metrics_match_counter(spark):
    rows = q_quality_repetition(spark, SF_SMOKE).collect()
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    by_id = dict(zip(docs["doc_id"], docs["text"]))
    assert len(rows) == len(docs)
    for r in rows[:50]:
        toks = [t for t in by_id[r.doc_id].lower().split(" ") if t]
        c = Counter(toks)
        assert r.n_tokens == len(toks)
        assert r.n_distinct == len(c)
        assert r.top_count == max(c.values())
        assert r.repetitive == (r.top_count * 100 > r.n_tokens * 12)
        assert 0 < r.type_token_ratio <= 1
        assert 0 < r.top_token_frac <= 1


def test_rebalance_yields_uniform_mix(spark):
    out = q_data_mix_rebalance(spark, SF_SMOKE).collect()
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    want_quota = docs.groupby("lang").size().min()
    got = Counter(r.lang for r in out)
    assert set(got) == set(docs["lang"].unique())
    assert all(n == want_quota for n in got.values())
    # deterministic: a second run picks the identical doc set
    again = q_data_mix_rebalance(spark, SF_SMOKE).collect()
    assert sorted(r.doc_id for r in out) == sorted(r.doc_id for r in again)


def test_pii_scrub_removes_all_plants(spark):
    rows = q_pii_scrub(spark, SF_SMOKE).collect()
    email = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    phone = re.compile(r"\d{3}-\d{3}-\d{4}")
    planted = scrubbed_any = 0
    for r in rows:
        assert not email.search(r.scrubbed)
        assert not phone.search(r.scrubbed)
        if r.doc_id % 7 == 0:
            assert r.n_emails >= 1 and r.n_phones >= 1
            assert "[EMAIL]" in r.scrubbed and "[PHONE]" in r.scrubbed
            planted += 1
        scrubbed_any += r.n_emails + r.n_phones
    assert planted > 0
    assert scrubbed_any >= 2 * planted
