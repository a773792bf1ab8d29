"""BM25 retrieval (queries/retrieval.py) and robust-outlier /
binning queries (queries/anomaly.py): semantics recomputed
independently in pure Python/pandas on the smoke fixture."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd

from finance_etl_system_spark.queries.anomaly import (
    MAD_SCALE,
    N_BINS,
    Z_CUT,
    q_anomaly_mad,
    q_feature_binning,
)
from finance_etl_system_spark.queries.retrieval import (
    B,
    BOOL_TERMS,
    K1,
    QUERY_TERMS,
    RRF_K,
    q_bm25_search,
    q_hybrid_search_rrf,
    q_search_boolean_and,
)
from tests.conftest import SF_SMOKE


def _bm25_reference(docs: pd.DataFrame) -> dict[int, float]:
    toks = {
        r.doc_id: [t for t in r.text.lower().split(" ") if t]
        for r in docs.itertuples()
    }
    n_docs = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    df = Counter(
        term for ts in toks.values() for term in set(ts) if term in QUERY_TERMS
    )
    scores: dict[int, float] = {}
    for doc_id, ts in toks.items():
        tf = Counter(t for t in ts if t in QUERY_TERMS)
        if not tf:
            continue
        s = 0.0
        for term, f in tf.items():
            idf = math.log(1.0 + (n_docs - df[term] + 0.5) / (df[term] + 0.5))
            s += idf * f * (K1 + 1.0) / (
                f + K1 * (1.0 - B + B * len(ts) / avgdl)
            )
        scores[doc_id] = round(s, 6)
    return scores


def test_bm25_matches_pure_python(spark):
    out = q_bm25_search(spark, SF_SMOKE).collect()
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    ref = _bm25_reference(docs)
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[: len(out)]
    got = [(r.doc_id, r.bm25) for r in sorted(out, key=lambda r: r.rnk)]
    assert got == want
    # ranks are 1..k with no gaps
    assert [r.rnk for r in sorted(out, key=lambda r: r.rnk)] == list(
        range(1, len(out) + 1)
    )


def test_boolean_and_requires_every_term(spark):
    out = q_search_boolean_and(spark, SF_SMOKE).collect()
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    text_by_id = dict(zip(docs.doc_id, docs.text))
    assert out, "fixture corpus should contain conjunctive matches"
    for r in out:
        toks = set(t for t in text_by_id[r.doc_id].lower().split(" ") if t)
        assert set(BOOL_TERMS) <= toks
        assert r.n_terms_hit == len(BOOL_TERMS)


def test_hybrid_rrf_fuses_both_rankings(spark):
    out = sorted(
        q_hybrid_search_rrf(spark, SF_SMOKE).collect(), key=lambda r: r.rnk
    )
    assert [r.rnk for r in out] == list(range(1, len(out) + 1))
    for r in out:
        # every fused doc came from at least one branch, and the score
        # is exactly the RRF formula over its branch ranks
        assert r.kw_rank is not None or r.vec_rank is not None
        want = round(
            (1.0 / (RRF_K + r.kw_rank) if r.kw_rank else 0.0)
            + (1.0 / (RRF_K + r.vec_rank) if r.vec_rank else 0.0),
            6,
        )
        assert r.rrf == want
    # rrf is non-increasing down the ranking
    assert all(a.rrf >= b.rrf for a, b in zip(out, out[1:]))
    # the query vector itself must top the vector branch (cosine = 1)
    vec_rank_1 = [r for r in out if r.vec_rank == 1]
    assert vec_rank_1 and vec_rank_1[0].doc_id == 0


def test_anomaly_mad_matches_numpy(spark):
    out = q_anomaly_mad(spark, SF_SMOKE).collect()
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet").dropna(subset=["value"])
    want: set[int] = set()
    for etype, g in ev.groupby("event_type"):
        med = np.percentile(g["value"], 50, method="linear")
        absdev = np.abs(g["value"] - med)
        mad = np.percentile(absdev, 50, method="linear")
        if mad > 0:
            want |= set(g.loc[absdev > Z_CUT * MAD_SCALE * mad, "event_id"])
    assert {r.event_id for r in out} == want
    for r in out:
        assert r.robust_z > Z_CUT  # the flag is exactly the z threshold


def test_feature_binning_equal_frequency(spark):
    rows = sorted(q_feature_binning(spark, SF_SMOKE).collect(), key=lambda r: r.bin)
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    n = len(orders)
    assert [r.bin for r in rows] == list(range(1, N_BINS + 1))
    assert sum(r.n for r in rows) == n
    # quantile-edge bins over near-unique values: sizes within 1 of
    # n/10 (interpolated edges land between order statistics), bins
    # ordered and non-overlapping
    sizes = [r.n for r in rows]
    assert max(sizes) - min(sizes) <= 1
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo
    assert math.isclose(
        rows[0].lo, round(orders["o_totalprice"].min(), 2), abs_tol=1e-9
    )
    assert math.isclose(
        rows[-1].hi, round(orders["o_totalprice"].max(), 2), abs_tol=1e-9
    )


def test_rolling_robust_outliers_match_pandas_windows(spark):
    from finance_etl_system_spark.queries.anomaly import (
        _ROLL_FRAME,
        q_rolling_robust_outliers,
    )

    out = q_rolling_robust_outliers(spark, SF_SMOKE).collect()
    ev = (
        pd.read_parquet(f"{SF_SMOKE}/events.parquet")
        .dropna(subset=["value"])
        .loc[lambda d: ~np.isnan(d["value"])]
    )
    ev["ticks"] = np.round(ev["value"] * 100).astype("int64")
    got = {(r.symbol, r.k): r for r in out}
    n_checked = n_outliers = 0
    for sym, g in ev.groupby("user_id"):
        g = g.sort_values("ts")
        ticks = g["ticks"].to_numpy()
        ks = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()  # µs
        for i in range(len(ticks)):
            lo = max(0, i - _ROLL_FRAME)
            frame = ticks[lo : i + 1]
            med = np.percentile(frame, 50, method="linear")
            q1 = np.percentile(frame, 25, method="linear")
            q3 = np.percentile(frame, 75, method="linear")
            r = got[(sym, ks[i])]
            assert r.med_qticks == round(med * 4)
            assert r.iqr_qticks == round((q3 - q1) * 4)
            want_flag = int(abs(ticks[i] - med) > 1.5 * (q3 - q1))
            assert r.is_outlier == want_flag
            n_checked += 1
            n_outliers += want_flag
    assert n_checked == len(out)
    assert 0 < n_outliers < n_checked  # the rule actually fires, not everywhere


def test_analyzer_improves_recall_on_inflected_queries(spark):
    """Stop-word + S-stemmer analyzer: a query meets plural/inflected
    corpus forms in the same normalized space, so recall strictly
    improves over the raw tokenizer on an inflected corpus."""
    from finance_etl_system_spark.queries.retrieval import (
        _bm25_scored,
        analyze_terms,
        s_stem,
    )

    d = spark.createDataFrame(
        [
            (1, "streams are merging fast today"),
            (2, "the stream merges data"),
            (3, "totally unrelated content about nothing"),
        ],
        "doc_id long, text string",
    )
    plain_hits = {
        r.doc_id for r in _bm25_scored(d, ["stream"]).collect()
    }
    analyzed_hits = {
        r.doc_id
        for r in _bm25_scored(
            d, analyze_terms(["streams"]), analyzed=True
        ).collect()
    }
    assert plain_hits == {2}
    assert analyzed_hits == {1, 2}  # plural form now reachable

    # stemmer unit behavior: plurals fold, exceptions hold
    assert s_stem("queries") == "query"
    assert s_stem("merges") == "merge"
    assert s_stem("partitions") == "partition"
    assert s_stem("status") == "status"   # -us exception
    assert s_stem("class") == "class"     # -ss exception
    assert analyze_terms(["The", "Streams"]) == ["stream"]


def test_text_index_matches_scan_path_and_prunes(spark, tmp_path):
    """The persisted inverted index must return EXACTLY the scan-path
    BM25 ranking, keep doing so after an incremental append, and its
    probe must dynamic-partition-prune to the query terms' buckets."""
    from finance_etl_system_spark.catalog import load_table
    from finance_etl_system_spark.operators.textindex import (
        append_to_text_index,
        bm25_search_index,
        build_text_index,
    )
    from finance_etl_system_spark.plans.inspect import partition_filters
    from finance_etl_system_spark.queries.retrieval import (
        QUERY_TERMS,
        _bm25_scored,
        _rank_topk,
    )

    d = load_table(spark, SF_SMOKE, "documents")
    want = [
        (r.rnk, r.doc_id, r.bm25, r.n_terms_hit)
        for r in _rank_topk(_bm25_scored(d)).collect()
    ]

    full = str(tmp_path / "full")
    build_text_index(d, full)
    got_df = bm25_search_index(spark, full, QUERY_TERMS)
    # static partition pruning: the scan lists only query-term buckets
    assert any(
        "bucket" in f and " in (" in f.lower()
        for f in partition_filters(got_df)
    ), partition_filters(got_df)
    got = [(r.rnk, r.doc_id, r.bm25, r.n_terms_hit) for r in got_df.collect()]
    assert got == want

    # incremental maintenance: half the corpus at build, half appended
    from pyspark.sql import functions as SF

    inc = str(tmp_path / "inc")
    mid = 250
    build_text_index(d.filter(SF.col("doc_id") < mid), inc)
    append_to_text_index(d.filter(SF.col("doc_id") >= mid), inc)
    got2 = [
        (r.rnk, r.doc_id, r.bm25, r.n_terms_hit)
        for r in bm25_search_index(spark, inc, QUERY_TERMS).collect()
    ]
    assert got2 == want


def test_positional_index_phrase_matches_scan_path(spark, tmp_path):
    """The positional index's phrase query must return EXACTLY the
    scan-path q_search_phrase ranking, keep doing so after an
    incremental append, and refuse a positionless index loudly."""
    import pytest

    from pyspark.sql import functions as SF

    from finance_etl_system_spark.catalog import load_table
    from finance_etl_system_spark.operators.textindex import (
        append_to_text_index,
        build_text_index,
        phrase_search_index,
    )
    from finance_etl_system_spark.queries.retrieval import (
        PHRASE,
        q_search_phrase,
    )

    d = load_table(spark, SF_SMOKE, "documents")
    want = [
        (r.rnk, r.doc_id, r.n_occurrences)
        for r in q_search_phrase(spark, SF_SMOKE).collect()
    ]
    assert want  # the fixture phrase matches something

    full = str(tmp_path / "pos")
    build_text_index(d, full, positions=True)
    got = [
        (r.rnk, r.doc_id, r.n_occurrences)
        for r in phrase_search_index(
            spark, full, PHRASE.split(" ")
        ).collect()
    ]
    assert got == want

    # incremental append keeps phrase parity
    inc = str(tmp_path / "pos_inc")
    mid = 250
    build_text_index(d.filter(SF.col("doc_id") < mid), inc, positions=True)
    append_to_text_index(
        d.filter(SF.col("doc_id") >= mid), inc, positions=True
    )
    got2 = [
        (r.rnk, r.doc_id, r.n_occurrences)
        for r in phrase_search_index(spark, inc, PHRASE.split(" ")).collect()
    ]
    assert got2 == want

    # a tf-only index cannot answer phrase queries — loud failure
    flat = str(tmp_path / "flat")
    build_text_index(d, flat)
    with pytest.raises(ValueError, match="positions"):
        phrase_search_index(spark, flat, PHRASE.split(" "))


def test_text_index_compaction_removes_deleted_docs(spark, tmp_path):
    """GDPR-composition for the search index: compacting with a
    deletion list yields exactly the index of the surviving corpus."""
    from pyspark.sql import functions as SF

    from finance_etl_system_spark.catalog import load_table
    from finance_etl_system_spark.operators.textindex import (
        bm25_search_index,
        build_text_index,
        compact_text_index,
    )
    from finance_etl_system_spark.queries.retrieval import QUERY_TERMS

    d = load_table(spark, SF_SMOKE, "documents")
    path = str(tmp_path / "idx")
    build_text_index(d, path)
    full = bm25_search_index(spark, path, QUERY_TERMS).collect()
    victims = [r.doc_id for r in full[:3]]  # delete three top hits

    compact_text_index(
        spark, path, spark.createDataFrame([(v,) for v in victims], "doc_id long")
    )
    got = [
        (r.rnk, r.doc_id, r.bm25, r.n_terms_hit)
        for r in bm25_search_index(spark, path, QUERY_TERMS).collect()
    ]
    rebuilt = str(tmp_path / "rebuilt")
    build_text_index(d.filter(~SF.col("doc_id").isin(victims)), rebuilt)
    want = [
        (r.rnk, r.doc_id, r.bm25, r.n_terms_hit)
        for r in bm25_search_index(spark, rebuilt, QUERY_TERMS).collect()
    ]
    assert got == want
    assert not set(victims) & {g[1] for g in got}


def test_text_index_append_flag_mismatch_raises(spark, tmp_path):
    """A wrong-flag append must RAISE, not write mixed-schema postings
    that silently drop phrase occurrences: the build persists its
    positions/analyzed flags in a meta table and appends validate
    against it. A pre-meta (legacy) index falls back to probing the
    postings schema."""
    import shutil

    import pytest

    from finance_etl_system_spark.catalog import load_table
    from finance_etl_system_spark.operators.textindex import (
        append_to_text_index,
        build_text_index,
        verify_text_index,
    )
    from pyspark.sql import functions as SF

    d = load_table(spark, SF_SMOKE, "documents")
    head, tail = d.filter(SF.col("doc_id") < 100), d.filter(
        (SF.col("doc_id") >= 100) & (SF.col("doc_id") < 150)
    )

    pos_idx = str(tmp_path / "pos")
    build_text_index(head, pos_idx, positions=True)
    with pytest.raises(ValueError, match="positions=False"):
        append_to_text_index(tail, pos_idx)  # tf-only into positional

    flat_idx = str(tmp_path / "flat")
    build_text_index(head, flat_idx, analyzed=True)
    with pytest.raises(ValueError, match="positions=True"):
        append_to_text_index(tail, flat_idx, analyzed=True, positions=True)
    with pytest.raises(ValueError, match="analyzed=False"):
        append_to_text_index(tail, flat_idx)  # raw into analyzed
    # the matching append still works
    append_to_text_index(tail, flat_idx, analyzed=True)
    assert verify_text_index(spark, flat_idx)["consistent"]

    # legacy index without meta: schema probe still rejects the
    # mismatch, and a good append heals a meta table into place
    legacy = str(tmp_path / "legacy")
    build_text_index(head, legacy, positions=True)
    shutil.rmtree(f"{legacy}/meta")
    with pytest.raises(ValueError, match="pos column"):
        append_to_text_index(tail, legacy)
    append_to_text_index(tail, legacy, positions=True)
    import os

    assert os.path.isdir(f"{legacy}/meta")


def test_text_index_verify_detects_half_compaction(spark, tmp_path):
    """verify_text_index flags the cross-table crash window: doclen
    compacted but postings stale (doclen-first swap order) shows up as
    orphan postings docs."""
    from finance_etl_system_spark.catalog import load_table
    from finance_etl_system_spark.operators.textindex import (
        build_text_index,
        verify_text_index,
    )
    from pyspark.sql import functions as SF

    d = load_table(spark, SF_SMOKE, "documents").filter(
        SF.col("doc_id") < 100
    )
    path = str(tmp_path / "idx")
    build_text_index(d, path)
    assert verify_text_index(spark, path) == {
        "consistent": True,
        "orphan_postings_docs": 0,
        "doclen_only_docs": 0,
    }

    # simulate a crash after the doclen swap: doclen loses 10 docs,
    # postings keep them
    dl = spark.read.parquet(f"{path}/doclen").filter(
        SF.col("doc_id") >= 10
    ).localCheckpoint(eager=True)
    dl.write.mode("overwrite").parquet(f"{path}/doclen")
    rep = verify_text_index(spark, path)
    assert not rep["consistent"]
    assert rep["orphan_postings_docs"] == 10


def test_table_fingerprint_recursive_and_remote(tmp_path):
    """_table_fingerprint must see leaf files of a PARTITIONED layout
    (a leaf rewrite changes the key) and fall back to a plain path key
    for non-local sf_dirs instead of raising."""
    import os

    from finance_etl_system_spark.queries.retrieval import (
        _table_fingerprint,
    )

    sf = tmp_path / "sf"
    part = sf / "documents.parquet" / "bucket=3"
    part.mkdir(parents=True)
    leaf = part / "part-0.parquet"
    leaf.write_bytes(b"v1")
    fp1 = _table_fingerprint(str(sf))
    assert "bucket=3" in fp1 and "part-0.parquet" in fp1

    leaf.write_bytes(b"v2-longer")  # size change → new key
    assert _table_fingerprint(str(sf)) != fp1

    # non-local paths: plain key, no FileNotFoundError
    assert _table_fingerprint("hdfs://nn/warehouse/sf0.1") == os.path.join(
        "hdfs://nn/warehouse/sf0.1", "documents.parquet"
    )


def test_anomaly_mad_histogram_tracks_exact(spark):
    """The grouped-histogram median/MAD must sit within one bin width
    of the exact per-type values, and the flagged count must be close
    to the exact rule's (quantized thresholds move borderline events
    only)."""
    import pandas as pd

    from finance_etl_system_spark.queries.anomaly import (
        _MAD_BINS,
        q_anomaly_mad,
        q_anomaly_mad_histogram,
    )

    hist = {r.event_type: r for r in q_anomaly_mad_histogram(spark, SF_SMOKE).collect()}
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet").dropna(subset=["value"])
    for etype, grp in ev.groupby("event_type"):
        v = grp["value"]
        binw = (v.max() - v.min()) / _MAD_BINS
        r = hist[etype]
        assert abs(r.est_median - v.median()) <= binw + 0.02, (etype, r)
        exact_mad = (v - v.median()).abs().median()
        assert abs(r.est_mad - exact_mad) <= binw + 0.02, (etype, r)
        assert r.n == len(grp)
    exact_flags = (
        q_anomaly_mad(spark, SF_SMOKE)
        .groupBy("event_type")
        .count()
        .collect()
    )
    exact = {r.event_type: r["count"] for r in exact_flags}
    for etype, r in hist.items():
        assert abs(r.n_flagged - exact.get(etype, 0)) <= max(
            3, 0.3 * exact.get(etype, 0)
        ), (etype, r.n_flagged, exact.get(etype, 0))


def test_retrieval_eval_metrics_sane(spark):
    """Metric-range sanity at sf0.001 (exactness is oracle-checked):
    nDCG/recall in (0,1], MRR consistent with the ranked list."""
    from finance_etl_system_spark.queries.retrieval import (
        q_retrieval_eval_metrics,
    )

    r = q_retrieval_eval_metrics(spark, "/root/testdata/sf0.001").collect()[0]
    assert r.n_relevant > 0
    assert 0.0 < r.ndcg_at_10 <= 1.0
    assert 0.0 < r.recall_at_20 <= 1.0
    assert 0.0 <= r.mrr_at_20 <= 1.0


# Certification tier (verdict r11 #4; markers registered in
# tests/conftest.py): this module is excluded from the fast tier
# `pytest -m "not certify"` and runs in the full per-round gate.
# Assignment is duration-measured (tools/tier_report.py), not guessed.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.certify
