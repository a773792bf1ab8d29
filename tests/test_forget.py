"""Right-to-be-forgotten composition (operators/forget.py): one
deletion list applied across corpus parquet, text index, IVF and
IVF-PQ indexes, and dedup signature state — absence verified through
each artifact's own read path, audit counts exact, re-run idempotent."""

from __future__ import annotations

import pytest

from finance_etl_system_spark.catalog import load_table
from finance_etl_system_spark.operators.forget import forget_documents

SF = "/root/testdata/sf0.001"
FORGET_IDS = [3, 7]


@pytest.mark.timeout(600)
def test_forget_across_all_artifacts(spark, tmp_path):
    from finance_etl_system_spark.operators.pq import build_ivf_pq_index
    from finance_etl_system_spark.operators.similarity import (
        build_ivf_index,
        cosine_topk_ivf_index,
    )
    from finance_etl_system_spark.operators.textindex import (
        bm25_search_index,
        build_text_index,
    )
    from finance_etl_system_spark.streaming.dedup import (
        dedup_increment_batch,
    )

    docs = load_table(spark, SF, "documents")
    embs = load_table(spark, SF, "embeddings")

    corpus_path = str(tmp_path / "corpus.parquet")
    docs.write.parquet(corpus_path)
    ti = str(tmp_path / "text_index")
    build_text_index(docs, ti)
    ivf = str(tmp_path / "ivf")
    build_ivf_index(embs, ivf, k_clusters=4)
    ivfpq = str(tmp_path / "ivfpq")
    build_ivf_pq_index(embs, ivfpq, dim=64, k_clusters=4, m=8, k_codes=16)
    verd, state = str(tmp_path / "verd"), str(tmp_path / "state")
    dedup_increment_batch(docs.select("doc_id", "text"), 0, verd, state)
    st = spark.read.parquet(state)
    assert st.filter(st.id.isin(FORGET_IDS)).count() > 0

    ids = spark.createDataFrame([(i,) for i in FORGET_IDS], "doc_id long")
    audit = forget_documents(
        spark,
        ids,
        corpus_tables={"documents": corpus_path},
        text_index=ti,
        ivf_index=ivf,
        ivf_pq_index=ivfpq,
        dedup_state=state,
    )
    rows = {r.artifact: r for r in audit.collect()}
    assert set(rows) == {
        "documents", "text_index", "ivf_index", "ivf_pq_index",
        "dedup_state",
    }
    # corpus: exactly the two docs gone
    assert rows["documents"].rows_deleted == 2
    assert (
        spark.read.parquet(corpus_path)
        .filter(F_col_in("doc_id", FORGET_IDS))
        .count()
        == 0
    )
    # vector indexes: the two vec_ids gone from the stored tables
    assert rows["ivf_index"].rows_deleted == 2
    assert rows["ivf_pq_index"].rows_deleted == 2
    assert (
        spark.read.parquet(f"{ivf}/vectors")
        .filter(F_col_in("vec_id", FORGET_IDS))
        .count()
        == 0
    )
    # dedup state: the signature rows gone
    assert rows["dedup_state"].rows_deleted > 0
    assert (
        spark.read.parquet(state).filter(F_col_in("id", FORGET_IDS)).count()
        == 0
    )
    # probe paths never return the forgotten ids
    got = {
        r.doc_id
        for r in bm25_search_index(
            spark, ti, ["stream", "merge", "partition"], k=50
        ).collect()
    }
    assert not (got & set(FORGET_IDS))
    from pyspark.sql import functions as F

    q = embs.limit(2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    near = cosine_topk_ivf_index(spark, ivf, q, k=20, nprobe=4)
    assert not ({r.cid for r in near.collect()} & set(FORGET_IDS))

    # idempotent: a second forget deletes nothing more
    audit2 = forget_documents(
        spark,
        ids,
        corpus_tables={"documents": corpus_path},
        text_index=ti,
        ivf_index=ivf,
        ivf_pq_index=ivfpq,
        dedup_state=state,
    )
    assert all(r.rows_deleted == 0 for r in audit2.collect())


def F_col_in(col, vals):
    from pyspark.sql import functions as F

    return F.col(col).isin(vals)


@pytest.mark.timeout(300)
def test_forget_everything_partitioned_state_bootstraps_cleanly(
    spark, tmp_path
):
    """A deletion list covering EVERY row of the partitioned dedup
    state: the table dir is removed (the dedup reader's documented
    bootstrap state), the audit reports exact counts, and — the r9
    review gap — the NEXT streaming dedup batch must append fresh
    partitioned state and read back cleanly (an unpartitioned empty
    part file at the root would poison partition discovery)."""
    from finance_etl_system_spark.streaming.dedup import (
        dedup_increment_batch,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    verd, state = str(tmp_path / "verd"), str(tmp_path / "state")
    dedup_increment_batch(docs.filter("doc_id < 30"), 0, verd, state)
    all_ids = spark.read.parquet(state).select(
        F_col_alias("id", "doc_id")
    )
    n_before = all_ids.count()
    assert n_before > 0
    audit = forget_documents(spark, all_ids, dedup_state=state)
    row = audit.collect()[0]
    assert (row.rows_before, row.rows_after, row.rows_deleted) == (
        n_before, 0, n_before,
    )
    import os

    assert not os.path.exists(state)  # bootstrap state, not a stub file
    # the next batch appends into a FRESH partitioned layout
    dedup_increment_batch(
        docs.filter("doc_id >= 30 and doc_id < 60"), 1, verd, state
    )
    back = spark.read.parquet(state)
    assert back.count() > 0
    assert {r["batch_id"] for r in back.select("batch_id").collect()} == {1}


def F_col_alias(col, alias):
    from pyspark.sql import functions as F

    return F.col(col).alias(alias)


@pytest.mark.timeout(300)
def test_forget_ignores_stale_staging_under_dynamic_mode(
    spark, tmp_path
):
    """GDPR hazard from ADVICE r8: a crashed prior forget leaves
    {path}.staging containing rows for the to-be-forgotten id, and a
    streaming sink left the session in DYNAMIC partitionOverwriteMode.
    Without the static pin + staging pre-delete, the partitioned
    overwrite merges into the stale staging dir and the swap promotes
    supposedly-forgotten rows. The fixed writer must erase id=1."""
    path = str(tmp_path / "state.parquet")
    df = spark.createDataFrame(
        [(1, 0, "a"), (2, 0, "b"), (3, 1, "c")],
        "id long, batch_id long, sig string",
    )
    df.write.partitionBy("batch_id").parquet(path)
    # stale staging from a "crashed" earlier run: id=1 in batch 7,
    # a partition the retry's kept-set does not touch
    stale = spark.createDataFrame(
        [(1, 7, "zombie")], "id long, batch_id long, sig string"
    )
    stale.write.partitionBy("batch_id").parquet(f"{path}.staging")
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        ids = spark.createDataFrame([(1,)], "id long")
        forget_documents(spark, ids, dedup_state=path)
    finally:
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", prev
        )
    back = spark.read.parquet(path)
    assert back.filter("id = 1").count() == 0
    assert back.count() == 2


# Certification tier (verdict r11 #4; markers registered in
# tests/conftest.py): this module is excluded from the fast tier
# `pytest -m "not certify"` and runs in the full per-round gate.
# Assignment is duration-measured (tools/tier_report.py), not guessed.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.certify
