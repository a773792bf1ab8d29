"""Shared state-partition compactor (streaming/compaction.py): fold
correctness for all three state shapes (distinct chunk hashes,
unique-id signatures, ADDITIVE gram counts) and crash recovery at
each step of the staged-swap protocol. The chunk-gate-specific
decision-preservation test lives in tests/test_streaming_chunkgate.py."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from finance_etl_system_spark.streaming.boilerplate import (
    boilerplate_increment_batch,
)
from finance_etl_system_spark.streaming.compaction import (
    COMPACTED_BATCH_ID,
    compact_batch_partitions,
    compact_count_log,
    compact_sig_state,
)
from finance_etl_system_spark.streaming.dedup import dedup_increment_batch

DOCS = [
    # batch 0: two distinct docs; batch 1: near-copy of doc 0 + fresh;
    # batch 2: fresh — enough to populate sig state across 3 batches
    [(0, " ".join(f"tok{i} alpha{i}" for i in range(40))),
     (1, " ".join(f"beta{i} gamma{i}" for i in range(40)))],
    [(10, " ".join(f"tok{i} alpha{i}" for i in range(40)) + " tail"),
     (11, " ".join(f"delta{i} eps{i}" for i in range(40)))],
    [(20, " ".join(f"zeta{i} theta{i}" for i in range(40)))],
]


def _sig_rows(spark, state):
    return {
        (r.id, tuple(r.sig))
        for r in spark.read.parquet(state).select("id", "sig").collect()
    }


def test_compact_sig_state_preserves_rows_and_verdicts(spark, tmp_path):
    verd, state = str(tmp_path / "verd"), str(tmp_path / "state")
    for i, rows in enumerate(DOCS):
        dedup_increment_batch(
            spark.createDataFrame(rows, "doc_id long, text string"),
            i, verd, state, id_col="doc_id",
        )
    before = _sig_rows(spark, state)
    assert compact_sig_state(spark, state, keep_last=1) >= 1
    assert _sig_rows(spark, state) == before
    parts = {
        r.batch_id
        for r in spark.read.parquet(state).select("batch_id").distinct().collect()
    }
    assert COMPACTED_BATCH_ID in parts and max(parts) >= 0
    assert compact_sig_state(spark, state, keep_last=1) == 0  # idempotent

    # the next batch still dedups against folded history: a near-copy
    # of doc 0 must be flagged as a dup, not a survivor
    dedup_increment_batch(
        spark.createDataFrame(
            [(30, DOCS[0][0][1] + " x")], "doc_id long, text string"
        ),
        3, verd, state, id_col="doc_id",
    )
    verdicts = spark.read.parquet(verd).filter(F.col("batch_id") == 3).collect()
    # one verdict: doc 30 resolved as a dup of doc 0 via FOLDED history
    assert [(r.id, r.dup_of) for r in verdicts] == [(30, 0)]


def _count_totals(spark, counts):
    return {
        (r._h1, r._h2): r.total
        for r in spark.read.parquet(counts)
        .groupBy("_h1", "_h2").agg(F.sum("n").alias("total")).collect()
    }


def _boiler_batches(spark, verd, counts, n=3):
    text = "the quick brown fox jumps over the lazy dog " * 4
    for i in range(n):
        boilerplate_increment_batch(
            spark.createDataFrame(
                [(100 * i + j, text) for j in range(2)],
                "doc_id long, text string",
            ),
            i, verd, counts,
        )


def test_compact_count_log_sums_exactly_once(spark, tmp_path):
    verd, counts = str(tmp_path / "verd"), str(tmp_path / "counts")
    _boiler_batches(spark, verd, counts)
    before = _count_totals(spark, counts)
    assert compact_count_log(spark, counts, keep_last=1) == 2
    assert _count_totals(spark, counts) == before  # additive fold exact
    assert compact_count_log(spark, counts, keep_last=1) == 0


def test_recovery_from_crash_before_marker_discards_stale_stage(
    spark, tmp_path
):
    """No marker ⇒ any _compact_tmp is a partial stage from a crash
    and must be discarded, then compaction recomputes cleanly."""
    verd, counts = str(tmp_path / "verd"), str(tmp_path / "counts")
    _boiler_batches(spark, verd, counts)
    before = _count_totals(spark, counts)
    # garbage stage: wrong totals that would corrupt if trusted
    (
        spark.createDataFrame([(1, 1, 999)], "_h1 long, _h2 long, n long")
        .write.mode("overwrite").parquet(f"{counts}/_compact_tmp")
    )
    assert compact_count_log(spark, counts, keep_last=1) == 2
    assert _count_totals(spark, counts) == before


def test_recovery_from_crash_after_marker_completes_swap(spark, tmp_path):
    """Marker present ⇒ the stage is complete and authoritative; a
    re-run must finish the swap WITHOUT re-folding (the double-count
    hazard the staged protocol exists for)."""
    verd, counts = str(tmp_path / "verd"), str(tmp_path / "counts")
    _boiler_batches(spark, verd, counts)
    before = _count_totals(spark, counts)
    # simulate the crash point: stage written, marker written, swap
    # and deletes NOT done — exactly what compact_batch_partitions
    # does up to its _write_marker call
    df = spark.read.parquet(counts)
    fold = [0, 1]
    (
        df.filter(F.col("batch_id").isin(fold))
        .groupBy("_h1", "_h2").agg(F.sum("n").alias("n"))
        .write.mode("overwrite").parquet(f"{counts}/_compact_tmp")
    )
    with open(os.path.join(counts, "_COMPACTING"), "w") as fh:
        fh.write(json.dumps({"fold": fold}))
    # next compaction call first replays the pending swap forward,
    # then finds nothing further to fold
    assert compact_count_log(spark, counts, keep_last=1) == 0
    assert _count_totals(spark, counts) == before
    parts = {
        r.batch_id
        for r in spark.read.parquet(counts).select("batch_id").distinct().collect()
    }
    assert parts == {COMPACTED_BATCH_ID, 2}
    assert not os.path.exists(os.path.join(counts, "_COMPACTING"))


def test_compact_drift_counts_keeps_cumulative_psi(spark, tmp_path):
    """Twin runs over the same 4 batches — one compacted after batch
    2, one never — must produce IDENTICAL batch-3 verdict rows
    (cumulative PSI reads the counts log; the fold must not change
    its sums)."""
    from finance_etl_system_spark.streaming.compaction import (
        compact_drift_counts,
    )
    from finance_etl_system_spark.streaming.drift import drift_monitor_batch

    edges = [10.0, 20.0, 30.0]
    ref = {1: 0.25, 2: 0.25, 3: 0.25, 4: 0.25}
    batches = [
        [(float(5 + 10 * (j % 4)),) for j in range(40 + 8 * i)]
        for i in range(4)
    ]
    dirs = {
        name: (str(tmp_path / f"c_{name}"), str(tmp_path / f"v_{name}"))
        for name in ("plain", "compacted")
    }
    for name, (counts, verd) in dirs.items():
        for i, rows in enumerate(batches):
            if name == "compacted" and i == 3:
                assert compact_drift_counts(spark, counts, keep_last=1) == 2
            drift_monitor_batch(
                spark.createDataFrame(rows, "v double"),
                i, value_col="v", edges=edges, ref_fracs=ref,
                counts_dir=counts, verdict_dir=verd,
            )
    rows = {}
    for name, (_counts, verd) in dirs.items():
        (r,) = (
            spark.read.parquet(verd).filter(F.col("batch_id") == 3).collect()
        )
        rows[name] = tuple(r)
    assert rows["plain"] == rows["compacted"]


def test_compact_stream_index_preserves_search_and_pruning(
    spark, tmp_path
):
    """The streaming text index is the fastest-growing layout
    (batches x buckets partitions): folding retired batch partitions
    must keep BM25 results identical, keep the bucket sub-partition
    layout under batch_id=-1 (probe pruning intact), and a retry of
    the kept newest batch must still change nothing."""
    from finance_etl_system_spark.operators.textindex import (
        bm25_search_index,
    )
    from finance_etl_system_spark.streaming.compaction import (
        compact_stream_index,
    )
    from finance_etl_system_spark.streaming.indexing import index_batch

    docs = [
        (1, "spark streams merge data quickly across partitions"),
        (2, "the stream merges and shuffles rows by key"),
        (3, "unrelated prose about cooking pasta tonight"),
        (4, "another stream document about merge strategies"),
        (5, "merge windows stream through spark executors"),
        (6, "completely different text on gardening and soil"),
    ]
    idx = str(tmp_path / "idx")
    for i in range(3):
        index_batch(
            spark.createDataFrame(
                docs[2 * i : 2 * i + 2], "doc_id LONG, text STRING"
            ),
            i, idx,
        )
    terms = ["stream", "merge"]

    def search():
        return [
            (r.rnk, r.doc_id, round(r.bm25, 9), r.n_terms_hit)
            for r in bm25_search_index(spark, idx, terms).collect()
        ]

    want = search()
    assert compact_stream_index(spark, idx, keep_last=1) == 2
    assert search() == want
    # layout: consolidated partition keeps bucket subdirs
    root = os.path.join(idx, "postings", "batch_id=-1")
    assert any(d.startswith("bucket=") for d in os.listdir(root))
    parts = {
        r.batch_id
        for r in spark.read.parquet(f"{idx}/postings")
        .select("batch_id").distinct().collect()
    }
    assert parts == {COMPACTED_BATCH_ID, 2}
    # retry of the kept newest batch still converges
    index_batch(
        spark.createDataFrame(docs[4:6], "doc_id LONG, text STRING"), 2, idx
    )
    assert search() == want
    assert compact_stream_index(spark, idx, keep_last=1) == 0


def test_compact_missing_and_small_states_are_noops(spark, tmp_path):
    assert compact_count_log(spark, str(tmp_path / "absent")) == 0
    verd, counts = str(tmp_path / "verd"), str(tmp_path / "counts")
    _boiler_batches(spark, verd, counts, n=1)
    # one live partition, keep_last=1: nothing to fold
    assert compact_count_log(spark, counts, keep_last=1) == 0


def test_generic_fold_rejects_nothing_but_uses_callable(spark, tmp_path):
    """compact_batch_partitions is the extension point: a custom fold
    (here: keep max n per key — an idempotent lattice merge) works
    through the same protocol."""
    d = str(tmp_path / "state")
    for b in range(3):
        (
            spark.createDataFrame(
                [(1, b + 1), (2, 10 - b)], "k long, n long"
            )
            .withColumn("batch_id", F.lit(b))
            .write.mode("append").partitionBy("batch_id").parquet(d)
        )
    assert compact_batch_partitions(
        spark, d,
        lambda df: df.groupBy("k").agg(F.max("n").alias("n")),
        keep_last=1,
    ) == 2
    got = {
        (r.k, r.n)
        for r in spark.read.parquet(d)
        .groupBy("k").agg(F.max("n").alias("n")).collect()
    }
    assert got == {(1, 3), (2, 10)}
