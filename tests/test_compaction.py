"""Shared state-partition compactor (streaming/compaction.py): fold
correctness for the state shapes (distinct chunk hashes, unique-id
signatures, ADDITIVE gram counts), crash recovery at each step of the
generation-marker protocol, migration from the r11 staged-swap layout,
and reader atomicity against a concurrent fold. The chunk-gate-specific
decision-preservation tests live in tests/test_streaming_chunkgate.py."""

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
    read_live_state,
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
        for r in read_live_state(spark, state).select("id", "sig").collect()
    }


def _live_parts(spark, state):
    return {
        r.batch_id
        for r in read_live_state(spark, state)
        .select("batch_id").distinct().collect()
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
    parts = _live_parts(spark, state)
    # first fold publishes generation 2 (gen 1 is the implicit
    # pre-marker state, so a crashed first fold is reader-invisible)
    assert min(parts) == -2 and max(parts) >= 0
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
        for r in read_live_state(spark, counts)
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


def test_reader_resolved_before_commit_is_unaffected(spark, tmp_path):
    """The reader-atomicity contract itself: a live-state frame whose
    generation was resolved BEFORE a fold commits still collects the
    exact pre-fold rows AFTER the commit (deferred GC keeps its
    generation's files for a full cycle), while a fresh read after
    the commit sees the folded view with identical totals."""
    verd, counts = str(tmp_path / "verd"), str(tmp_path / "counts")
    _boiler_batches(spark, verd, counts)
    before = _count_totals(spark, counts)
    pre = read_live_state(spark, counts)  # generation resolved NOW
    assert compact_count_log(spark, counts, keep_last=1) == 2
    got_pre = {
        (r._h1, r._h2): r.total
        for r in pre.groupBy("_h1", "_h2")
        .agg(F.sum("n").alias("total")).collect()
    }
    assert got_pre == before  # old-generation reader: unchanged
    assert _count_totals(spark, counts) == before  # new reader: exact


def test_crash_before_publish_leaves_state_exact(spark, tmp_path):
    """Everything a fold writes before the marker rename is invisible:
    a 'crash' that wrote a garbage next-generation partition (no
    marker) changes nothing for readers, and the next compaction GCs
    it and recomputes the additive sums exactly once."""
    verd, counts = str(tmp_path / "verd"), str(tmp_path / "counts")
    _boiler_batches(spark, verd, counts)
    before = _count_totals(spark, counts)
    # garbage partial fold at the partition the FIRST fold targets
    # (generation 2): wrong totals that would corrupt if trusted
    (
        spark.createDataFrame([(1, 1, 999)], "_h1 long, _h2 long, n long")
        .write.mode("overwrite").parquet(f"{counts}/batch_id=-2")
    )
    assert _count_totals(spark, counts) == before  # readers: invisible
    assert compact_count_log(spark, counts, keep_last=1) == 2
    assert _count_totals(spark, counts) == before


def test_unparseable_marker_is_ignored_and_gcd(spark, tmp_path):
    """A half-written marker file (crash mid-create on a filesystem
    without atomic rename) is unparseable JSON: readers skip it (the
    prior generation stays live) and the next compaction deletes it
    — the state dir can never be wedged (advisor finding r11)."""
    verd, counts = str(tmp_path / "verd"), str(tmp_path / "counts")
    _boiler_batches(spark, verd, counts)
    before = _count_totals(spark, counts)
    assert compact_count_log(spark, counts, keep_last=1) == 2  # → gen 2
    # crash artifacts of a hypothetical NEXT fold: partial data + a
    # truncated marker prefix (what a non-atomic create could leave)
    (
        spark.createDataFrame([(7, 7, 7777)], "_h1 long, _h2 long, n long")
        .write.mode("overwrite").parquet(f"{counts}/batch_id=-3")
    )
    with open(os.path.join(counts, "_GEN_3.json"), "w") as fh:
        fh.write('{"gen": 3, "max_f')  # unbalanced braces: never parses
    assert _count_totals(spark, counts) == before  # gen 2 still live
    # new batches with ids ABOVE max_folded (the streaming contract:
    # epoch ids never reuse once committed)
    for b in (3, 4):
        (
            spark.createDataFrame([(8, 8, 1)], "_h1 long, _h2 long, n long")
            .withColumn("batch_id", F.lit(b))
            .write.mode("append").partitionBy("batch_id").parquet(counts)
        )
    expect = dict(before)
    expect[(8, 8)] = 2
    assert _count_totals(spark, counts) == expect
    assert compact_count_log(spark, counts, keep_last=1) == 2  # folds 2,3
    assert _count_totals(spark, counts) == expect
    # the garbage marker was GC'd and REPLACED by a complete gen-3
    # marker from the successful fold
    with open(os.path.join(counts, "_GEN_3.json")) as fh:
        mk = json.load(fh)
    assert mk["gen"] == 3 and mk["max_folded"] == 3
    # the garbage -3 partition was GC'd and the slot rewritten by the
    # good fold: live view = gen-3 consolidated + kept newest batch
    assert _live_parts(spark, counts) == {-3, 4}


def test_generation_cycle_folds_and_gcs(spark, tmp_path):
    """Three full compaction cycles: generations increment, totals
    stay exact, and the deferred GC removes a generation's inputs
    TWO cycles after they were folded (the r13 two-cycle grace
    window: each cycle keeps everything the live generation AND its
    predecessor can select, so a reader survives any single
    compaction cycle it overlaps)."""
    verd, counts = str(tmp_path / "verd"), str(tmp_path / "counts")
    _boiler_batches(spark, verd, counts, n=3)
    assert compact_count_log(spark, counts, keep_last=1) == 2  # → gen 2
    # folded inputs still on disk (grace window for in-flight readers)
    assert os.path.exists(os.path.join(counts, "batch_id=0"))
    assert os.path.exists(os.path.join(counts, "_GEN_2.json"))
    before = _count_totals(spark, counts)
    # two more batches with fresh ids (epoch ids never reuse)
    for b in (3, 4):
        (
            spark.createDataFrame([(9, 9, 1)], "_h1 long, _h2 long, n long")
            .withColumn("batch_id", F.lit(b))
            .write.mode("append").partitionBy("batch_id").parquet(counts)
        )
    assert compact_count_log(spark, counts, keep_last=1) == 2  # folds 2,3
    got = _count_totals(spark, counts)
    assert got[(9, 9)] == 2
    del got[(9, 9)]
    assert got == before
    # generation 3 committed; generation 1's raw partitions (folded
    # into gen 2) SURVIVE this cycle — gen-2 readers resolved before
    # this fold can still select them — and are GC'd only by the
    # NEXT compaction
    assert os.path.exists(os.path.join(counts, "_GEN_3.json"))
    assert os.path.exists(os.path.join(counts, "batch_id=0"))
    assert os.path.exists(os.path.join(counts, "batch_id=1"))
    assert os.path.exists(os.path.join(counts, "batch_id=-2"))
    assert _live_parts(spark, counts) == {-3, 4}
    # third cycle: now gen 1's raws (folded as of gen 2, two cycles
    # ago) are deleted; gen 2's consolidated partition and the raws
    # gen-2 readers need (batch 2,3) survive one more cycle
    for b in (5, 6):
        (
            spark.createDataFrame([(9, 9, 1)], "_h1 long, _h2 long, n long")
            .withColumn("batch_id", F.lit(b))
            .write.mode("append").partitionBy("batch_id").parquet(counts)
        )
    assert compact_count_log(spark, counts, keep_last=1) == 2  # folds 4,5
    assert os.path.exists(os.path.join(counts, "_GEN_4.json"))
    assert not os.path.exists(os.path.join(counts, "batch_id=0"))
    assert not os.path.exists(os.path.join(counts, "batch_id=1"))
    assert os.path.exists(os.path.join(counts, "batch_id=-3"))
    assert os.path.exists(os.path.join(counts, "batch_id=-2"))
    assert _live_parts(spark, counts) == {-4, 6}


def test_slow_reader_survives_a_full_compaction_cycle(spark, tmp_path):
    """The r12 residual, closed: a reader that resolved generation g
    and then sleeps through an ENTIRE subsequent compaction cycle
    (new batches + fold to g+1, new batches + fold to g+2 — the
    second fold is the one whose single-cycle GC used to delete
    generation g's files) still collects its exact generation-g
    view. The two-cycle GC keeps everything g's readers can select
    until the THIRD cycle."""
    verd, counts = str(tmp_path / "verd"), str(tmp_path / "counts")
    _boiler_batches(spark, verd, counts, n=3)  # batches 0,1,2
    assert compact_count_log(spark, counts, keep_last=1) == 2  # → gen 2
    expected = _count_totals(spark, counts)
    reader = read_live_state(spark, counts)  # resolves gen 2 NOW
    for b in (3, 4):
        (
            spark.createDataFrame([(9, 9, 1)], "_h1 long, _h2 long, n long")
            .withColumn("batch_id", F.lit(b))
            .write.mode("append").partitionBy("batch_id").parquet(counts)
        )
    assert compact_count_log(spark, counts, keep_last=1) == 2  # → gen 3
    for b in (5, 6):
        (
            spark.createDataFrame([(9, 9, 1)], "_h1 long, _h2 long, n long")
            .withColumn("batch_id", F.lit(b))
            .write.mode("append").partitionBy("batch_id").parquet(counts)
        )
    assert compact_count_log(spark, counts, keep_last=1) == 2  # → gen 4
    got = {
        (r._h1, r._h2): r.total
        for r in reader.groupBy("_h1", "_h2")
        .agg(F.sum("n").alias("total"))
        .collect()
    }
    assert got == expected


def test_legacy_pre_generation_dir_migrates(spark, tmp_path):
    """A state dir compacted by the r11 staged-swap protocol (a
    batch_id=-1 partition, no generation marker) is adopted as
    generation 1; the next fold produces generation 2 with exact
    totals."""
    counts = str(tmp_path / "counts")
    rows = [(-1, 1, 1, 10), (2, 1, 1, 5), (2, 2, 2, 7), (3, 1, 1, 1)]
    for b, h1, h2, n in rows:
        (
            spark.createDataFrame([(h1, h2, n)], "_h1 long, _h2 long, n long")
            .withColumn("batch_id", F.lit(b))
            .write.mode("append").partitionBy("batch_id").parquet(counts)
        )
    before = _count_totals(spark, counts)
    assert compact_count_log(spark, counts, keep_last=1) == 1  # folds 2
    assert _count_totals(spark, counts) == before
    assert os.path.exists(os.path.join(counts, "_GEN_2.json"))
    assert _live_parts(spark, counts) == {-2, 3}


def test_legacy_crashed_swap_recovers(spark, tmp_path):
    """r11 staged-swap crash artifacts still recover: a COMPLETE
    _COMPACTING marker replays the swap forward without re-folding
    (the double-count hazard); an UNPARSEABLE one (the r11 advisor
    finding) is discarded with its stage, and compaction recomputes."""
    verd, counts = str(tmp_path / "verd"), str(tmp_path / "counts")
    _boiler_batches(spark, verd, counts)
    before = _count_totals(spark, counts)
    # complete-marker crash point: stage written, marker written, swap
    # and deletes NOT done — exactly the r11 protocol's commit point
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
    assert _live_parts(spark, counts) == {COMPACTED_BATCH_ID, 2}
    assert not os.path.exists(os.path.join(counts, "_COMPACTING"))

    # unparseable-marker crash: marker and stage are both garbage
    verd2, counts2 = str(tmp_path / "verd2"), str(tmp_path / "counts2")
    _boiler_batches(spark, verd2, counts2)
    before2 = _count_totals(spark, counts2)
    (
        spark.createDataFrame([(1, 1, 999)], "_h1 long, _h2 long, n long")
        .write.mode("overwrite").parquet(f"{counts2}/_compact_tmp")
    )
    with open(os.path.join(counts2, "_COMPACTING"), "w") as fh:
        fh.write('{"fold": [0')  # truncated mid-write
    assert compact_count_log(spark, counts2, keep_last=1) == 2
    assert _count_totals(spark, counts2) == before2
    assert not os.path.exists(os.path.join(counts2, "_COMPACTING"))


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
    layout under the consolidated partition (probe pruning intact),
    and a retry of the kept newest batch must still change nothing."""
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
    # layout: consolidated gen-2 partition keeps bucket subdirs
    root = os.path.join(idx, "postings", "batch_id=-2")
    assert any(d.startswith("bucket=") for d in os.listdir(root))
    assert _live_parts(spark, f"{idx}/postings") == {-2, 2}
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
        for r in read_live_state(spark, d)
        .groupBy("k").agg(F.max("n").alias("n")).collect()
    }
    assert got == {(1, 3), (2, 10)}


def test_gdpr_compact_and_verify_read_live_generation_only(
    spark, tmp_path
):
    """Advisor r12 (medium): after compact_stream_index, the FOLDED
    raw batch partitions stay on disk until the next compaction's
    deferred GC. compact_text_index (the GDPR-delete rewrite) and
    verify_text_index must read the LIVE generation only in that
    window — a naive read would materialize the consolidated
    partition AND its folded inputs into the rewritten index
    (doubled term frequencies, corrupted BM25)."""
    from finance_etl_system_spark.operators.textindex import (
        bm25_search_index,
        compact_text_index,
        verify_text_index,
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

    def search():
        return [
            (r.rnk, r.doc_id, round(r.bm25, 9), r.n_terms_hit)
            for r in bm25_search_index(
                spark, idx, ["stream", "merge"]
            ).collect()
        ]

    assert compact_stream_index(spark, idx, keep_last=1) == 2
    # the post-fold window the advisor flagged: folded raw partitions
    # are still on disk (deferred GC), so a naive read double-counts
    on_disk = {
        n for n in os.listdir(os.path.join(idx, "postings"))
        if n.startswith("batch_id=")
    }
    assert {"batch_id=0", "batch_id=1", "batch_id=-2"} <= on_disk
    ver = verify_text_index(spark, idx)
    assert ver["consistent"], ver
    live_df = (
        read_live_state(spark, f"{idx}/postings")
        .filter(F.col("doc_id") != 3)
        .drop("batch_id")
    )
    cols = sorted(live_df.columns)
    live = {tuple(r) for r in live_df.select(*cols).collect()}
    # GDPR-delete doc 3 inside the window: the rewrite must carry
    # exactly the live rows minus doc 3 into the new index — one
    # posting row per (doc, term), folded inputs excluded
    compact_text_index(
        spark, idx, spark.createDataFrame([(3,)], "doc_id LONG")
    )
    post = spark.read.parquet(f"{idx}/postings")
    assert "batch_id" not in post.columns
    assert {tuple(r) for r in post.select(*cols).collect()} == live
    assert search()  # the compacted index still answers queries
    assert verify_text_index(spark, idx)["consistent"]


# Certification tier (verdict r11 #4; markers registered in
# tests/conftest.py): this module is excluded from the fast tier
# `pytest -m "not certify"` and runs in the full per-round gate.
# Assignment is duration-measured (tools/tier_report.py), not guessed.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.certify
