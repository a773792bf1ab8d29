"""Certify the streaming chunk-gate's per-batch cost stays O(batch)
as its chunk-hash state grows (r10 verdict item 6).

The gate's only state interaction is one probe (left anti join of
the batch's chunk hashes against the accumulated index) plus one
batch-sized append partition (streaming/chunkgate.py). Per-batch
wall time should therefore be FLAT in the number of PRIOR batches —
if it trended with state size, the stream would slow linearly as the
corpus accumulates and stall at 100 TB.

Method: feed N equal-sized batches of unique synthetic documents
(every batch contributes fresh chunks, so state grows maximally —
worst case for the probe) through chunk_gate_batch and time each.
Report the early-window vs late-window mean; the certification is
late/early, which must stay near 1.0 while state grows ~N-fold.

State-size formula (documented in SCALE.md): |state| = one 64-hex
sha256 row per DISTINCT content-defined chunk ≈ corpus_bytes /
avg_chunk_size (default 1 KiB target) — the standing index every
CDC-dedup system keeps; hash-partitioned, append-only, probed by one
equi-join per batch.

Usage: python tools/chunkgate_scale.py [n_batches] [docs_per_batch]
                                       [compact_every]

``compact_every`` > 0 runs compact_chunk_state every that many
batches (keep_last=1), measuring the file-fanout benefit of the r11
state compactor under the same worst-case load.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _batch_df(spark, batch_idx: int, n_docs: int):
    """Unique deterministic docs (~2.5 KiB each, several chunks):
    every word carries the (batch, doc) coordinates so no chunk ever
    repeats across batches — state grows by the full batch each
    time, the probe's worst case."""
    rows = []
    base = batch_idx * n_docs
    for d in range(n_docs):
        did = base + d
        text = " ".join(
            f"w{batch_idx}x{did}x{w}" for w in range(220)
        )
        rows.append((did, text))
    return spark.createDataFrame(rows, "doc_id long, text string")


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    compact_every = int(sys.argv[3]) if len(sys.argv) > 3 else 0

    from finance_etl_system_spark.session import get_spark
    from finance_etl_system_spark.streaming.chunkgate import (
        chunk_gate_batch,
        compact_chunk_state,
    )
    from finance_etl_system_spark.streaming.compaction import (
        read_live_state,
    )

    spark = get_spark("chunkgate-scale")
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale_data", "chunkgate",
    )
    shutil.rmtree(root, ignore_errors=True)
    kept, rej, state = (os.path.join(root, d) for d in ("kept", "rej", "state"))

    times: list[float] = []
    compact_secs = 0.0
    for b in range(n_batches):
        if compact_every and b and b % compact_every == 0:
            t0 = time.time()
            compact_chunk_state(spark, state, keep_last=1)
            compact_secs += time.time() - t0
        df = _batch_df(spark, b, per_batch)
        t0 = time.time()
        chunk_gate_batch(df, b, kept, rej, state)
        times.append(time.time() - t0)

    # live view: after a generation-flip compaction the raw dir still
    # holds folded inputs until the next GC cycle — counting them
    # would double-report state size
    state_rows = read_live_state(spark, state).count()
    # windows skip batch 0 (empty-state fast path + JVM warm)
    early = times[1:6]
    late = times[-5:]
    e, l = sum(early) / len(early), sum(late) / len(late)
    print(f"batches={n_batches} docs/batch={per_batch} "
          f"state_rows={state_rows} compact_every={compact_every} "
          f"compact_total={compact_secs:.2f}s")
    print("per-batch sec:",
          " ".join(f"{t:.2f}" for t in times))
    print(f"early mean (b1-5) {e:.2f}s | late mean (last 5) {l:.2f}s "
          f"| late/early {l / e:.2f} with state {n_batches}x grown")
    print("| stream_chunk_gate per-batch | "
          f"{e:.2f}s @ ~{per_batch * 5} state chunks | "
          f"{l:.2f}s @ ~{state_rows} state chunks | "
          f"{l / e:.2f}x |")
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
