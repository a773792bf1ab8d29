"""Measure BPE training round-count and wall at a production-shaped
merge budget (round-7 verdict #1: one-merge-per-round makes a 32k-merge
vocab tens of thousands of sequential Spark jobs; the batched trainer
must show a >=10x round reduction at >=500 merges with an IDENTICAL
merge list).

For each batch size this trains the same corpus to the same budget and
prints: rounds, merges learned, wall seconds, merges/round, and whether
the merge list equals the batch=1 run (the sequential ground truth).

The sf documents table holds only ~31 unique words (training exhausts
at ~106 merges), so the bench corpus extends it with every pairwise
COMPOUND of its own words ("alphabeta", weight varying by index to mix
tied and untied counts) — a deterministic, testdata-derived vocabulary
rich enough to sustain a production-shaped merge budget.

Usage: python tools/bpe_bench.py [num_merges] [sf_dir] [min_freq]
       defaults: 500 /root/testdata/sf0.01 2
Prints the markdown table SCALE.md embeds.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from finance_etl_system_spark.catalog import load_table  # noqa: E402
from finance_etl_system_spark.operators.bpe import bpe_train  # noqa: E402
from finance_etl_system_spark.session import get_spark  # noqa: E402


def main() -> None:
    num_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    min_freq = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark()
    base = load_table(spark, sf_dir, "documents").select("text")
    words = sorted(
        r["term"]
        for r in __import__(
            "finance_etl_system_spark.operators.bpe",
            fromlist=["word_freq"],
        ).word_freq(base).collect()
    )
    compounds = [
        (" ".join([words[i] + words[j]] * (1 + (i + j) % 3)),)
        for i in range(len(words))
        for j in range(len(words))
    ]
    docs = base.union(
        spark.createDataFrame(compounds, "text string")
    ).localCheckpoint(eager=True)  # isolate train cost

    # tier label -> kwargs; "distributed seq" is the definitional
    # ground truth the others must match bit-for-bit
    tiers = [
        ("distributed-seq (batch=1)", dict(batch_merges=1,
                                           local_vocab_limit=0)),
        ("distributed-batched (batch=64)", dict(batch_merges=64,
                                                local_vocab_limit=0)),
        ("local delta+heap (default)", dict()),
    ]
    results = []
    baseline = None
    for label, kw in tiers:
        t0 = time.monotonic()
        model = bpe_train(docs, num_merges=num_merges, min_freq=min_freq, **kw)
        wall = time.monotonic() - t0
        if baseline is None:
            baseline = model.merges
        results.append(
            (
                label,
                model.rounds,
                len(model.merges),
                wall,
                len(model.merges) / max(1, model.rounds),
                model.merges == baseline,
            )
        )
        print(
            f"{label}: rounds={model.rounds} "
            f"merges={len(model.merges)} wall={wall:.1f}s "
            f"identical={model.merges == baseline}",
            file=sys.stderr,
        )

    print(f"\n<!-- bpe_bench num_merges={num_merges} sf={sf_dir} min_freq={min_freq} -->")
    print("| tier | driver round-trips | merges | wall (s) |"
          " merges/round | merge list == sequential |")
    print("|---|---|---|---|---|---|")
    for label, rounds, merges, wall, mpr, same in results:
        print(
            f"| {label} | {rounds} | {merges} | {wall:.1f} |"
            f" {mpr:.1f} | {'yes' if same else 'NO'} |"
        )


if __name__ == "__main__":
    main()
