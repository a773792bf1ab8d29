"""End-to-end corpus-to-trainer rehearsal: discover → clean → dedup →
split → pack → EXPORT → validate, at sf0.1 and the N× replica
(round-5 verdict #6 — the export leg was the one round-5 surface
absent from the 10× table).

Per scale this runs the full pipeline/corpus.py build over documents
(eval slice = doc_id % EVAL_MOD == 0, the fixture contract), joins the
survivors' text back, exports JSONL shards via sources/export.py, then
runs the trainer-side validator and REQUIRES every shard green. Shard
count scales with the data (16 per sf0.1-worth) so per-shard size
stays constant — the posture a 100 TB export keeps.

Usage: python tools/corpus_export_check.py [mult]   # default 10
Prints the markdown rows SCALE.md embeds.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_SF = "/root/testdata/sf0.1"
BASE_SHARDS = 16


def rehearse(spark, sf_dir: str, n_shards: int, out: str) -> dict:
    from pyspark.sql import functions as F

    from finance_etl_system_spark.catalog import load_table
    from finance_etl_system_spark.pipeline.corpus import build_training_corpus
    from finance_etl_system_spark.queries.curation import EVAL_MOD
    from finance_etl_system_spark.sources.export import (
        validate_shard_export,
        write_jsonl_shards,
    )

    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % EVAL_MOD != 0)
    eval_slice = d.filter(F.col("doc_id") % EVAL_MOD == 0)

    t0 = time.time()
    kept = build_training_corpus(corpus, eval_slice)
    survivors = corpus.join(kept.select("doc_id"), "doc_id", "left_semi")
    manifest = write_jsonl_shards(
        survivors.select("doc_id", "text"), out, n_shards=n_shards
    )
    n_docs = manifest.agg(F.sum("n_docs")).first()[0]
    wall = time.time() - t0

    verdict = validate_shard_export(spark, out).collect()
    bad = [r for r in verdict if not (r.docs_match and r.chars_match)]
    assert not bad, f"validator found mismatched shards: {bad[:3]}"
    return {"wall": wall, "n_docs": int(n_docs), "n_shards": n_shards}


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    from finance_etl_system_spark.session import get_spark
    from tools.scale_check import synthesize

    spark = get_spark("corpus-export-check")
    scaled = synthesize(spark, mult)
    work = os.path.join(REPO, ".scale_data", "export_rehearsal")
    shutil.rmtree(work, ignore_errors=True)

    # warmup leg at the smallest sf: JVM/codegen/pandas-UDF spin-up
    # must not be billed to the base leg (first run of this pipeline
    # in a fresh JVM measured ~15 s of pure warmup)
    rehearse(spark, "/root/testdata/sf0.001", 4, os.path.join(work, "warm"))
    r1 = rehearse(spark, BASE_SF, BASE_SHARDS, os.path.join(work, "base"))
    rn = rehearse(
        spark, scaled, BASE_SHARDS * mult, os.path.join(work, f"x{mult}")
    )
    print("| leg | sf0.1 (s) | docs | "
          f"{mult}× (s) | docs | ratio | validator |")
    print("|---|---|---|---|---|---|---|")
    print(
        f"| corpus→export→validate | {r1['wall']:.2f} | {r1['n_docs']} "
        f"| {rn['wall']:.2f} | {rn['n_docs']} "
        f"| {rn['wall'] / r1['wall']:.1f} | all-green both |"
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
