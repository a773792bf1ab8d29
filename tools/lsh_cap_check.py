"""Measure the MinHash-LSH hot-bucket cap: does it bound candidate
pairs, and what recall does it cost? (round-5 verdict #1)

The 10× replica (tools/scale_check.py) clones every document 10 times
under strided doc_ids — an adversarially duplicate-heavy corpus where
UNCAPPED banding goes quadratic in the clone-cluster sizes (the 3.4×
wall row in SCALE.md's 10× table is exactly this candidate-pair
growth). For each (scale, cap) cell this prints:

- candidate_pairs: distinct (id_a, id_b) the band join emits;
- pair_bound: Σ over pre-cap buckets of C(size, 2) for size ≤ cap and
  0 for over-cap buckets (the cap DROPS the whole bucket, it does not
  truncate it) — the
  invariant lsh_candidate_stats certifies (pairs ≤ bound, always);
- dropped: band rows removed by the cap;
- wall: full minhash_lsh_pairs (signature → band join → verify) at
  verify_threshold 0.5, best of 2;
- recall: fraction of the UNCAPPED verified pairs (est_jaccard ≥ 0.5)
  the capped run still finds at the same scale.

Usage: python tools/lsh_cap_check.py [mult]   # default 10
Prints the markdown table SCALE.md embeds.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_SF = "/root/testdata/sf0.1"
# ∞ / loose / modest / tight-below-the-clone-multiplicity: the 10×
# replica clones every doc 10×, so cap=8 drops every clone bucket —
# the boilerplate-blowup case the cap exists for
CAPS: list[int | None] = [None, 100, 20, 8]


def _pairs(spark, sf_dir, cap):
    from finance_etl_system_spark.catalog import load_table
    from finance_etl_system_spark.operators.dedup import minhash_lsh_pairs

    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        d, n=3, num_perm=32, bands=8, verify_threshold=0.5, max_bucket=cap
    )


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    from finance_etl_system_spark.catalog import load_table
    from finance_etl_system_spark.operators.dedup import lsh_candidate_stats
    from finance_etl_system_spark.session import get_spark
    from tools.scale_check import synthesize

    spark = get_spark("lsh-cap-check")
    scaled = synthesize(spark, mult)

    print("| scale | cap | candidate_pairs | pair_bound | dropped rows "
          "| wall (s) | recall vs uncapped |")
    print("|---|---|---|---|---|---|---|")
    for label, sf_dir in (("sf0.1", BASE_SF), (f"{mult}×", scaled)):
        docs = load_table(spark, sf_dir, "documents")
        base_pairs = None
        for cap in CAPS:
            stats = lsh_candidate_stats(docs, max_bucket=cap)
            assert stats["candidate_pairs"] <= stats["pair_bound"], stats
            wall = float("inf")
            got = None
            for _ in range(2):
                t0 = time.time()
                got = {
                    (r.id_a, r.id_b) for r in _pairs(spark, sf_dir, cap).collect()
                }
                wall = min(wall, time.time() - t0)
            if base_pairs is None:
                base_pairs = got
                recall = "1.000 (ref)"
            else:
                recall = (
                    f"{len(got & base_pairs) / max(1, len(base_pairs)):.3f}"
                )
            print(
                f"| {label} | {cap if cap is not None else '∞'} "
                f"| {stats['candidate_pairs']} | {stats['pair_bound']} "
                f"| {stats['band_rows_dropped']} | {wall:.2f} | {recall} |"
            )





def boilerplate_main() -> None:
    """Skewed-duplication variant (round-6 verdict #3): the main table
    clones every doc uniformly; production LSH blowups are instead one
    boilerplate cohort — a shared banner across ~30% of docs, longer
    than the content it wraps. Build that corpus from the REAL sf0.1
    documents (banner = 120 tokens onto doc_id % 10 < 3; 250 planted
    content near-dup pairs as +10M-id copies that inherit banner
    status), then show the cap collapses the candidate volume while
    content-pair recall vs the uncapped run stays >= 0.98."""
    import pyspark.sql.functions as F

    from finance_etl_system_spark.catalog import load_table
    from finance_etl_system_spark.operators.dedup import (
        lsh_candidate_stats,
        minhash_lsh_pairs,
    )
    from finance_etl_system_spark.session import get_spark

    spark = get_spark("lsh-cap-boilerplate")
    docs = load_table(spark, BASE_SF, "documents").select("doc_id", "text")
    banner = " ".join(f"boiler{j}" for j in range(120))
    copies = docs.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tailtoken")).alias("text"),
    )
    corpus = (
        docs.unionByName(copies)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 10 < 3,
                F.concat(F.lit(banner + " "), F.col("text")),
            ).otherwise(F.col("text")),
        )
        .localCheckpoint(eager=True)
    )
    planted = {
        (int(r[0]), int(r[0]) + 10_000_000)
        for r in docs.filter(F.col("doc_id") % 20 == 0)
        .select("doc_id")
        .collect()
    }

    def run(cap):
        wall = float("inf")
        got = None
        for _ in range(2):
            t0 = time.time()
            got = {
                (r.id_a, r.id_b)
                for r in minhash_lsh_pairs(
                    corpus, n=3, num_perm=32, bands=8,
                    verify_threshold=0.5, max_bucket=cap,
                ).collect()
            }
            wall = min(wall, time.time() - t0)
        return got, wall

    print("| corpus | cap | candidate_pairs | pair_bound | dropped rows "
          "| wall (s) | content recall vs uncapped |")
    print("|---|---|---|---|---|---|---|")
    base_planted = None
    for cap in CAPS:
        stats = lsh_candidate_stats(corpus, max_bucket=cap)
        assert stats["candidate_pairs"] <= stats["pair_bound"], stats
        got, wall = run(cap)
        hit = got & planted
        if base_planted is None:
            base_planted = hit
            recall = f"1.000 ({len(hit)}/{len(planted)} planted found)"
        else:
            recall = f"{len(hit & base_planted) / max(1, len(base_planted)):.3f}"
        print(
            f"| boilerplate-30% | {cap if cap is not None else '∞'} "
            f"| {stats['candidate_pairs']} | {stats['pair_bound']} "
            f"| {stats['band_rows_dropped']} | {wall:.2f} | {recall} |"
        )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "boilerplate":
        boilerplate_main()
    else:
        main()
