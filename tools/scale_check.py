"""Measure wall-clock scaling: headline queries at sf0.1 vs N× sf0.1.

Synthesizes an N-times replica of the sf0.1 star schema with
join-consistent key offsets (every copy shifts orderkey / custkey /
suppkey / partkey / event ids by the same stride, so joins and
aggregation group counts scale linearly; nation/region stay shared,
as dims would at 100 TB). Then times a representative headline subset
on both and prints the markdown table SCALE.md embeds.

The synthesized data lives under .scale_data/ (git-ignored). Usage:

    python tools/scale_check.py [mult]   # default 10
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_SF = "/root/testdata/sf0.1"
OUT = os.path.join(REPO, ".scale_data")

# (table, [key columns to stride-shift])
TABLES: list[tuple[str, list[str]]] = [
    ("region", []),
    ("nation", []),
    ("customer", ["c_custkey"]),
    ("supplier", ["s_suppkey"]),
    ("part", ["p_partkey"]),
    ("orders", ["o_orderkey", "o_custkey"]),
    ("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"]),
    ("events", ["event_id", "user_id"]),
    ("documents", ["doc_id"]),
    ("embeddings", ["vec_id"]),
]

# the FULL bench headline set (bench.py is the single source of
# truth), plus the sampling/CDC/layout/graph queries the headline
# doesn't carry — so the 10× table covers every headline query
_EXTRA = [
    "hash_sample",
    "cdc_merge",
    "zorder_stats",
    "nation_pagerank",
    "bpe_train_merges",
    "bpe_token_lengths",
    "k_anonymity",
    "knn_pq",
    "knn_ivf_pq",
    "ivf_pq_index_health",
    "pack_bpe",
    "triplet_mining",
    "quality_budget_take",
    "unigram_train_pieces",
    "unigram_token_lengths",
    "unigram_perplexity",
    "boilerplate_catalog",
]


def _query_names() -> list[str]:
    from bench import HEADLINE

    return list(HEADLINE) + _EXTRA

# stride larger than any base key so copies never collide
STRIDE = 10_000_000


def synthesize(spark, mult: int) -> str:
    from pyspark.sql import functions as F

    from finance_etl_system_spark.catalog import load_table

    out_dir = os.path.join(OUT, f"x{mult}")
    if os.path.isdir(out_dir):
        return out_dir  # reuse prior synthesis (deterministic)
    os.makedirs(OUT, exist_ok=True)
    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    for table, keys in TABLES:
        base = load_table(spark, BASE_SF, table)
        if not keys:  # shared dims: one copy
            base.write.mode("overwrite").parquet(os.path.join(tmp, f"{table}.parquet"))
            continue
        copies = None
        for i in range(mult):
            c = base
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * STRIDE))
            copies = c if copies is None else copies.unionAll(c)
        copies.write.mode("overwrite").parquet(os.path.join(tmp, f"{table}.parquet"))
    os.rename(tmp, out_dir)
    return out_dir


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    only = sys.argv[2:]  # optional query-name filter

    import __spark_entry__ as entrymod
    from finance_etl_system_spark.session import get_spark

    spark = get_spark("scale-check")
    scaled_dir = synthesize(spark, mult)
    qs = entrymod.queries()

    def best_of_2(fn, d):
        fn(spark, d).count()  # warm
        t = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn(spark, d).count()
            t = min(t, time.time() - t0)
        return t

    print(f"| query | sf0.1 (s) | {mult}× (s) | ratio |")
    print("|---|---|---|---|")
    for name in (only or _query_names()):
        fn = qs[name]
        t1 = best_of_2(fn, BASE_SF)
        tn = best_of_2(fn, scaled_dir)
        print(f"| {name} | {t1:.2f} | {tn:.2f} | {tn / t1:.1f} |")


if __name__ == "__main__":
    main()
