"""Skewed-cluster rehearsal for the blockwise embedding kernels
(round-7 verdict #4): semantic_dedup and mine_triplets cap per-cluster
work, but the SCALE.md 10x rows used naturally balanced k-means
clusters. This plants a PATHOLOGICAL cluster — ``frac`` (default 40%)
of a ``mult``x-replicated embeddings corpus rewritten to tiny
deterministic perturbations of one base vector, the "boilerplate"
failure mode of production corpora — and verifies:

- wall stays bounded (vs the balanced replica at the same row count);
- the giant cluster trips the caps: semantic_dedup emits
  overflow=true rows (kept verbatim, never dropped) and mine_triplets
  emits truncated=true triplets;
- no memory blowup: the kernels complete under the same executor
  budget (the blockwise panels are O(block x kept), so a 40% cluster
  costs panel rows, not an n^2 matrix).

Mirrors tools/lsh_cap_check.py's boilerplate treatment for MinHash.
Usage: python tools/skew_cluster_check.py [mult] [frac] [max_cluster]
       defaults: 10 0.4 5000 — the sf0.1 embeddings table is 2k rows,
       so at 10x (20k rows) the production 20k cap cannot trip; the
       5k harness cap keeps the cap/corpus ratio meaningful, and a
       100x run with the production 20k cap exercises the real knob
Prints the markdown table SCALE.md embeds.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from finance_etl_system_spark.catalog import load_table  # noqa: E402
from finance_etl_system_spark.operators.clustering import (  # noqa: E402
    kmeans_assign,
    kmeans_fit,
)
from finance_etl_system_spark.operators.mining import mine_triplets  # noqa: E402
from finance_etl_system_spark.operators.semdedup import semantic_dedup  # noqa: E402
from finance_etl_system_spark.session import get_spark  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
DIM = 64


def replicate(e, mult: int):
    n = e.count()
    copies = e.sparkSession.range(mult).select(
        F.col("id").alias("_copy")
    )
    return e.crossJoin(F.broadcast(copies)).select(
        (F.col("vec_id") + F.col("_copy") * F.lit(n)).alias("vec_id"),
        "label",
        "embedding",
    )


def plant_boilerplate(e, frac: float):
    """Rewrite ~frac of rows to near-identical vectors: one base
    direction plus a deterministic per-row 1e-9 perturbation on one
    coordinate — distinct bit patterns, cosine 1-1e-18-ish. The
    perturbation is small enough that distances to duplicate-seeded
    centroids tie in float64, so argmin's first-index tie-break
    funnels the WHOLE family into one cluster in any k-means run —
    the guaranteed-pathological case (a 1e-4 jitter lets Lloyd
    split the family across same-point seeds run-dependently)."""
    base = [float(i % 5 + 1) for i in range(DIM)]
    planted = F.transform(
        F.array(*[F.lit(v) for v in base]),
        lambda v, i: v
        + F.when(
            i == F.pmod(F.col("vec_id"), DIM).cast("int"),
            (F.pmod(F.col("vec_id"), 97) * 1e-9).cast("double"),
        ).otherwise(F.lit(0.0)),
    )
    is_planted = (
        F.pmod(F.xxhash64("vec_id"), F.lit(10_000))
        < F.lit(int(frac * 10_000))
    )
    return e.select(
        "vec_id",
        "label",
        F.when(is_planted, planted).otherwise(
            F.col("embedding").cast("array<double>")
        ).alias("embedding"),
    )


def run_semdedup(e, max_cluster: int):
    model = kmeans_fit(e, k=16, max_iter=5)
    assigned = kmeans_assign(e, model.centroids)
    flags = semantic_dedup(
        assigned, eps=0.95, max_cluster=max_cluster
    )
    agg = flags.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("kept").cast("long")).alias("kept"),
        F.sum(F.col("overflow").cast("long")).alias("overflow"),
    ).collect()[0]
    sizes = [
        r["n"]
        for r in flags.groupBy("cluster").count().withColumnRenamed(
            "count", "n"
        ).collect()
    ]
    return dict(
        n=int(agg["n"]), kept=int(agg["kept"]),
        overflow=int(agg["overflow"] or 0), max_cluster_size=max(sizes),
    )


def run_mining(e, max_cluster: int):
    # neg band opens at -1 so a hard negative (most-similar
    # non-positive) always exists once a positive does
    t, report = mine_triplets(
        e, k_clusters=16, max_cluster=max_cluster,
        pos_threshold=0.9, neg_lo=-1.0, neg_hi=0.9, with_report=True,
    )
    agg = t.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("truncated").cast("long")).alias("truncated"),
    ).collect()[0]
    rep = report.filter("truncated").collect()
    return dict(
        n=int(agg["n"]), truncated=int(agg["truncated"] or 0),
        truncated_clusters=len(rep),
        truncated_members=sum(r["n_members"] for r in rep),
    )


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.4
    spark = get_spark()
    base = load_table(spark, BASE_SF, "embeddings")
    balanced = replicate(base, mult).localCheckpoint(eager=True)
    skewed = plant_boilerplate(balanced, frac).localCheckpoint(eager=True)
    n = balanced.count()
    # cap below the planted-cluster size so the flags MUST fire
    max_cluster = int(sys.argv[3]) if len(sys.argv) > 3 else 5_000

    rows = []
    for corpus_name, corpus in (("balanced", balanced), ("skewed", skewed)):
        t0 = time.time()
        sd = run_semdedup(corpus, max_cluster)
        sd_wall = time.time() - t0
        t0 = time.time()
        mt = run_mining(corpus, max_cluster)
        mt_wall = time.time() - t0
        rows.append((corpus_name, sd, sd_wall, mt, mt_wall))
        print(
            f"{corpus_name}: semdedup {sd_wall:.1f}s {sd} |"
            f" mining {mt_wall:.1f}s {mt}",
            file=sys.stderr,
        )

    print(
        f"\n<!-- skew_cluster_check mult={mult} frac={frac}"
        f" rows={n} max_cluster={max_cluster} -->"
    )
    print(
        "| corpus | semdedup wall (s) | max cluster | overflow rows |"
        " kept | mining wall (s) | triplets | truncated triplets |"
        " truncated clusters (members) |"
    )
    print("|---|---|---|---|---|---|---|---|---|")
    for name, sd, sdw, mt, mtw in rows:
        print(
            f"| {name} ({n} rows) | {sdw:.1f} | {sd['max_cluster_size']} |"
            f" {sd['overflow']} | {sd['kept']} | {mtw:.1f} |"
            f" {mt['n']} | {mt['truncated']} |"
            f" {mt['truncated_clusters']} ({mt['truncated_members']}) |"
        )


if __name__ == "__main__":
    main()
