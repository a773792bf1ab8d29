"""Per-method ANN recall@10 on BOTH corpus geometries.

The chooser table (SCALE.md "ANN method chooser") must quote recall
measured on the geometry the method is sensitive to: the fixture's
near-orthogonal synthetic embeddings are the LSH/PQ worst case but
rotation-INVARIANT (OPQ is a no-op in expectation there), while real
embeddings are anisotropic — OPQ's win only shows on a decaying,
non-axis-aligned spectrum. This script prints the same
operators/ann.py::recall_report table on

1. the sf embeddings table (near-orthogonal, judge's fixture), and
2. the anisotropic synthetic corpus (decaying spectrum mixed by a
   fixed orthogonal basis — the tests/test_opq.py generator at
   report scale),

so SCALE.md can cite the measured pair instead of extrapolating from
one geometry. Deterministic end to end (fixed seeds, rounded
scores). Usage:

    python tools/ann_recall_report.py [sf_dir]   # default sf0.01
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DIM = 64
N_ANISO = 2000
N_QUERIES = 5
K = 10
# rerank budget for the compressed paths: small enough (1% of the
# aniso corpus) that quantization quality — the thing OPQ moves —
# actually shows in recall instead of being hidden by the exact pass
RERANK = 20

METHODS = {
    "brute": {},
    "lsh": {"dim": DIM, "nbits": 16, "bands": 4},
    "sq8": {},
    "pq": {"dim": DIM, "rerank": RERANK},
    "pq_opq": {"dim": DIM, "opq": True, "rerank": RERANK},
    "pq_opq_np": {"dim": DIM, "opq": "np", "rerank": RERANK},
}


def aniso_corpus(spark, n: int = N_ANISO, dim: int = DIM, seed: int = 7):
    """The tests/test_opq.py anisotropic generator at report scale:
    decaying spectrum, mixed by a fixed orthogonal basis so variance
    is not axis-aligned."""
    import numpy as np

    rng = np.random.default_rng(seed)
    spectrum = 1.0 / np.arange(1, dim + 1)
    z = rng.normal(size=(n, dim)) * np.sqrt(spectrum)
    q, _ = np.linalg.qr(rng.normal(size=(dim, dim)))
    x = z @ q.T
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    ).repartition(8, "vec_id")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import functions as F

    from finance_etl_system_spark.catalog import load_table
    from finance_etl_system_spark.operators.ann import recall_report
    from finance_etl_system_spark.session import get_spark

    spark = get_spark("ann-recall-report")

    def run(title: str, corpus) -> None:
        queries = corpus.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        print(f"\n### {title}")
        print("| method | n_results | recall_avg | recall_min |")
        print("|---|---|---|---|")
        for r in recall_report(queries, corpus, METHODS, k=K).collect():
            print(
                f"| {r['method']} | {r['n_results']} |"
                f" {r['recall_avg']:.3f} | {r['recall_min']:.3f} |"
            )

    run(
        f"near-orthogonal fixture ({sf_dir})",
        load_table(spark, sf_dir, "embeddings"),
    )
    run(
        f"anisotropic synthetic (n={N_ANISO}, decaying spectrum)",
        aniso_corpus(spark),
    )


if __name__ == "__main__":
    main()
