"""Run the heaviest headline queries against the synthetic probe SF
(tools/make_scale_probe.py) at the CURRENT $SPARK_GRAFT_CPUS, and
append one JSON line per run to ``scale_probe.jsonl`` in the repo.

Invoke twice (SPARK_GRAFT_CPUS=32 then =8) and diff the per-query
times: at the probe scale, compute-bound queries should approach the
4x core ratio while overhead-bound ones stay flat — the distinction
sf0.1 cannot make (r14, verdict r13 #7). Timing method matches
bench.py: warm-up at sf0.001, then per-query min over --runs
count-collapsed actions.

Usage: SPARK_GRAFT_CPUS=32 python tools/scale_probe_bench.py \
           [--probe-dir /tmp/sfprobe] [--runs 2] [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# The 10 heaviest by the r13 32-core window-min plus the two strongest
# known scalers from the 8-core run (knn_opq, decontaminate_scrub).
DEFAULT_QUERIES = [
    "recursive_bfs",
    "decontaminate_fuzzy",
    "dedup_semantic",
    "kmeans_embeddings",
    "trade_triangles",
    "dedup_minhash_lsh",
    "hybrid_search_rrf",
    "drift_ks_refined",
    "waiting_suppliers",
    "local_supplier_volume",
    "knn_opq",
    "decontaminate_scrub",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--probe-dir", default="/tmp/sfprobe")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    from finance_etl_system_spark.session import get_spark

    spark = get_spark("scale-probe")
    qs = entrymod.queries()
    names = args.queries or DEFAULT_QUERIES

    timings: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"probe-warm: {name}")
        fn(spark, "/root/testdata/sf0.001").count()
        dt = float("inf")
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"probe: {name}")
            t0 = time.time()
            fn(spark, args.probe_dir).count()
            dt = min(dt, time.time() - t0)
        timings[name] = round(dt, 3)
        print(f"{name}: {timings[name]}s", flush=True)

    rec = {
        "ts": round(time.time(), 1),
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
        "probe_dir": args.probe_dir,
        "runs": args.runs,
        "queries": timings,
    }
    with open(os.path.join(REPO, "scale_probe.jsonl"), "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
