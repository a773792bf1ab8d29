"""Synthesize a larger scale factor from sf0.1 for the SCALING PROBE
(r14, verdict r13 #7).

At sf0.1 the 8->32-core per-query ratio medians 1.08 because fixed
per-query costs (planning, job scheduling, the Python boundary)
dominate — the SF cannot distinguish compute-bound queries from
overhead-bound ones. The sandbox holds no bigger fixture, so this tool
REPLICATES sf0.1 ``--mult`` times with per-replica key offsets (keys
stay unique, join cardinalities stay linear — no blow-up joins) into a
probe directory under /tmp. Strictly a measurement fixture: nothing in
the engine or the bench reads it; /root/testdata is untouched.

Details that keep the probe honest:
- every surrogate key is offset by ``replica * 10^ceil(log10(max+1))``
  so replicas never collide and FK relationships hold within a replica;
- document text gets a per-replica suffix token so exact/near-dup
  operators see the same duplicate-rate as the base corpus instead of
  a mult-x duplicate explosion;
- embeddings get a tiny deterministic per-replica rotation-free jitter
  (last-dim += replica * 1e-3) so semantic dedup does not collapse
  replicas onto one another;
- events keep their timestamps (time-window queries see mult-x density,
  which IS the 100-TB shape: more rows per day, same span).

Usage: python tools/make_scale_probe.py --mult 10 --out /tmp/sfprobe
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
}
DIMS = ["region", "nation"]  # copied once, never replicated


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sfprobe")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from finance_etl_system_spark.session import get_spark

    spark = get_spark("scale-probe-gen")
    os.makedirs(args.out, exist_ok=True)

    for t in DIMS:
        df = spark.read.parquet(f"{args.src}/{t}.parquet")
        df.write.mode("overwrite").parquet(f"{args.out}/{t}.parquet")
        print(f"{t}: copied {df.count()} rows")

    for t, keys in KEYS.items():
        src = spark.read.parquet(f"{args.src}/{t}.parquet")
        offs = {}
        for k in keys:
            mx = src.agg(F.max(k)).first()[0] or 0
            offs[k] = 10 ** math.ceil(math.log10(max(int(mx), 1) + 1))
        parts = []
        for i in range(args.mult):
            rep = src
            for k, off in offs.items():
                rep = rep.withColumn(
                    k, (F.col(k) + F.lit(i * off)).cast(src.schema[k].dataType)
                )
            if t == "documents" and i > 0:
                rep = rep.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" replica{i}"))
                )
            if t == "embeddings" and i > 0:
                # nudge the last element so replicas are near- but not
                # exact-duplicates (deterministic, tiny)
                rep = rep.withColumn(
                    "embedding",
                    F.expr(
                        f"transform(embedding, (x, j) -> CASE WHEN j ="
                        f" size(embedding) - 1 THEN x + float({i}e-3)"
                        f" ELSE x END)"
                    ).cast(src.schema["embedding"].dataType),
                )
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{args.out}/{t}.parquet")
        print(f"{t}: wrote {args.mult}x (offsets {offs})")
    print("done ->", args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
