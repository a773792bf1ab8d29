"""Per-query optimization profiler (round 13, guide §1).

For each requested headline query this measures, on one warmed
session, the pieces the bench total is made of:

- ``t_build``  — wall time of ``fn(spark, sf_dir)`` alone. Queries
  that do driver-side work inside the builder (k-means fits,
  percentile-edge collects, localCheckpoints) pay it here.
- ``t_action`` — wall time of the timed action on the returned frame
  (``count()`` to match bench.py; ``--noop`` switches to the noop
  sink per guide §1.4, which computes every column).
- ``jobs``/``stages``/``tasks`` — scheduler work per run, read from
  the local UI REST API; the per-job descriptions say where the jobs
  come from (builder collects vs the final action).

Usage: python tools/profile_queries.py [--top N | query ...]
       [--noop] [--runs 2] [--sf-dir /root/testdata/sf0.1]
Output: one human table + plans under plans/r13/<query>_profile.txt
(run with care: shares the host with nothing else or numbers lie).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}{path}") as r:
        return json.loads(r.read())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    import bench as benchmod
    import __spark_entry__ as entrymod
    from finance_etl_system_spark.session import get_spark

    spark = get_spark("profile")
    qs = entrymod.queries()

    names = args.queries
    if args.top:
        hist = [json.loads(l) for l in open(os.path.join(REPO, "bench_history.jsonl"))]
        wm: dict[str, float] = {}
        for r in hist[-5:]:
            for k, v in r["queries"].items():
                wm[k] = min(wm.get(k, 1e9), v)
        names = [k for k, _ in sorted(wm.items(), key=lambda kv: -kv[1])
                 if k in qs][: args.top]
    if not names:
        names = benchmod.HEADLINE
    names = [n for n in names if n in qs]

    results = []
    for name in names:
        fn = qs[name]
        # warm (same as bench): sf0.001 once, then one untimed full run
        spark.sparkContext.setJobDescription(f"warm:{name}")
        fn(spark, "/root/testdata/sf0.001").count()
        best = None
        for i in range(args.runs):
            j0 = len(_rest(spark, "/jobs"))
            spark.sparkContext.setJobDescription(f"build:{name}")
            t0 = time.time()
            df = fn(spark, args.sf_dir)
            t1 = time.time()
            j_build = len(_rest(spark, "/jobs")) - j0
            spark.sparkContext.setJobDescription(f"action:{name}")
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            t2 = time.time()
            jobs = _rest(spark, "/jobs")
            j_all = len(jobs) - j0
            rec = {
                "query": name, "t_build": round(t1 - t0, 3),
                "t_action": round(t2 - t1, 3),
                "t_total": round(t2 - t0, 3),
                "jobs_build": j_build, "jobs_action": j_all - j_build,
                "stages": sum(j.get("numCompletedStages", 0) +
                              j.get("numSkippedStages", 0)
                              for j in jobs[: j_all]),
                "tasks": sum(j.get("numTasks", 0) for j in jobs[: j_all]),
            }
            if best is None or rec["t_total"] < best["t_total"]:
                best = rec
        spark.sparkContext.setJobDescription(None)
        results.append(best)
        print(f"{best['t_total']:7.3f}s  build {best['t_build']:6.3f} "
              f"({best['jobs_build']:2d} jobs)  action {best['t_action']:6.3f} "
              f"({best['jobs_action']:2d} jobs)  "
              f"stages {best['stages']:3d} tasks {best['tasks']:4d}  {name}",
              flush=True)

    print(json.dumps({"event": "profile", "noop": args.noop,
                      "results": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
