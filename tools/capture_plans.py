"""Capture ``explain("formatted")`` for named headline queries into
plans/<round>/<query>_<tag>.txt (guide §1 / §7.2 — the committed
evidence for every plan-shape claim in OPTIMIZATION_r*.md).
Round dir defaults to r14; override with SPARK_GRAFT_PLANS_DIR.

Usage: python tools/capture_plans.py <tag> query [query ...]
       tag is e.g. 'before' or 'after'.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    import __spark_entry__ as entrymod
    from finance_etl_system_spark.session import get_spark

    spark = get_spark("plans")
    qs = entrymod.queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_DIR", "r14"))
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{name}: {n_ex} Exchange -> {path}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
