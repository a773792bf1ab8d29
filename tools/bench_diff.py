"""Round-over-round bench regression report.

Compares the last two runs in bench_history.jsonl element-wise and
flags per-query deltas beyond a noise threshold — the check a judge
(or CI) runs before trusting a headline number. Exit code 1 when any
query regressed beyond --threshold (default 1.5x, chosen above the
observed same-code neighbor-load swing).

Usage: python tools/bench_diff.py [--threshold 1.5] [--last N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument(
        "--last", type=int, default=2,
        help="compare the most recent run against the Nth-most-recent",
    )
    args = ap.parse_args()
    if args.last < 2:
        ap.error("--last must be >= 2 (2 = compare against the previous run)")

    path = os.path.join(REPO, "bench_history.jsonl")
    runs = [json.loads(line) for line in open(path) if line.strip()]
    if len(runs) < args.last:
        print(f"need >= {args.last} runs in bench_history.jsonl")
        return 0
    new, old = runs[-1], runs[-args.last]
    shared = sorted(set(new["queries"]) & set(old["queries"]))
    added = sorted(set(new["queries"]) - set(old["queries"]))
    dropped = sorted(set(old["queries"]) - set(new["queries"]))

    regressions = []
    print(f"old run: ts={old['ts']} total={old['value']}s "
          f"({len(old['queries'])} queries)")
    print(f"new run: ts={new['ts']} total={new['value']}s "
          f"({len(new['queries'])} queries)")
    for name in shared:
        a, b = old["queries"][name], new["queries"][name]
        if a > 0 and b / a > args.threshold and b - a > 0.2:
            regressions.append((name, a, b, b / a))
    if added:
        print(f"added: {', '.join(added)}")
    if dropped:
        # a query leaving the bench is the worst regression: its time
        # goes to zero and the total silently improves — hard failure
        print(f"DROPPED (investigate): {', '.join(dropped)}")
        return 1
    if regressions:
        print(f"\nregressions beyond {args.threshold}x:")
        for name, a, b, r in sorted(regressions, key=lambda t: -t[3]):
            print(f"  {name}: {a:.2f}s -> {b:.2f}s ({r:.1f}x)")
        return 1
    print("no per-query regressions beyond threshold")
    return 0


if __name__ == "__main__":
    sys.exit(main())
