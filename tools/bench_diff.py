"""Round-over-round bench regression report, noise-normalized.

Single sandbox runs of the same code swing up to ~1.4-1.6x on
neighbor load (adjudicated in round-5 VERDICT.md: 57 untouched
queries inflated near-uniformly between driver runs). So this
compares ELEMENT-WISE MINIMA over run WINDOWS, not single runs: the
newest --window runs vs the --window runs before them, per-query min
within each group (a query added mid-window takes its min over the
runs that contain it). The min across several runs is the
reproducible steady-state number; comparing mins cancels the
environmental swing that a single-run diff mistakes for regression.
Residual host-speed drift between windows is divided out via the
fixed-size canary bench.py times each run (``canary_sec``).

Prints a human table plus ONE machine-readable JSON line (last line
of stdout, `"event": "bench_diff"`) for PROGRESS.jsonl. Exit 1 when a
query regressed beyond --threshold or left the bench entirely.

Usage: python tools/bench_diff.py [--threshold 1.5] [--window 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _elementwise_min(runs: list[dict]) -> dict[str, float]:
    out: dict[str, float] = {}
    for r in runs:
        for name, t in r["queries"].items():
            out[name] = min(out.get(name, float("inf")), t)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument(
        "--window", type=int, default=3,
        help="runs per comparison group (element-wise min within each)",
    )
    args = ap.parse_args()
    if args.window < 1:
        ap.error("--window must be >= 1")

    path = os.path.join(REPO, "bench_history.jsonl")
    runs = [json.loads(line) for line in open(path) if line.strip()]
    k = args.window
    if len(runs) < 2 * k:
        # degrade to the largest balanced split available
        k = max(1, len(runs) // 2)
    if len(runs) < 2:
        print("need >= 2 runs in bench_history.jsonl")
        return 0
    new_runs, old_runs = runs[-k:], runs[-2 * k:-k]
    new, old = _elementwise_min(new_runs), _elementwise_min(old_runs)
    shared = sorted(set(new) & set(old))
    added = sorted(set(new) - set(old))
    dropped = sorted(set(old) - set(new))

    # host-speed normalization (r10 verdict item 3): bench.py times
    # two fixed-size canaries each run — CPU (shuffle+agg in memory)
    # and SCAN (full-width parquet read; added r11 after the CPU
    # canary stayed flat across two same-code runs whose scan-heavy
    # queries inflated a uniform ~1.28x — sandbox noise lives in the
    # IO path). The geometric mean of the available window ratios is
    # the host norm; per-query ratios are divided by it before the
    # threshold test. Runs predating a canary key contribute nothing
    # for it; with no canaries at all, norm stays 1.0.
    def _canary_min(rs, key):
        vals = [r[key] for r in rs if key in r]
        return min(vals) if vals else None

    ratios = {}
    for key in ("canary_sec", "scan_canary_sec"):
        c_old, c_new = _canary_min(old_runs, key), _canary_min(new_runs, key)
        if c_old and c_new:
            ratios[key] = c_new / c_old
    if ratios:
        norm = 1.0
        for r in ratios.values():
            norm *= r
        norm **= 1.0 / len(ratios)
        detail = ", ".join(f"{k}={v:.3f}" for k, v in ratios.items())
        print(f"canary ratios: {detail} -> host norm {norm:.3f}")
    else:
        norm = 1.0
        print("canary: absent in one window, norm 1.0")
    c_old = _canary_min(old_runs, "canary_sec")
    c_new = _canary_min(new_runs, "canary_sec")

    print(f"old window: {len(old_runs)} runs ending ts={old_runs[-1]['ts']}, "
          f"min-total {sum(old[q] for q in shared):.2f}s on shared queries")
    print(f"new window: {len(new_runs)} runs ending ts={new_runs[-1]['ts']}, "
          f"min-total {sum(new[q] for q in shared):.2f}s on shared queries")
    # The normalized TOTAL delta, computed by the tool (verdict r12
    # what's-wrong #1: prose re-derived this with the normalization
    # inverted — multiplying by host_norm where the per-query test
    # below divides; a faster host means unchanged raw times ARE a
    # regression). One line, one formula: (new/old) ÷ host_norm.
    tot_old = sum(old[q] for q in shared)
    tot_new = sum(new[q] for q in shared)
    norm_total = (tot_new / tot_old) / norm if tot_old > 0 else 1.0
    print(f"normalized total: {(norm_total - 1) * 100:+.1f}% "
          f"(raw {tot_new / tot_old if tot_old else 1.0:.3f}x"
          f" / host norm {norm:.3f})")

    regressions = []
    for name in shared:
        a, b = old[name], new[name]
        ratio = (b / a) / norm if a > 0 else 0.0
        # the absolute floor matters as much as the ratio: zero-diff
        # same-host windows show sub-second scan queries swinging
        # 0.32→3.85 s run-to-run (bench_history r11-r12) even after
        # min-of-3 twice — below ~0.5 s of delta a ratio flag reads
        # the sandbox's IO noise floor, not a regression. Queries
        # with real weight (≥ multi-second) still flag at 1.5x.
        if a > 0 and ratio > args.threshold and b - a > 0.5:
            regressions.append((name, a, b, round(ratio, 2)))
    if added:
        print(f"added: {', '.join(added)}")
    if dropped:
        # a query leaving the bench is the worst regression: its time
        # goes to zero and the total silently improves — hard failure
        print(f"DROPPED (investigate): {', '.join(dropped)}")
    if regressions:
        print(f"regressions beyond {args.threshold}x "
              "(min-vs-min, canary-normalized):")
        for name, a, b, r in sorted(regressions, key=lambda t: -t[3]):
            print(f"  {name}: {a:.2f}s -> {b:.2f}s ({r:.1f}x)")
    else:
        print("no per-query regressions beyond threshold (min-vs-min)")

    verdict = {
        "event": "bench_diff",
        "window": k,
        "canary_old": c_old,
        "canary_new": c_new,
        "host_norm": round(norm, 3),
        "old_min_total": round(tot_old, 3),
        "new_min_total": round(tot_new, 3),
        "normalized_total_ratio": round(norm_total, 3),
        "shared": len(shared),
        "added": added,
        "dropped": dropped,
        "regressions": [
            {"query": n, "old": a, "new": b, "ratio": r}
            for n, a, b, r in regressions
        ],
        "ok": not regressions and not dropped,
    }
    print(json.dumps(verdict))
    return 0 if verdict["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
