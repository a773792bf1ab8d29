"""Suite-tiering helper (verdict r11 #4): parse a pytest
``--durations=0`` run and report per-module wall, so the ``certify``
marker set (tests/conftest.py) can be assigned from measurements
instead of guesses.

Usage: python -m pytest tests/ -q --durations=0 > out 2>&1
       python tools/tier_report.py out [fast_budget_seconds]

Prints modules sorted by total duration with a suggested split: the
cheapest modules that fit the fast budget (default 240 s of raw test
wall — overhead brings the tier to roughly 5 min) stay unmarked; the
rest belong under ``pytestmark = pytest.mark.certify``. The split is
a SUGGESTION — certain cheap modules may still be marked certify when
they only re-verify protocol internals, and one representative per
operator family should stay fast even if moderately priced.
"""

from __future__ import annotations

import re
import sys
from collections import defaultdict

DUR = re.compile(
    r"^\s*([0-9.]+)s\s+(call|setup|teardown)\s+(tests/[^:]+)::(\S+)"
)


def main() -> None:
    path = sys.argv[1]
    budget = float(sys.argv[2]) if len(sys.argv) > 2 else 240.0
    per_mod: dict[str, float] = defaultdict(float)
    per_test: dict[str, float] = defaultdict(float)
    for line in open(path):
        m = DUR.match(line)
        if not m:
            continue
        secs, _phase, mod, test = m.groups()
        per_mod[mod] += float(secs)
        per_test[f"{mod}::{test}"] += float(secs)
    mods = sorted(per_mod.items(), key=lambda kv: kv[1])
    total = sum(per_mod.values())
    acc = 0.0
    print(f"{'module':52} {'sec':>8}  tier")
    for mod, secs in mods:
        tier = "fast" if acc + secs <= budget else "certify"
        if tier == "fast":
            acc += secs
        print(f"{mod:52} {secs:8.1f}  {tier}")
    print(f"\nsuite raw wall {total:.0f}s; fast tier raw {acc:.0f}s "
          f"(budget {budget:.0f}s)")
    print("\nslowest 25 tests:")
    for t, secs in sorted(per_test.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {secs:8.1f}s  {t}")


if __name__ == "__main__":
    main()
