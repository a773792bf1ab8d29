"""Committed per-query oracle attestation (round-6 verdict #6).

The driver's CORRECTNESS sample pins the same ~50 query names every
round; the other ~150 registry queries are only covered by the local
`tools/oracle_check.py` run, whose PROGRESS.jsonl summary is one
aggregate line — a regression in an unsampled query would be
invisible in the repo diff. This tool re-runs the full per-query
checker and writes ORACLE_ATTEST.json at the repo root:

- one record per registry query, sorted by name: status
  (PASS / FAIL / ROWS-ONLY), row count, sha256 value hash of the
  normalized Spark result, wall seconds (informational), problems;
- input fingerprints: sha256 of each source parquet file, so a
  hash change traceable to changed INPUTS is distinguishable from a
  changed QUERY.

The file is committed each round; `git diff` on it is the
machine-readable regression surface for the whole registry (any
value drift flips that query's value_hash line).

Usage: python tools/oracle_attest.py [--sf /root/testdata/sf0.01]
Exit code 1 if any query FAILs.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.oracle_check import TABLES, check_query, open_oracle  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "ORACLE_ATTEST.json")


def _file_sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from finance_etl_system_spark.session import get_spark

    spark = get_spark("oracle-attest")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = open_oracle(args.sf)

    inputs = {
        t: _file_sha256(os.path.join(args.sf, f"{t}.parquet"))
        for t in TABLES
    }
    records = {}
    n_fail = 0
    for name in sorted(qs):
        rec = check_query(spark, con, qs, oracles, name, args.sf)
        if rec["status"] == "FAIL":
            n_fail += 1
        print(f"{rec['status']:9s} {name}: {rec['rows']} rows")
        records[name] = {
            "status": rec["status"],
            "rows": rec["rows"],
            "value_hash": rec["value_hash"],
            # secs deliberately excluded: timing noise would make
            # every attestation diff dirty
            **({"problems": rec["problems"]} if rec["problems"] else {}),
        }

    doc = {
        "sf": args.sf,
        "inputs_sha256": inputs,
        "n_queries": len(records),
        "n_fail": n_fail,
        "queries": records,
    }
    with open(OUT, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"\nwrote {OUT}: {len(records)} queries, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
