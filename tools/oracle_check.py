"""Local mimic of the driver's DuckDB-oracle correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at the given sf dir, then compares:
row count, sorted column names, and an order-insensitive value
comparison (exact for non-floats, exact-after-the-query's-own-rounding
for floats — if this reports a float diff, the query's rounding policy
is broken and the driver's value hash would mismatch).

Usage: python tools/oracle_check.py [--sf /root/testdata/sf0.01] [names...]

``tools/oracle_attest.py`` wraps the same per-query checker and writes
the machine-diffable ORACLE_ATTEST.json committed each round.
"""

from __future__ import annotations

import argparse
import hashlib
import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                pass
            df[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            df[c] = s.map(_norm_cell)
        elif pd.api.types.is_float_dtype(s):
            # exact float repr — queries must already round
            df[c] = s.map(lambda v: "NULL" if pd.isna(v) else repr(float(v)))
        else:
            df[c] = s.astype(str).where(~s.isna(), "NULL")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    try:
        import numpy as np

        if isinstance(v, np.ndarray):
            return "[" + ",".join(_norm_cell(x) for x in v.tolist()) + "]"
    except ImportError:
        pass
    return str(v)


def value_hash(norm: pd.DataFrame) -> str:
    """Deterministic sha256 over a NORMALIZED frame (sorted columns,
    sorted rows, canonical cell reprs) — the committed attestation's
    regression tripwire: any value drift in any query flips this."""
    h = hashlib.sha256()
    h.update(("|".join(norm.columns) + "\n").encode())
    for row in norm.itertuples(index=False, name=None):
        h.update(("\x1f".join(map(str, row)) + "\n").encode())
    return h.hexdigest()


def open_oracle(sf: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    return con


def check_query(spark, con, qs, oracles, name: str, sf: str) -> dict:
    """Run one registry query against its oracle; returns
    {name, status (PASS|FAIL|ROWS-ONLY), rows, secs, value_hash,
    problems}. value_hash is over the SPARK result (normalized)."""
    t0 = time.time()
    rec = {"name": name, "rows": None, "value_hash": None, "problems": []}
    try:
        spark_pdf = qs[name](spark, sf).toPandas()
    except Exception as exc:  # noqa: BLE001
        rec.update(status="FAIL", problems=[f"spark error: {exc}"], secs=round(time.time() - t0, 1))
        return rec
    norm_spark = normalize(spark_pdf)
    rec["rows"] = len(spark_pdf)
    rec["value_hash"] = value_hash(norm_spark)
    if name not in oracles:
        rec.update(status="ROWS-ONLY", secs=round(time.time() - t0, 1))
        return rec
    try:
        duck_pdf = con.execute(oracles[name]).fetchdf()
    except Exception as exc:  # noqa: BLE001
        rec.update(status="FAIL", problems=[f"duckdb error: {exc}"], secs=round(time.time() - t0, 1))
        return rec

    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"schema spark={s_cols} duck={d_cols}")
    if not problems:
        a, b = norm_spark, normalize(duck_pdf)
        if not a.equals(b):
            neq = (a != b).any(axis=0)
            bad_cols = list(neq[neq].index)
            diff_idx = (a != b).any(axis=1)
            ex = diff_idx[diff_idx].index[:3].tolist()
            detail = []
            for i in ex:
                for c in bad_cols[:3]:
                    detail.append(f"row{i} {c}: {a.at[i, c]!r} vs {b.at[i, c]!r}")
            problems.append(f"values differ in {bad_cols}; e.g. {detail}")
    rec.update(
        status="FAIL" if problems else "PASS",
        problems=problems,
        secs=round(time.time() - t0, 1),
    )
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from finance_etl_system_spark.session import get_spark

    spark = get_spark("oracle-check")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = open_oracle(args.sf)

    names = args.names or list(qs)
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        rec = check_query(spark, con, qs, oracles, name, args.sf)
        if rec["status"] == "FAIL":
            print(f"FAIL  {name}: {'; '.join(rec['problems'])}")
            n_fail += 1
        elif rec["status"] == "ROWS-ONLY":
            print(f"ROWS-ONLY  {name}: {rec['rows']} rows ({rec['secs']}s)")
            n_rows_only += 1
        else:
            print(f"PASS  {name}: {rec['rows']} rows ({rec['secs']}s)")
            n_pass += 1

    print(
        f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only "
        f"of {len(names)} queries at {args.sf}"
    )
    if not args.names:
        # FULL-registry runs leave an auditable snapshot: the driver
        # samples only ~50 query names per round, so the all-registry
        # green lives here, committed with the round
        import json
        import os

        try:
            line = {
                "ts": round(time.time(), 1),
                "event": "oracle_check_full",
                "sf": args.sf,
                "pass": n_pass,
                "fail": n_fail,
                "rows_only": n_rows_only,
                "total": len(names),
            }
            path = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "PROGRESS.jsonl",
            )
            with open(path, "a") as fh:
                fh.write(json.dumps(line) + "\n")
        except OSError:
            pass
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
