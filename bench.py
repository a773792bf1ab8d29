"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
COMPACT JSON line: {"metric": ..., "value": N, "unit": "sec",
"sf": ..., "n_queries": ..., "slowest": {...}}. The driver captures
only a bounded tail of stdout, so the per-query timing map goes to
``bench_history.jsonl`` (one line per run) and per-query IO counters
(scan rows/bytes, shuffle write) to the ``bench_io.json`` sidecar —
the stdout line must stay well under ~500 bytes to parse.

Each query is warmed up once at sf0.001 (JVM/codegen warm, plan
compiled), then timed with an ELEMENT-WISE BEST-OF-3 at the target sf:
each query runs three count-collapsed (write-free) actions and reports
the per-query minimum, so we measure scan+compute+shuffle at steady
state, not driver materialization or neighbor-load noise (observed
same-code swings of 1.4× between single runs in this shared sandbox —
the min is the reproducible number). Raw totals per run are appended
to bench_history.jsonl for round-over-round comparability.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Queries that define the engine's headline throughput. Keep this list
# in sync with the big operator families: scan+agg, join, window,
# streaming twin, dedup, similarity, text.
HEADLINE: list[str] = [
    "pricing_summary",
    "filter_cast_project",
    "json_extract",
    "join_big_big",
    "join_broadcast_dims",
    "join_asof",
    "interval_join_events",
    "shipping_priority",
    "local_supplier_volume",
    "returned_items",
    "late_shipment_priority",
    "order_count_distribution",
    "forecast_revenue",
    "waiting_suppliers",
    "min_cost_supplier",
    "gapfill_daily",
    "embedding_centroids",
    "argmax_latest_per_group",
    "rollup",
    "technical_indicators",
    "ohlc_resample",
    "sessionize_events",
    "window_range_frame",
    "tumbling_window",
    "session_window",
    "text_stats",
    "text_tfidf",
    "quality_repetition",
    "decontaminate_ngrams",
    "pack_sequences",
    "dedup_minhash_lsh",
    "knn_bruteforce",
    "ml_linreg_monitoring",
    "recursive_bfs",
    "variant_agg",
    "hll_rollup",
    "weighted_median",
    "rolling_robust_outliers",
    "twap_daily",
    "trade_triangles",
    "join_null_safe",
    "map_functions",
    "rolling_correlation",
    "hybrid_search_rrf",
    "embedding_quantize_int8",
    "unigram_surprisal",
    "data_expectations",
    "kmeans_embeddings",
    "ml_forecast_holt",
    "search_phrase",
    "knn_sq8",
    "drift_psi",
    "snapshot_diff",
    "weighted_sample",
    "serve_latest_prediction",
    "bm25_search_analyzed",
    "drift_ks_refined",
    "accuracy_timeseries",
    "drift_psi_histogram",
    "feature_binning",
    "drift_psi_by_segment_histogram",
    "data_expectations_approx",
    "importance_rank",
    "seasonal_decompose",
    "anomaly_seasonal",
    "dedup_semantic",
    "decontaminate_fuzzy",
    "mixture_token_budget",
    "quality_budget_take",
    "k_anonymity",
    "repeated_substring_spans",
    "boilerplate_scrub",
    "mixture_temperature",
    "curriculum_pack",
    "retrieval_eval_metrics",
    "knn_opq",
    "decontaminate_spans",
    "decontaminate_scrub",
]


def _canary_sec(spark) -> float:
    """Host-speed canary (r10 verdict item 3): one FIXED-SIZE,
    IO-free shuffle+agg job timed alongside the headline set, so a
    round-over-round total diff can be normalized mechanically
    instead of re-adjudicating host noise every round (same code
    measured 48.6-63.4 s across r10 hosts). 20M rows x ~10k groups
    through whole-stage codegen and one shuffle exercises the same
    machinery the headline queries do; best-of-2 (first run warms),
    independent of SF and of any repo data."""
    import time as _t

    from pyspark.sql import functions as F

    best = float("inf")
    for _ in range(2):
        t0 = _t.time()
        (
            spark.range(0, 20_000_000, 1, 32)
            .select(
                (F.col("id") % 9973).alias("k"),
                ((F.col("id") * 2654435761) % 104729).alias("v"),
            )
            .groupBy("k")
            .agg(F.sum("v").alias("s"), F.avg("v").alias("a"),
                 F.count(F.lit(1)).alias("n"))
            .count()
        )
        best = min(best, _t.time() - t0)
    return round(best, 3)


def _scan_canary_sec(spark, sf_dir: str) -> float:
    """IO-side twin of the CPU canary: the first r11 canary stayed
    flat (0.477->0.466 s) across two same-code runs whose scan-heavy
    headline queries inflated a uniform ~1.28x — the sandbox's noise
    source is the IO/page-cache path, invisible to an in-memory job.
    This times a full-width scan of the benchmark's own lineitem
    table (xxhash64 over every column defeats pruning), best-of-2;
    tools/bench_diff.py normalizes by the geometric mean of both
    canary ratios."""
    import time as _t

    from pyspark.sql import functions as F

    best = float("inf")
    for _ in range(2):
        t0 = _t.time()
        (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .agg(F.sum(F.xxhash64("*")).alias("h"))
            .count()
        )
        best = min(best, _t.time() - t0)
    return round(best, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    import __spark_entry__ as entrymod
    from finance_etl_system_spark.session import get_spark

    spark = get_spark("bench")
    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs] or list(qs)[:5]

    from finance_etl_system_spark.plans.metrics import executed_metrics

    timings: dict[str, float] = {}
    io: dict[str, dict] = {}
    total = 0.0
    for name in names:
        fn = qs[name]
        # warm-up at the smallest sf: JVM/codegen warm, plan compiled
        fn(spark, "/root/testdata/sf0.001").count()
        # element-wise best-of-3 at the target sf: single runs swing
        # up to 1.4× on GC/JIT/neighbor noise in one shared JVM; the
        # min is the steady-state number
        dt = float("inf")
        df = None
        for _ in range(3):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.count()
            dt = min(dt, time.time() - t0)
        timings[name] = round(dt, 3)
        total += dt
        try:
            # one untimed plan execution per query: the timed count()
            # compiles its own plan, so IO counters live here
            m = executed_metrics(df, execute=True)
            io[name] = {
                "files_size": m["files_size"],
                "scan_rows": m["scan_rows"],
                "shuffle_write_bytes": m["shuffle_write_bytes"],
            }
        except Exception:  # noqa: BLE001 — metrics are best-effort
            pass

    # The driver captures a bounded (~500B) TAIL of stdout; the
    # 75-query per-query map pushed the headline line past that window
    # (BENCH_r08 "parsed": null, tail begins mid-line). The
    # driver-visible line must therefore stay compact: totals + sf +
    # count + slowest query only. The full per-query map is persisted
    # to bench_history.jsonl (appended below) and per-query IO
    # counters to bench_io.json — both committed in-repo.
    canary = _canary_sec(spark)
    scan_canary = _scan_canary_sec(spark, sf_dir)
    slowest = max(timings, key=timings.get) if timings else ""
    line = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        # fixed-size host-speed reference: divide round-over-round
        # totals by the canary ratio before reading a regression
        # (tools/bench_diff.py does this automatically)
        "canary_sec": canary,
        "scan_canary_sec": scan_canary,
        # timing policy (verdict r11 #5): every per-query number —
        # here and in bench_history.jsonl — is the MIN of 3 runs
        # inside this one invocation, so each committed BENCH_r*.json
        # is already self-normalized against single-run IO swings
        "timing": "per-query min-of-3",
        # dict-typed for parsers that expect one, but only the
        # slowest entry — the full 75-query map lives in
        # bench_history.jsonl (this line must stay < ~500 B)
        "queries": {slowest: timings.get(slowest, 0.0)},
        "full_map": "bench_history.jsonl",
    }
    try:
        io_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_io.json")
        with open(io_path, "w") as fh:
            json.dump({"sf": sf, "io": io}, fh, indent=1, sort_keys=True)
    except OSError:
        pass  # a read-only checkout must not fail the bench
    try:
        # Self-contained committed artifact (verdict r12 what's-wrong
        # #4): the stdout line carries only the slowest query (the
        # driver's ~500 B tail window), which INVITES misreading a
        # single noisy headline number as a regression. This sidecar
        # holds the latest run's FULL per-query map; commit it each
        # round next to BENCH_r*.json.
        payload = {
            "ts": round(time.time(), 1),
            "sf": sf,
            "cpus": os.environ.get("SPARK_GRAFT_CPUS", ""),
            "value": line["value"],
            "canary_sec": canary,
            "scan_canary_sec": scan_canary,
            "timing": line["timing"],
            "queries": timings,
        }
        base = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(base, "bench_full.json"), "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
        # Low-core scaling runs get their own sidecar (r14, verdict r13
        # #2): the driver benches once at full cores and once at <=8 to
        # measure scaling, and overwriting one file with whichever ran
        # last made per-query ratios un-diffable without spelunking
        # bench_history.jsonl.
        cpus_env = os.environ.get("SPARK_GRAFT_CPUS", "")
        if cpus_env.isdigit() and int(cpus_env) <= 8:
            with open(os.path.join(base,
                                   f"bench_full_c{cpus_env}.json"),
                      "w") as fh:
                json.dump(payload, fh, indent=1, sort_keys=True)
    except OSError:
        pass  # a read-only checkout must not fail the bench
    print(json.dumps(line))

    # Persist per-run history in-repo: the stdout line is compact (no
    # per-query map), so this file is the canonical per-query timing
    # record for round-over-round comparability. One JSON line per run
    # (io counters live in bench_io.json).
    try:
        hist = {
            "ts": round(time.time(), 1),
            "sf": sf,
            "cpus": os.environ.get("SPARK_GRAFT_CPUS", ""),
            "value": line["value"],
            "canary_sec": canary,
            "scan_canary_sec": scan_canary,
            "queries": timings,
        }
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_history.jsonl")
        with open(path, "a") as fh:
            fh.write(json.dumps(hist) + "\n")
    except OSError:
        pass  # a read-only checkout must not fail the bench


if __name__ == "__main__":
    main()
