"""The plan-lint allowlists, with their one-line justifications —
single source of truth shared by the registry smoke test (which pins
the entries anti-rot) and tools/plan_report.py (which prints them in
PLANS.md so reviewers see every exemption next to its reason,
r10 verdict item 7).

An entry here means the lint CANNOT prove the shape bounded from the
plan, but the input is bounded SEMANTICALLY; the reason must say what
bounds it. Adding an entry without a real bound is how a 100 TB
scale-killer hides — keep these short and auditable.
"""

from __future__ import annotations

# Global windows (empty partition spec) whose input is semantically
# bounded. Keys are registry query names.
GLOBAL_WINDOW_ALLOWED: dict[str, str] = {
    "pack_sequences": (
        "prefix sum over per-bucket totals — input is groupBy(_bucket)"
        " with _bucket = pmod(hash, n_buckets), so <= n_buckets rows"
    ),
    "pack_bpe": (
        "same two-phase grouped prefix sum as pack_sequences"
        " (<= n_buckets rows under the global window)"
    ),
    "curriculum_pack": (
        "pack_sequences' bucket windows plus a lag over the"
        " n_buckets-row bucket-offset frame"
    ),
    "corpus_pipeline": (
        "embeds the packing stage's bucket-bounded windows"
        " (operators/packing.py)"
    ),
    "corpus_incremental": (
        "same packing-stage bucket windows inside the incremental"
        " pipeline twin"
    ),
    "rolling_correlation": (
        "rolling stats over a per-trading-DATE aggregate — rows ="
        " distinct dates, calendar-bounded (~10^4 at decades)"
    ),
    "drift_ks_histogram": (
        "cumulative/lag windows over the <=100-row histogram bucket"
        " table (bisect edges bound it, queries/drift.py)"
    ),
    "drift_ks_refined": (
        "same <=100-row refined-bucket table as drift_ks_histogram"
    ),
    "sql_customer_segments": (
        "NTILE over the per-customer aggregate — kept as the"
        " portable-SQL showcase; the lint-clean 100x twin is"
        " sql_customer_segments_scalable (r11)"
    ),
}

# Cartesian-shaped joins (CartesianProduct / BroadcastNestedLoopJoin)
# with no side the lint can prove bounded.
CROSS_JOIN_ALLOWED: dict[str, str] = {
    "knn_bruteforce": (
        "corpus x query set: the query frame is embeddings filtered"
        " to <=5 ids — driver-k by the kNN contract, but structurally"
        " a filtered scan"
    ),
    "knn_ivf": (
        "same <=5-row filtered query set as knn_bruteforce on the"
        " probe side"
    ),
    "hybrid_search_rrf": (
        "inherits knn_bruteforce's bounded-query-set nested loop for"
        " its vector branch"
    ),
    "dedup_embedding_cosine": (
        "documented exact all-pairs ground-truth path;"
        " dedup_embedding_cosine_lsh is the scale path"
    ),
    "fuzzy_match": (
        "supplier-name self-join banded by |len(a)-len(b)| <= 2 — a"
        " dim-sized entity-resolution primitive"
    ),
}
