"""Zipf/hot-key skew rehearsal (r13, guide §2.5; verdict r12 "next
round" #4: "measure under skew — the 100× replicas are all uniform").

Every variant pair here holds DATA VOLUME constant and varies only the
key distribution, so the reported ratio is the SKEW PENALTY itself,
not data growth:

- ``events ×M``: uniform user mix vs one user holding ``HOT_PCT%`` of
  all rows (the "one user with 10⁶ events" scenario). Drives
  sessionize_events / cohort_retention_weekly / attribution_last_touch
  — user-keyed windows and aggregates, the family AQE skew handling
  CANNOT split (guide §2.5: joins only).
- ``lineitem ×M`` (orders replicated join-consistently): uniform vs
  ``HOT_PCT%`` of l_orderkey rewritten to ONE hot order key. Drives
  join_big_big's big-big shuffle join — the family AQE skew-join split
  IS the defense. The hot arm runs twice: with stock thresholds (the
  256 MB default cannot trigger on MB-scale local partitions) and with
  thresholds scaled to local volumes, capturing the FINAL adaptive
  plan to plans/r13/join_big_big_skew_aqe.txt as fired-split evidence
  (verdict asked for plan evidence, not config faith). Production
  keeps the defaults — they are sized to real 100-TB partitions.
- ``documents ×M`` (realistic word-suffix decorrelation, the
  scale_check scheme): natural corpus vs a boilerplate variant where
  ``HOT_PCT%`` of docs share ONE text — every one of them lands in the
  same LSH band bucket. dedup_minhash_lsh runs as declared (no cap)
  and as minhash_lsh_pairs(max_bucket=64) to measure what the hot-
  bucket cap buys. Also drives mixture_token_budget /
  quality_budget_take (source-keyed windows) via a hot ``source``.

Synthetic data lives under .scale_data/skew_* (git-ignored);
unmodified tables are symlinked from the base SF so every declared
query runs unchanged against the variant directory.

Usage: python tools/skew_check.py [mult]     # default 10
Output: the markdown table SCALE.md embeds + the AQE plan file.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_SF = "/root/testdata/sf0.1"
OUT = os.path.join(REPO, ".scale_data")
HOT_PCT = 20          # hot key's share of rows, percent
DOC_HOT_PCT = 10      # boilerplate share of docs, percent
STRIDE = 10_000_000
ALL_TABLES = [
    "customer", "documents", "embeddings", "events", "lineitem",
    "nation", "orders", "part", "region", "supplier",
]

EVENT_QUERIES = [
    "sessionize_events", "cohort_retention_weekly",
    "attribution_last_touch",
]
DOC_QUERIES = ["dedup_minhash_lsh", "mixture_token_budget",
               "quality_budget_take"]

BOILERPLATE = (
    "all rights reserved this page is copyright of the site owner "
    "terms of service apply cookie policy privacy policy contact us "
    "subscribe to our newsletter for updates follow us on social media"
)


def _link_rest(tmp: str, written: set[str]) -> None:
    for t in ALL_TABLES:
        if t not in written:
            os.symlink(os.path.join(BASE_SF, f"{t}.parquet"),
                       os.path.join(tmp, f"{t}.parquet"))


def _publish(tmp: str, out_dir: str) -> str:
    os.rename(tmp, out_dir)
    return out_dir


def synth_events(spark, mult: int, hot: bool) -> str:
    """×mult events with reassigned user ids: deterministic uniform
    mix over the base user count, or the same mix with HOT_PCT% of
    rows rewritten to user 0."""
    from pyspark.sql import functions as F

    from finance_etl_system_spark.catalog import load_table

    tag = "hot" if hot else "uni"
    out_dir = os.path.join(OUT, f"skew_events_{tag}_x{mult}")
    if os.path.isdir(out_dir):
        return out_dir
    os.makedirs(OUT, exist_ok=True)
    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    base = load_table(spark, BASE_SF, "events")
    n_users = base.select("user_id").distinct().count()
    copies = None
    for i in range(mult):
        c = base.withColumn("event_id", F.col("event_id") + F.lit(i * STRIDE))
        copies = c if copies is None else copies.unionAll(c)
    uni_user = F.pmod(F.xxhash64(F.col("event_id")), F.lit(n_users))
    user = (
        F.when(F.pmod(F.xxhash64(F.col("event_id") + 17), F.lit(100))
               < F.lit(HOT_PCT), F.lit(0)).otherwise(uni_user)
        if hot else uni_user
    )
    copies.withColumn("user_id", user.cast("long")).coalesce(8).write.mode(
        "overwrite"
    ).parquet(os.path.join(tmp, "events.parquet"))
    _link_rest(tmp, {"events"})
    return _publish(tmp, out_dir)


def synth_join(spark, mult: int, hot: bool) -> str:
    """Join-consistent ×mult orders+lineitem; the hot arm rewrites
    HOT_PCT% of l_orderkey to one existing order key."""
    from pyspark.sql import functions as F

    from finance_etl_system_spark.catalog import load_table

    tag = "hot" if hot else "uni"
    out_dir = os.path.join(OUT, f"skew_join_{tag}_x{mult}")
    if os.path.isdir(out_dir):
        return out_dir
    os.makedirs(OUT, exist_ok=True)
    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    orders = load_table(spark, BASE_SF, "orders")
    li = load_table(spark, BASE_SF, "lineitem")
    hot_key = orders.filter(F.col("o_orderstatus") == "F").agg(
        F.min("o_orderkey")
    ).collect()[0][0]
    oc, lc = None, None
    for i in range(mult):
        o = orders.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * STRIDE))
        l = li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * STRIDE))
        oc = o if oc is None else oc.unionAll(o)
        lc = l if lc is None else lc.unionAll(l)
    if hot:
        lc = lc.withColumn(
            "l_orderkey",
            F.when(
                F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(100))
                < F.lit(HOT_PCT),
                F.lit(int(hot_key)),
            ).otherwise(F.col("l_orderkey")),
        )
    oc.coalesce(8).write.mode("overwrite").parquet(
        os.path.join(tmp, "orders.parquet"))
    lc.coalesce(16).write.mode("overwrite").parquet(
        os.path.join(tmp, "lineitem.parquet"))
    _link_rest(tmp, {"orders", "lineitem"})
    return _publish(tmp, out_dir)


def synth_docs(spark, mult: int, hot: bool) -> str:
    """×mult documents with per-copy word suffixes (the scale_check
    realistic scheme: within-copy shingle structure identical, zero
    cross-copy overlap). The hot arm overwrites DOC_HOT_PCT% of texts
    with ONE boilerplate string and funnels them into one source."""
    from pyspark.sql import functions as F

    from finance_etl_system_spark.catalog import load_table

    tag = "hot" if hot else "uni"
    out_dir = os.path.join(OUT, f"skew_docs_{tag}_x{mult}")
    if os.path.isdir(out_dir):
        return out_dir
    os.makedirs(OUT, exist_ok=True)
    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    base = load_table(spark, BASE_SF, "documents")
    copies = None
    for i in range(mult):
        c = base.withColumn("doc_id", F.col("doc_id") + F.lit(i * STRIDE))
        if i > 0:  # decorrelate shingles copy-by-copy
            c = c.withColumn(
                "text", F.regexp_replace("text", r"(\S+)", f"$1_{i}")
            )
        copies = c if copies is None else copies.unionAll(c)
    if hot:
        is_hot = (
            F.pmod(F.xxhash64(F.col("doc_id") + 23), F.lit(100))
            < F.lit(DOC_HOT_PCT)
        )
        copies = copies.withColumn(
            "text", F.when(is_hot, F.lit(BOILERPLATE)).otherwise(F.col("text"))
        ).withColumn(
            "source", F.when(is_hot, F.lit("boilerplate-farm")).otherwise(
                F.col("source"))
        ).withColumn(
            "n_chars",
            F.when(is_hot, F.lit(len(BOILERPLATE))).otherwise(F.col("n_chars")),
        )
    copies.coalesce(8).write.mode("overwrite").parquet(
        os.path.join(tmp, "documents.parquet"))
    _link_rest(tmp, {"documents"})
    return _publish(tmp, out_dir)


def best_of_2(fn, spark, d) -> float:
    fn(spark, d).count()  # warm
    t = float("inf")
    for _ in range(2):
        t0 = time.time()
        fn(spark, d).count()
        t = min(t, time.time() - t0)
    return t


def interleaved(fn, spark, d_a, d_b, rounds: int = 3) -> tuple[float, float]:
    """Min-per-arm over ALTERNATING timed runs. This sandbox has
    multi-minute slow spells longer than one arm's back-to-back
    trials (a sequential best-of-2 measured the SAME sig pass at
    93.9 s on one arm and 5.4 s on the other); alternating arms
    inside one loop exposes both arms to the same spells, so the
    min-per-arm ratio is spell-resistant."""
    fn(spark, d_a).count()
    fn(spark, d_b).count()
    ta = tb = float("inf")
    for _ in range(rounds):
        t0 = time.time()
        fn(spark, d_a).count()
        ta = min(ta, time.time() - t0)
        t0 = time.time()
        fn(spark, d_b).count()
        tb = min(tb, time.time() - t0)
    return ta, tb


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    import __spark_entry__ as entrymod
    from finance_etl_system_spark.session import get_spark

    spark = get_spark("skew-check")
    qs = entrymod.queries()

    rows = []

    # --- user-keyed event family (windows/aggregates; AQE can't split)
    d_uni = synth_events(spark, mult, hot=False)
    d_hot = synth_events(spark, mult, hot=True)
    for name in EVENT_QUERIES:
        tu, th = interleaved(qs[name], spark, d_uni, d_hot)
        rows.append((name, f"user 0 holds {HOT_PCT}%", tu, th))

    # --- big-big join (AQE skew-join split is the defense)
    d_uni = synth_join(spark, mult, hot=False)
    d_hot = synth_join(spark, mult, hot=True)
    tu, th = interleaved(qs["join_big_big"], spark, d_uni, d_hot)
    rows.append(("join_big_big (stock conf)",
                 f"one orderkey holds {HOT_PCT}%", tu, th))
    # fired-split evidence: thresholds scaled to LOCAL partition sizes
    # (the 256 MB default is sized for real clusters and cannot
    # trigger on MB-scale local shuffle partitions); production keeps
    # the defaults.
    lowered = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        # a ×10-local orders side still fits a broadcast, which skew
        # split does not apply to (it rewrites SMJ/SHJ only); at real
        # scale neither side broadcasts, so force the shuffle join the
        # production plan would have — both the static planner's
        # threshold and AQE's runtime one
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in lowered.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        df = qs["join_big_big"](spark, d_hot)
        t0 = time.time()
        # collect() (5-row aggregate) executes THIS df's own
        # queryExecution — count() would plan a separate query and
        # leave this plan at isFinalPlan=false
        df.collect()
        t_split = time.time() - t0
        final_plan = df._jdf.queryExecution().executedPlan().toString()
        plan_path = os.path.join(REPO, "plans", "r13",
                                 "join_big_big_skew_aqe.txt")
        with open(plan_path, "w") as fh:
            fh.write(
                f"# join_big_big on the hot-key ×{mult} variant "
                f"(one orderkey = {HOT_PCT}% of lineitem), AQE skew\n"
                f"# thresholds scaled to local partition sizes: "
                f"{lowered}\n# wall {t_split:.2f}s\n\n")
            fh.write(final_plan)
        fired = ("skewed" in final_plan) or ("isSkew=true" in final_plan)
        rows.append(("join_big_big (split fired)" if fired
                     else "join_big_big (split DID NOT fire)",
                     "local-scaled thresholds", th, t_split))
        print(f"AQE skew-split fired: {fired} -> {plan_path}")
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    # --- LSH band buckets + source-keyed budget windows
    d_uni = synth_docs(spark, mult, hot=False)
    d_hot = synth_docs(spark, mult, hot=True)
    for name in DOC_QUERIES:
        tu, th = interleaved(qs[name], spark, d_uni, d_hot)
        rows.append((name, f"{DOC_HOT_PCT}% boilerplate docs", tu, th))
    # what the hot-bucket cap buys on the same hot corpus
    from finance_etl_system_spark.catalog import load_table
    from finance_etl_system_spark.operators.dedup import minhash_lsh_pairs

    def capped(spark_, d_):
        return minhash_lsh_pairs(
            load_table(spark_, d_, "documents"),
            n=3, num_perm=32, bands=8, max_bucket=64,
        )

    # cap-vs-declared on the SAME hot corpus, interleaved (the "hot"
    # slot runs capped, the "uniform" slot runs the declared query)
    t_uncap, t_cap = interleaved(
        lambda s_, d_: (qs["dedup_minhash_lsh"](s_, d_)
                        if d_ is d_hot else capped(s_, d_hot)),
        spark, d_hot, "__capped__",
    )
    rows.append(("dedup_minhash_lsh uncapped vs max_bucket=64",
                 "same hot corpus", t_uncap, t_cap))

    # spell-proof skew signature: candidate-pair volume per arm
    from finance_etl_system_spark.operators.dedup import (
        _band_rows, minhash_signatures)

    def n_pairs(d_):
        sig = minhash_signatures(
            load_table(spark, d_, "documents")).localCheckpoint(eager=True)
        sizes = _band_rows(sig, 8, 4).groupBy("band", "bh").count()
        return int(sizes.select(
            F.sum(F.col("count") * (F.col("count") - 1) / 2)
        ).collect()[0][0])

    from pyspark.sql import functions as F
    print(f"\ncandidate band pairs ×{mult}: uniform={n_pairs(d_uni):,} "
          f"hot={n_pairs(d_hot):,} (deterministic — the skew signature "
          "wall-clock noise can't fake)")

    print(f"\n| query | skew shape (×{mult}, equal volume) | uniform (s)"
          " | hot (s) | penalty |")
    print("|---|---|---|---|---|")
    for name, shape, tu, th in rows:
        u = f"{tu:.2f}" if tu is not None else "—"
        pen = f"{th / tu:.2f}×" if tu else "—"
        print(f"| {name} | {shape} | {u} | {th:.2f} | {pen} |")


if __name__ == "__main__":
    main()
