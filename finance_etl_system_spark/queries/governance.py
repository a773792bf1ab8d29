"""Data-governance and product-analytics queries.

- ``gdpr_scrub``: right-to-be-forgotten — delete listed customers and
  pseudonymize their orders, with a verification count row. The
  compose-at-100 TB shape: the deletion list is broadcast (it is
  request-sized, never data-sized), the customer rewrite is an
  anti-join, the orders rewrite is a projection with a keyed CASE —
  no shuffle anywhere except the final audit aggregate.
- ``ab_test_analysis``: deterministic 50/50 experiment assignment by
  user-id parity with Welch's z on purchase values — integer-cent
  moments so both engines compute identical doubles.
- ``event_transitions``: first-order Markov transition matrix of
  event types per user (lead window → pair counts → row-normalized
  probabilities) — the session-flow summary product analytics runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

# deterministic "deletion request" list: customers with key % 97 == 0
ERASE_MOD = 97


def q_gdpr_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erasure verification report: after scrubbing, (a) no listed
    customer remains in the customer table, (b) every order of a
    listed customer is pseudonymized (custkey nulled, clerk masked)
    yet kept for accounting. Returns one row per table with kept /
    scrubbed counts — the audit artifact an erasure job must emit."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    erase = c.filter(F.col("c_custkey") % ERASE_MOD == 0).select(
        F.col("c_custkey").alias("k")
    )
    kept_customers = c.join(
        F.broadcast(erase), c.c_custkey == F.col("k"), "left_anti"
    )
    scrubbed_orders = o.join(
        F.broadcast(erase), o.o_custkey == F.col("k"), "left"
    ).select(
        "o_orderkey",
        F.when(F.col("k").isNotNull(), F.lit(None))
        .otherwise(F.col("o_custkey"))
        .alias("o_custkey"),
        F.col("k").isNotNull().alias("was_scrubbed"),
    )
    report_c = kept_customers.agg(
        F.lit("customer").alias("table_name"),
        F.count(F.lit(1)).alias("kept_rows"),
        F.lit(0).cast("long").alias("scrubbed_rows"),
        F.sum(
            F.when(F.col("c_custkey") % ERASE_MOD == 0, 1).otherwise(0)
        ).alias("residual_subjects"),
    )
    report_o = scrubbed_orders.agg(
        F.lit("orders").alias("table_name"),
        F.sum(F.when(~F.col("was_scrubbed"), 1).otherwise(0)).alias(
            "kept_rows"
        ),
        F.sum(F.when(F.col("was_scrubbed"), 1).otherwise(0)).alias(
            "scrubbed_rows"
        ),
        F.sum(
            F.when(
                F.col("was_scrubbed") & F.col("o_custkey").isNotNull(), 1
            ).otherwise(0)
        ).alias("residual_subjects"),
    )
    return report_c.unionAll(report_o).orderBy("table_name")


_GDPR_SCRUB_SQL = f"""
WITH erase AS (
  SELECT c_custkey AS k FROM customer WHERE c_custkey % {ERASE_MOD} = 0
),
kept_c AS (
  SELECT * FROM customer WHERE c_custkey NOT IN (SELECT k FROM erase)
),
scrub_o AS (
  SELECT o_orderkey,
         CASE WHEN e.k IS NOT NULL THEN NULL ELSE o_custkey END AS o_custkey,
         e.k IS NOT NULL AS was_scrubbed
  FROM orders o LEFT JOIN erase e ON o.o_custkey = e.k
)
SELECT * FROM (
  SELECT 'customer' AS table_name,
         COUNT(*) AS kept_rows,
         CAST(0 AS BIGINT) AS scrubbed_rows,
         CAST(SUM(CASE WHEN c_custkey % {ERASE_MOD} = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS residual_subjects
  FROM kept_c
  UNION ALL
  SELECT 'orders',
         CAST(SUM(CASE WHEN NOT was_scrubbed THEN 1 ELSE 0 END) AS BIGINT),
         CAST(SUM(CASE WHEN was_scrubbed THEN 1 ELSE 0 END) AS BIGINT),
         CAST(SUM(CASE WHEN was_scrubbed AND o_custkey IS NOT NULL
                       THEN 1 ELSE 0 END) AS BIGINT)
  FROM scrub_o
) ORDER BY table_name
"""


def q_ab_test_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic A/B readout: users assigned by id parity, Welch's
    z on purchase value. Integer-cent moments → engine-identical
    doubles; one aggregate pass per arm (actually one total — the arm
    is a group key)."""
    e = load_table(spark, sf_dir, "events")
    p = e.filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(
        F.when(F.col("user_id") % 2 == 0, "control")
        .otherwise("treatment")
        .alias("arm"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    g = p.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("sq"),
    )
    mean = F.col("s") / F.col("n") / 100.0
    var = (
        (F.col("sq") - F.col("s") * F.col("s") / F.col("n"))
        / (F.col("n") - 1)
        / 10000.0
    )
    return g.select(
        "arm",
        "n",
        F.round(mean, 4).alias("mean_value"),
        F.round(var, 4).alias("var_value"),
    ).orderBy("arm")


_AB_TEST_SQL = """
WITH p AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 'control' ELSE 'treatment' END AS arm,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
),
g AS (
  SELECT arm, COUNT(*) AS n,
         CAST(SUM(cents) AS BIGINT) AS s,
         CAST(SUM(cents * cents) AS BIGINT) AS sq
  FROM p GROUP BY arm
)
SELECT arm, n,
       ROUND(s / CAST(n AS DOUBLE) / 100.0, 4) AS mean_value,
       ROUND((sq - s * CAST(s AS DOUBLE) / n) / (n - 1) / 10000.0, 4)
         AS var_value
FROM g ORDER BY arm
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transitions: P(next event type | current),
    per-user ordered streams. One window shuffle keyed by user, one
    pair-count aggregate, probabilities row-normalized over a
    broadcast per-source total."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("src"), F.col("next_type").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("src").agg(F.sum("n").alias("src_total"))
    return (
        pairs.join(F.broadcast(totals), "src")
        .select(
            "src",
            "dst",
            "n",
            F.round(F.col("n") / F.col("src_total"), 6).alias("p"),
        )
        .orderBy("src", "dst")
    )


_EVENT_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT event_type AS src,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events
),
pairs AS (
  SELECT src, dst, COUNT(*) AS n FROM seq WHERE dst IS NOT NULL
  GROUP BY src, dst
),
tot AS (SELECT src, CAST(SUM(n) AS BIGINT) AS src_total FROM pairs GROUP BY src)
SELECT p.src, p.dst, p.n,
       ROUND(p.n / CAST(t.src_total AS DOUBLE), 6) AS p
FROM pairs p JOIN tot t ON p.src = t.src
ORDER BY p.src, p.dst
"""

def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-identification risk audit before releasing a dataset:
    k-anonymity and l-diversity per quasi-identifier class. QI =
    (nation, market segment); the sensitive attribute is the account
    balance bucketed to exact-integer bands (cents shifted
    non-negative then integer-divided, so the band is bit-identical
    on both engines — no float floor at a boundary). Emits every QI
    class with its size (k of the class), distinct sensitive values
    (l), and an at-risk flag (k < 5, the conventional disclosure
    threshold).

    Scale: ONE map-combinable groupBy over QI-cardinality keys; the
    l-diversity count_distinct expands by at most the number of bands
    per class. Output is |QI classes| rows — bounded by the QI
    domain, not the data."""
    c = load_table(spark, sf_dir, "customer")
    band = F.expr(
        "(cast(round(c_acctbal * 100, 0) as bigint) + 100000) div 200000"
    )
    return (
        c.select("c_nationkey", "c_mktsegment", band.alias("band"))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            F.countDistinct("band").alias("l_diversity"),
        )
        .withColumn("at_risk", (F.col("class_size") < 5).cast("int"))
        .orderBy("c_nationkey", "c_mktsegment")
    )


_K_ANONYMITY_SQL = """
WITH b AS (
  SELECT c_nationkey, c_mktsegment,
         (CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) + 100000) // 200000 AS band
  FROM customer
)
SELECT c_nationkey, c_mktsegment,
       COUNT(*) AS class_size,
       COUNT(DISTINCT band) AS l_diversity,
       CAST(COUNT(*) < 5 AS INT) AS at_risk
FROM b
GROUP BY c_nationkey, c_mktsegment
ORDER BY c_nationkey, c_mktsegment
"""


def q_forget_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten ACROSS DERIVED ARTIFACTS
    (operators/forget.py::forget_documents): build the four persisted
    structures a real corpus deployment keeps — a corpus parquet
    table, the inverted text index, an IVF-PQ vector index, and the
    streaming-dedup signature state — apply ONE deterministic
    deletion list (doc_id % 97 == 3, the gdpr_scrub convention), and
    return the audit frame (artifact, kind, rows_before, rows_after,
    rows_deleted).

    Rows-only: the pipeline mutates freshly-staged fixture artifacts
    (k-means-trained IVF-PQ upstream is not SQL-expressible, and an
    oracle would need its own filesystem side effects). Erasure
    accuracy — absence via every artifact's own read path, audit
    exactness, idempotent re-run, crash-window behavior — is pinned
    in tests/test_forget.py. Artifacts are rebuilt per call in a
    fresh temp dir precisely because forget MUTATES them: a cached
    fixture would make the second run report 0 deletions.

    Scale: the deletion list is request-sized (broadcast anti-joins);
    each artifact pays one scan+rewrite under staging+swap — the same
    cost its own compaction window already pays, which is where
    erasure batches ride in production."""
    import shutil
    import tempfile

    from ..operators.forget import forget_documents
    from ..operators.pq import build_ivf_pq_index
    from ..operators.textindex import build_text_index
    from ..streaming.dedup import dedup_increment_batch

    docs = load_table(spark, sf_dir, "documents")
    embs = load_table(spark, sf_dir, "embeddings")
    root = tempfile.mkdtemp(prefix="spark_graft_forget_")
    try:
        corpus = f"{root}/corpus.parquet"
        docs.write.parquet(corpus)
        ti = f"{root}/text_index"
        build_text_index(docs, ti)
        ivfpq = f"{root}/ivfpq"
        build_ivf_pq_index(
            embs, ivfpq, dim=64, k_clusters=4, m=8, k_codes=16
        )
        verd, state = f"{root}/verdicts", f"{root}/state"
        dedup_increment_batch(docs.select("doc_id", "text"), 0, verd, state)

        ids = docs.filter(F.col("doc_id") % ERASE_MOD == 3).select("doc_id")
        return forget_documents(
            spark,
            ids,
            corpus_tables={"documents": corpus},
            text_index=ti,
            ivf_pq_index=ivfpq,
            dedup_state=state,
        )
    finally:
        # the returned audit frame is createDataFrame over a driver
        # list (operators/forget.py tail) — no lazy read of these
        # artifacts survives, so the temp root can go NOW instead of
        # accumulating one dir + atexit handler per registry /
        # attestation invocation (advisor finding r9)
        shutil.rmtree(root, ignore_errors=True)


QUERIES = {
    "gdpr_scrub": q_gdpr_scrub,
    "ab_test_analysis": q_ab_test_analysis,
    "event_transitions": q_event_transitions,
    "k_anonymity": q_k_anonymity,
    "forget_audit": q_forget_audit,
}
ORACLE = {
    "gdpr_scrub": _GDPR_SCRUB_SQL,
    "ab_test_analysis": _AB_TEST_SQL,
    "event_transitions": _EVENT_TRANSITIONS_SQL,
    "k_anonymity": _K_ANONYMITY_SQL,
}
