"""End-to-end training-corpus builder: the LLM-data pipeline the
extension tiers exist for, composed into ONE DataFrame→DataFrame
function. The reference's closest analogue is the 6-stage crawl→ETL→ML
chain stitched by its scheduler (reference docker/scheduler.py:28-35);
here the chain is declarative and every stage is an operator this repo
already tests in isolation:

  1. exact dedup           (operators/dedup.exact_dedup)
  2. near-dup collapse     (minhash_lsh_pairs → connected_components,
                            keep the min-id representative per cluster)
  3. quality gate          (token count + type-token ratio)
  4. decontamination       (word-5-gram overlap vs a held-out eval set,
                            broadcast gram probe)
  5. leakage-safe split    (deterministic hash; near-dup safety comes
                            from step 2 — one representative per
                            cluster means no near-pair can straddle)
  6. sequence packing      (token-budget bins per split via the
                            distributed prefix sum in operators/packing)

Scale: stages 1-4 are the operators' documented scale shapes (hash
groupBy / LSH band join / map-side quality exprs / broadcast gram
set); the split is a pure map-side predicate; packing's only global
structure is its bucket-offset table. Nothing here collects rows to
the driver.

Deterministic end to end (fixed seeds, hash splits) but MinHash
banding is probabilistic IN DESIGN, so the driver entry is rows-only;
the pipeline invariants are pinned in tests/test_corpus.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import exact_dedup, minhash_lsh_pairs, shingles
from ..operators.graph import connected_components
from ..operators.packing import prefix_pack
from ..operators.sampling import train_test_split_by_key
from ..operators.text import tokens

NGRAM = 5
MIN_TOKENS = 8
MIN_TTR = 0.3  # type-token ratio floor (repetition gate)
JACCARD_NEAR_DUP = 0.5
PACK_BUDGET = 256  # tokens per packed bin


def build_training_corpus(
    docs: DataFrame,
    eval_docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    test_fraction: float = 0.1,
) -> DataFrame:
    """docs + held-out eval_docs → curated, split, packed corpus.

    Returns one row per surviving document:
    (doc_id, n_tokens, ttr, split, bin_id) — bin_id is per-split,
    so the packed-bin key is (split, bin_id)."""
    # 1. exact dedup on normalized content
    d = exact_dedup(docs, text_col=text_col, id_col=id_col)

    # 2. near-dup collapse: LSH pairs above the Jaccard estimate →
    #    components → drop everything but each cluster's min id
    pairs = minhash_lsh_pairs(
        d, text_col=text_col, id_col=id_col, verify_threshold=JACCARD_NEAR_DUP
    )
    comp = connected_components(pairs)  # (id, label=min of component)
    losers = comp.filter(F.col("id") != F.col("label")).select(
        F.col("id").alias(id_col)
    )
    d = d.join(losers, id_col, "left_anti")

    # 3. quality gate: enough tokens, not too repetitive
    d = (
        d.withColumn("_toks", tokens(F.col(text_col)))
        .withColumn("n_tokens", F.size("_toks").cast("long"))
        .withColumn(
            "ttr",
            F.round(
                F.size(F.array_distinct("_toks"))
                / F.greatest(F.col("n_tokens"), F.lit(1)),
                6,
            ),
        )
        .filter((F.col("n_tokens") >= MIN_TOKENS) & (F.col("ttr") >= MIN_TTR))
        .drop("_toks")  # token arrays must not ride the later shuffles
    )

    # 4. decontamination: drop docs sharing any word-5-gram with eval
    eval_grams = (
        eval_docs.select(
            F.explode(shingles(F.col(text_col), NGRAM)).alias("gram")
        )
        .distinct()
    )
    doc_grams = d.select(
        id_col, F.explode(shingles(F.col(text_col), NGRAM)).alias("gram")
    )
    contaminated = (
        doc_grams.join(F.broadcast(eval_grams), "gram")
        .select(id_col)
        .distinct()
    )
    d = d.join(contaminated, id_col, "left_anti")

    # 5. leakage-safe deterministic split (near-dup-safe via step 2)
    train, test = train_test_split_by_key(d, [id_col], test_fraction)

    # 6. pack each split into fixed token-budget bins; bin_id counts
    #    from 0 WITHIN each split — (split, bin_id) is the bin key
    def pack(split_df: DataFrame, name: str) -> DataFrame:
        packed = prefix_pack(
            split_df.select(id_col, "n_tokens", "ttr"),
            weight_col="n_tokens",
            order_col=id_col,
            tiebreak_col=id_col,
            budget=PACK_BUDGET,
        )
        return packed.withColumn("split", F.lit(name))

    out = pack(train, "train").unionByName(pack(test, "test"))
    return out.select(id_col, "n_tokens", "ttr", "split", "bin_id")
