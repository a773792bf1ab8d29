"""Text-analysis queries over ``documents`` (SURVEY §2.10 X4).

Language ID, quality scoring, token counting, and fingerprinting — the
text half of a training-data pipeline, all JVM-side and oracle-checked
against DuckDB string/regex functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.frames import ranked_topk
from ..operators.text import (
    LANG_MARKERS,
    STOPWORDS_EN,
    fingerprint,
    lang_id,
    normalized,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count_bpe_ish,
    word_count,
)


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char/word/BPE-ish token counts + punctuation and stopword
    ratios, per document."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        "lang",
        F.length(t).alias("char_count"),
        word_count(t).alias("word_count"),
        token_count_bpe_ish(t).alias("token_count"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
    )


_TEXT_STATS_SQL = f"""
WITH norm AS (
  SELECT doc_id, lang, text,
         trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS ntext
  FROM documents
),
tok AS (
  SELECT *, string_split(ntext, ' ') AS toks FROM norm
)
SELECT
  doc_id,
  lang,
  length(text) AS char_count,
  len(toks) AS word_count,
  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\x0B\\f\\r]')) AS token_count,
  ROUND(CAST(length(text) - length(regexp_replace(text, '[^\\p{{L}}\\p{{N}} \\t\\n\\x0B\\f\\r]', '', 'g')) AS DOUBLE)
        / greatest(length(text), 1), 6) AS punct_ratio,
  ROUND(CAST(len(list_filter(toks, x -> list_contains({STOPWORDS_EN!r}, x))) AS DOUBLE)
        / greatest(len(toks), 1), 6) AS stopword_ratio
FROM tok
"""


def q_text_quality_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score + marker-lexicon language ID."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        "lang",
        F.round(quality_score(t), 6).alias("quality_score"),
        lang_id(t).alias("lang_pred"),
    )


def _lang_case_sql() -> str:
    # replicate lang_id's fixed iteration order and strict-> argmax
    hits_exprs = []
    for lang, markers in LANG_MARKERS.items():
        hits_exprs.append(
            f"len(list_filter(toks, x -> list_contains({markers!r}, x))) AS hits_{lang}"
        )
    hits_sql = ",\n    ".join(hits_exprs)
    # fold in declaration order: later lang wins only on strictly more hits
    fold = "'und'"
    best = "0"
    for lang in LANG_MARKERS:
        fold = f"CASE WHEN hits_{lang} > {best} THEN '{lang}' ELSE {fold} END"
        best = f"greatest(hits_{lang}, {best})"
    return hits_sql, fold


_HITS_SQL, _LANG_FOLD = _lang_case_sql()

_TEXT_QUALITY_LANG_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang, text,
         string_split(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' ') AS toks
  FROM documents
),
hits AS (
  SELECT doc_id, lang, text, toks,
    {_HITS_SQL}
  FROM tok
),
scored AS (
  SELECT *,
    CAST(length(text) AS DOUBLE) / greatest(len(toks), 1) AS mean_word_len,
    CAST(length(text) - length(regexp_replace(text, '[^\\p{{L}}\\p{{N}} \\t\\n\\x0B\\f\\r]', '', 'g')) AS DOUBLE)
      / greatest(length(text), 1) AS punct_r
  FROM hits
)
SELECT
  doc_id,
  lang,
  ROUND((
    (CASE WHEN length(text) >= 100 AND length(text) <= 20000 THEN 1.0 ELSE 0.5 END)
    + (CASE WHEN punct_r < 0.1 THEN 1.0 ELSE 0.5 END)
    + (CASE WHEN mean_word_len >= 3 AND mean_word_len <= 12 THEN 1.0 ELSE 0.5 END)
  ) / 3.0, 6) AS quality_score,
  {_LANG_FOLD} AS lang_pred
FROM scored
"""


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sha2-256 content fingerprint of the normalized text + dup count
    per fingerprint (exact-dedup prep)."""
    d = load_table(spark, sf_dir, "documents")
    fp = d.select("doc_id", fingerprint(F.col("text")).alias("fingerprint"))
    counts = fp.groupBy("fingerprint").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        fp.join(counts, "fingerprint")
        .select("doc_id", "fingerprint", "n_docs")
    )


_TEXT_FINGERPRINT_SQL = """
WITH fp AS (
  SELECT doc_id,
         sha256(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))) AS fingerprint
  FROM documents
)
SELECT f.doc_id, f.fingerprint, c.n_docs
FROM fp f
JOIN (SELECT fingerprint, COUNT(*) AS n_docs FROM fp GROUP BY fingerprint) c
  ON f.fingerprint = c.fingerprint
"""


def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 TF-IDF: top-5 terms per document by tf·ln(N/df).

    explode → two aggregations (term-in-doc counts, doc frequency) →
    window top-k. The df table is the corpus's own vocabulary and
    grows with the corpus (Heaps' law), so its join back onto tf is
    left un-hinted: dfreq leaves a groupBy("term") already
    hash-partitioned on the join key, and AQE broadcasts it only when
    it is genuinely small. The tf pass is map-side combinable.
    Ranking uses the ROUNDED score so selection is deterministic.
    """
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()
    toks = d.select(
        "doc_id",
        F.explode(F.split(normalized(F.col("text")), " ")).alias("term"),
    )
    # tf feeds BOTH the df aggregation and the score join. The
    # hoped-for ReusedExchange never fires (verified r13: 0 in the
    # plan — column-pruning differences between the two consumers
    # defeat it, as everywhere else in this sweep), so materialize
    # the (doc, term, tf) table once instead of running the
    # explode+aggregate twice (guide §3.3; same fix as
    # importance_rank's tf barrier)
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(dfreq, "term").withColumn(
        "tfidf",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("doc_id", "rnk", "term", "tf", "df", "tfidf")
    )


_TEXT_TFIDF_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' ')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         ROUND(tf.tf * ln(n.n_docs / dfreq.df), 6) AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
)
SELECT doc_id, rnk, term, tf, df, tfidf
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, term ASC
  ) AS rnk
  FROM scored
) t
WHERE rnk <= 5
"""


def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching: supplier names within Levenshtein
    distance 2 of each other (entity-resolution primitive). The
    self-join is banded by name length (|len(a)-len(b)| ≤ distance)
    so candidates are length-bucketed, not all-pairs."""
    s = load_table(spark, sf_dir, "supplier")
    a = s.select(F.col("s_suppkey").alias("key_a"), F.col("s_name").alias("name_a"))
    b = s.select(F.col("s_suppkey").alias("key_b"), F.col("s_name").alias("name_b"))
    return (
        a.join(
            b,
            (F.col("key_a") < F.col("key_b"))
            & (
                F.abs(F.length("name_a") - F.length("name_b")) <= 2
            ),
        )
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 2)
        .select("key_a", "key_b", "dist")
    )


_FUZZY_MATCH_SQL = """
SELECT a.s_suppkey AS key_a, b.s_suppkey AS key_b,
       levenshtein(a.s_name, b.s_name) AS dist
FROM supplier a
JOIN supplier b
  ON a.s_suppkey < b.s_suppkey
 AND abs(length(a.s_name) - length(b.s_name)) <= 2
WHERE levenshtein(a.s_name, b.s_name) <= 2
"""


def q_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequency table (top 25): explode the normalized
    token stream, count occurrences and document frequency.

    Scale: the exploded stream never materializes wholly — map-side
    partial aggregation collapses each task's tokens to (token, count)
    partials before the single shuffle on token. Hot tokens (stopwords)
    are exactly the well-combined keys, so skew is self-limiting;
    count-distinct on doc_id is the one true per-token state.
    """
    d = load_table(spark, sf_dir, "documents")
    from ..operators.text import tokens

    return (
        d.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
        .limit(25)
    )


_TOKEN_TOPK_SQL = """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' ')) AS token
  FROM documents
)
SELECT token,
       COUNT(*) AS n_occurrences,
       COUNT(DISTINCT doc_id) AS n_docs
FROM tok
WHERE token <> ''
GROUP BY token
ORDER BY n_occurrences DESC, token
LIMIT 25
"""


def q_heavy_hitters_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-memory scale path for token_topk: mergeable
    Misra-Gries sketch (operators/sketches.py) over the token stream.
    Rows-only driver entry — per-partition eviction order makes exact
    counts run-dependent; the MG guarantees (no false negatives above
    n/(k+1), count_lo never above truth, error ≤ n/(k+1)) are pinned
    in tests/test_sketches.py against exact ground truth."""
    from ..operators.sketches import heavy_hitters
    from ..operators.text import tokens

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokens(F.col("text"))).alias("token")).filter(
        F.col("token") != ""
    )
    return heavy_hitters(toks, "token", k=25)


def q_binary_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 binary-column manifest: documents re-ingested as opaque
    BinaryType content (the multimodal ingest shape — text stands in
    for image/audio bytes), with the real, non-stub metadata tier:
    byte length + sha2 content hash + exact-dedup canonical flag.
    All JVM-side; the hash is the dedup/lineage backbone
    (operators/multimodal.py::add_content_metadata semantics)."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    content = F.encode(F.col("text"), "UTF-8")
    w = Window.partitionBy("content_sha").orderBy("doc_id")
    return (
        d.select(
            "doc_id",
            F.length(content).alias("n_bytes"),
            F.sha2(content, 256).alias("content_sha"),
        )
        .withColumn("is_canonical", F.row_number().over(w) == 1)
        .orderBy("doc_id")
    )


_BINARY_MANIFEST_SQL = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS content_sha,
       ROW_NUMBER() OVER (PARTITION BY sha256(text) ORDER BY doc_id) = 1 AS is_canonical
FROM documents
ORDER BY doc_id
"""



_LM_LAMBDA = 0.7  # bigram weight; 1-λ backs off to the unigram model


def q_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM quality filter, bigram tier: the 20 most surprising
    documents under an interpolated bigram model trained on the corpus
    itself — P(w|v) = λ·c(vw)/c(v·) + (1−λ)·c(w)/total. One step up
    from q_unigram_surprisal toward the KenLM-style perplexity filters
    production pipelines run; the backoff makes every scored position
    finite even for bigrams seen once.

    Scale: bigram events explode once (row-local zip of the token
    array with its own shift — same trick as phrase search); the
    per-(doc, bigram) counts shuffle doc-keyed, the bigram table joins
    back on its own key (data-sized equi join), and the context /
    unigram tables — the corpus's own vocabulary, which grows with the
    corpus — join un-hinted (co-partitioned shuffle joins off their
    groupBys; AQE broadcasts when small). Ranking is on the
    6dp-rounded average with doc_id tiebreak."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = F.split(normalized(F.col("text")), " ")
    tail_len = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, tail_len),
        F.slice(toks, 2, tail_len),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bev = d.select("doc_id", F.explode(bigrams).alias("bigram"))
    # materialize the per-(doc, bigram) counts ONCE: bg, ctx and the
    # scoring join all derive from bf, and without a barrier Catalyst
    # re-runs the bigram explode for each branch (~4 corpus passes).
    # At production scale these LM count tables are persisted index
    # artifacts (built once, like operators/textindex.py's postings);
    # the checkpoint is that materialization's in-session stand-in.
    bf = (
        bev.groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("bf"))
        .localCheckpoint(eager=False)
    )
    bg = bf.groupBy("bigram").agg(F.sum("bf").alias("cb"))
    ctx = (
        bg.withColumn("w1", F.split("bigram", " ")[0])
        .groupBy("w1")
        .agg(F.sum("cb").alias("cctx"))
    )
    uni = (
        d.select(F.explode(F.split(normalized(F.col("text")), " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    total = uni.agg(F.sum("ct").alias("total"))
    lam = F.lit(_LM_LAMBDA)
    logp = F.log(
        lam * F.col("cb") / F.col("cctx")
        + (F.lit(1.0) - lam) * F.col("ct") / F.col("total")
    )
    scored = (
        bf.join(bg, "bigram")
        .withColumn("w1", F.split("bigram", " ")[0])
        .withColumn("w2", F.split("bigram", " ")[1])
        .join(ctx, "w1")
        .join(uni.withColumnRenamed("term", "w2"), "w2")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("bf").alias("n_bigrams"),
            (F.sum(F.col("bf") * logp) / F.sum("bf")).alias("alp"),
        )
    )
    key = [F.round("alp", 6).asc(), F.col("doc_id").asc()]
    return ranked_topk(scored, key, 20).select(
        "rnk",
        "doc_id",
        "n_bigrams",
        F.round("alp", 6).alias("avg_logprob"),
        F.round(F.exp(-F.col("alp")), 2).alias("ppl"),
    )


_BIGRAM_SURPRISAL_SQL = f"""
WITH docs AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' ')
           AS toks
  FROM documents
),
bev AS (
  SELECT doc_id,
         unnest(list_transform(
           list_zip(toks[1:len(toks)-1], toks[2:len(toks)]),
           p -> p[1] || ' ' || p[2])) AS bigram
  FROM docs
),
bf AS (SELECT doc_id, bigram, COUNT(*) AS bf FROM bev GROUP BY doc_id, bigram),
bg AS (SELECT bigram, SUM(bf) AS cb FROM bf GROUP BY bigram),
ctx AS (
  SELECT string_split(bigram, ' ')[1] AS w1, SUM(cb) AS cctx
  FROM bg GROUP BY 1
),
uni AS (
  SELECT unnest(toks) AS term FROM docs
),
unic AS (SELECT term, COUNT(*) AS ct FROM uni GROUP BY term),
tot AS (SELECT CAST(SUM(ct) AS DOUBLE) AS total FROM unic),
scored AS (
  SELECT bf.doc_id,
         CAST(SUM(bf.bf) AS BIGINT) AS n_bigrams,
         SUM(bf.bf * ln(CAST({_LM_LAMBDA} AS DOUBLE) * bg.cb / ctx.cctx
                        + CAST({1.0 - _LM_LAMBDA} AS DOUBLE) * unic.ct / tot.total))
           / SUM(bf.bf) AS alp
  FROM bf
  JOIN bg USING (bigram)
  JOIN ctx ON string_split(bf.bigram, ' ')[1] = ctx.w1
  JOIN unic ON string_split(bf.bigram, ' ')[2] = unic.term
  CROSS JOIN tot
  GROUP BY bf.doc_id
)
SELECT * FROM (
  SELECT ROW_NUMBER() OVER (ORDER BY ROUND(alp, 6) ASC, doc_id ASC) AS rnk,
         doc_id, n_bigrams,
         ROUND(alp, 6) AS avg_logprob,
         ROUND(exp(-alp), 2) AS ppl
  FROM scored
) WHERE rnk <= 20
"""


def q_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM quality filter: the 20 most *surprising* documents
    under the corpus's own unigram model — the cheap stand-in for the
    perplexity filters LLM data pipelines run (docs whose tokens are
    improbable under the corpus distribution are boilerplate, noise,
    or wrong-language).

    avg_logprob(d) = Σ_t tf_dt · ln(ct_t / total) / n_tokens(d), with
    ppl = exp(−avg_logprob). MLE probabilities need no smoothing here
    because every scored token is by construction in the corpus.

    Scale: same two map-combinable shuffles as TF-IDF (tf per
    (doc, term), then the unigram table joined back onto tf). The
    unigram table is the corpus's own vocabulary and grows with the
    corpus (Heaps' law), so it is NOT broadcast-hinted: both sides
    leave a groupBy on the join key, so the un-hinted join is a
    co-partitioned shuffle join, and AQE still broadcasts when the
    vocab is genuinely small. The corpus total is one scalar (safe
    broadcast). Ranking is on the 6dp-rounded average with doc_id
    tiebreak.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(normalized(F.col("text")), " ")).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # vocab-sized barrier (r13, guide §3.3): uni feeds the score join
    # AND the total; unmaterialized, each reference re-derived the
    # scan+explode+tf subtree (3 corpus passes for this one query —
    # same fix as curriculum_pack, same rationale as the bf barrier
    # in q_bigram_surprisal)
    uni = (
        tf.groupBy("term")
        .agg(F.sum("tf").alias("ct"))
        .localCheckpoint(eager=True)
    )
    total = uni.agg(F.sum("ct").alias("total"))
    scored = (
        tf.join(uni, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            (
                F.sum(F.col("tf") * F.log(F.col("ct") / F.col("total")))
                / F.sum("tf")
            ).alias("alp"),
        )
    )
    key = [F.round("alp", 6).asc(), F.col("doc_id").asc()]
    return ranked_topk(scored, key, 20).select(
        "rnk",
        "doc_id",
        "n_tokens",
        F.round("alp", 6).alias("avg_logprob"),
        F.round(F.exp(-F.col("alp")), 2).alias("ppl"),
    )


_UNIGRAM_SURPRISAL_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' ')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
uni AS (SELECT term, SUM(tf) AS ct FROM tf GROUP BY term),
tot AS (SELECT CAST(SUM(ct) AS DOUBLE) AS total FROM uni),
scored AS (
  SELECT tf.doc_id,
         CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
         SUM(tf.tf * ln(uni.ct / tot.total)) / SUM(tf.tf) AS alp
  FROM tf JOIN uni USING (term) CROSS JOIN tot
  GROUP BY tf.doc_id
)
SELECT * FROM (
  SELECT ROW_NUMBER() OVER (ORDER BY ROUND(alp, 6) ASC, doc_id ASC) AS rnk,
         doc_id, n_tokens,
         ROUND(alp, 6) AS avg_logprob,
         ROUND(exp(-alp), 2) AS ppl
  FROM scored
) WHERE rnk <= 20
"""


def q_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first BPE merge step: corpus-weighted adjacent character
    pair counts, top-20 — the inner statistic of tokenizer vocabulary
    induction (each BPE iteration merges the top pair and recounts;
    the recount is THIS query over the updated symbol sequences).

    Scale shape: pair counting runs over the WORD-FREQUENCY table,
    not the token stream — |vocab| rows instead of corpus tokens (the
    standard BPE trick), then one map-combinable pair aggregate.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(normalized(F.col("text")), " ")).alias("term")
    )
    wf = (
        toks.filter(F.length("term") >= 2)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = wf.select(
        "term",
        "freq",
        F.explode(F.sequence(F.lit(1), F.length("term") - 1)).alias("i"),
    ).select(
        F.col("term").substr(F.col("i"), F.lit(2)).alias("pair"), "freq"
    )
    agg = pairs.groupBy("pair").agg(F.sum("freq").alias("total"))
    key = [F.col("total").desc(), F.col("pair").asc()]
    return ranked_topk(agg, key, 20).select("rnk", "pair", "total")


_BPE_MERGE_PAIRS_SQL = """
WITH toks AS (
  SELECT unnest(string_split(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' ')) AS term
  FROM documents
),
wf AS (SELECT term, COUNT(*) AS freq FROM toks WHERE length(term) >= 2 GROUP BY term),
chars AS (SELECT term, freq, string_split(term, '') AS cs FROM wf),
pairs AS (
  SELECT unnest(list_transform(cs[1:len(cs)-1], (c, i) -> c || cs[i+1])) AS pair,
         freq
  FROM chars
),
agg AS (SELECT pair, CAST(SUM(freq) AS BIGINT) AS total FROM pairs GROUP BY pair)
SELECT * FROM (
  SELECT ROW_NUMBER() OVER (ORDER BY total DESC, pair ASC) AS rnk, pair, total
  FROM agg
) WHERE rnk <= 20
"""


def q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full BPE vocabulary induction: 10 merge rounds over the corpus
    word-frequency table (operators/bpe.py — one corpus scan, then
    vocab-sized pair aggregates whose per-round driver payload is ONE
    row). Rows-only: the iterative argmax loop is not one SQL query;
    the merge list is pinned by exact equality with a pure-Python
    reference trainer in tests/test_bpe.py."""
    from ..operators.bpe import bpe_train

    d = load_table(spark, sf_dir, "documents")
    model = bpe_train(d, num_merges=10, min_freq=2)
    rows = [
        (i + 1, l, r, m, f) for i, (l, r, m, f) in enumerate(model.merges)
    ]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, merged string, freq long"
    )


def q_bpe_token_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token accounting under the TRAINED tokenizer — the budget
    input every context-window / cost estimate actually needs (raw
    word counts mis-size packing the moment a real tokenizer is
    used): train 8 merges, encode the corpus (Arrow-batched replay,
    operators/bpe.py), report per-source docs, total BPE tokens, and
    chars-per-token compression. Rows-only (the trained merge list is
    not SQL-expressible); encode faithfulness is pinned in
    tests/test_bpe.py, and the integer totals make the output
    engine-deterministic."""
    from ..operators.bpe import bpe_encode, bpe_train

    d = load_table(spark, sf_dir, "documents")
    model = bpe_train(d, num_merges=8, min_freq=2)
    enc = bpe_encode(d, model)
    n_tok = F.sum(F.size("bpe_tokens")).cast("long")
    n_chars = F.sum(F.length("text")).cast("long")
    return (
        enc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            n_tok.alias("total_tokens"),
            F.round(n_chars / n_tok, 6).alias("chars_per_token"),
        )
        .orderBy("source")
    )


def q_source_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE quality scorecard — the data-vendor triage view an
    LLM pipeline uses to decide which feeds to keep: volume, size,
    lexical diversity, language mix, and the exact duplicate rate
    (1 − distinct fingerprints / docs) per source, in one pass.

    Scale: token/ttr metrics are row-local JVM expressions; the whole
    report is ONE groupBy(source) with exact integer counts (the dup
    rate uses count_distinct over the content fingerprint — the
    scorecard is |sources|-rows, so the distinct expand is bounded by
    the biggest single source, and approx_count_distinct is the
    documented swap at extreme scale)."""
    from ..operators.dedup import content_fingerprint

    d = load_table(spark, sf_dir, "documents")
    from ..operators.text import tokens as _tokens

    toks = _tokens(F.col("text"))  # THE canonical tokenizer
    n_tok = F.size(toks).cast("long")
    ttr = F.size(F.array_distinct(toks)) / F.greatest(n_tok, F.lit(1))
    base = d.select(
        "source",
        n_tok.alias("n_tok"),
        F.round(ttr, 6).alias("ttr"),
        (F.col("lang") == "en").cast("int").alias("is_en"),
        content_fingerprint(F.col("text")).alias("fp"),
    )
    return (
        base.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum("n_tok").cast("double") / F.count(F.lit(1)), 2
            ).alias("avg_tokens"),
            F.round(
                F.sum(F.round(F.col("ttr") * 1e6).cast("long")).cast("double")
                / F.count(F.lit(1))
                / 1e6,
                6,
            ).alias("avg_ttr"),
            F.round(
                F.sum("is_en").cast("double") / F.count(F.lit(1)), 6
            ).alias("en_frac"),
            F.round(
                F.lit(1.0)
                - F.countDistinct("fp").cast("double") / F.count(F.lit(1)),
                6,
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


_SOURCE_SCORECARD_SQL = """
WITH base AS (
  SELECT source,
         len(string_split(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' '))
           AS n_tok,
         ROUND(len(list_distinct(
                 string_split(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' ')))
               / CAST(greatest(len(
                 string_split(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' ')), 1)
                 AS DOUBLE), 6) AS ttr,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en,
         sha256(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))) AS fp
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(n_tok) AS DOUBLE) / COUNT(*), 2) AS avg_tokens,
       ROUND(CAST(SUM(CAST(ROUND(ttr * 1e6) AS BIGINT)) AS DOUBLE)
             / COUNT(*) / 1e6, 6) AS avg_ttr,
       ROUND(CAST(SUM(is_en) AS DOUBLE) / COUNT(*), 6) AS en_frac,
       ROUND(1.0 - COUNT(DISTINCT fp) / CAST(COUNT(*) AS DOUBLE), 6)
         AS dup_rate
FROM base
GROUP BY source
ORDER BY source
"""


def q_unigram_train_pieces(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM (SentencePiece-style, Kudo 2018) tokenizer training
    over the corpus: Viterbi-EM with count-based pruning
    (operators/unigram.py — ONE corpus scan, then vocab-sized
    broadcast rounds; driver round-trips are structurally few, unlike
    sequential BPE). Returns the trained piece table. Rows-only: the
    EM loop is not one SQL query; correctness is pinned by Viterbi
    brute-force + tier-equivalence tests in tests/test_unigram.py."""
    from ..operators.unigram import unigram_train

    d = load_table(spark, sf_dir, "documents")
    model = unigram_train(
        d, vocab_size=200, seed_size=2000, max_piece_len=6, min_freq=2
    )
    rows = [
        (i + 1, p, round(lp, 6)) for i, (p, lp) in enumerate(model.pieces)
    ]
    return spark.createDataFrame(
        rows, "rank int, piece string, logprob double"
    )


def q_unigram_token_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token accounting under the trained UNIGRAM tokenizer (the
    bpe_token_lengths twin for the second tokenizer family): per
    source, docs, total pieces, chars-per-piece compression.
    Rows-only; encode faithfulness (round-trip concatenation) is
    pinned in tests/test_unigram.py."""
    from ..operators.unigram import unigram_encode, unigram_train

    d = load_table(spark, sf_dir, "documents")
    model = unigram_train(
        d, vocab_size=200, seed_size=2000, max_piece_len=6, min_freq=2
    )
    enc = unigram_encode(d, model)
    n_tok = F.sum(F.size("unigram_tokens")).cast("long")
    n_chars = F.sum(F.length("text")).cast("long")
    return (
        enc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            n_tok.alias("total_tokens"),
            F.round(n_chars / n_tok, 6).alias("chars_per_token"),
        )
        .orderBy("source")
    )


def q_unigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity quality report: train the unigram LM,
    score every document (exact integer micro-nat ticks,
    operators/unigram.py::unigram_score), report per-source corpus
    perplexity and the worst document — the signal a perplexity
    filter thresholds on. Rows-only (trained model); the tick
    accounting is pinned by hand-computed fixtures in
    tests/test_unigram.py."""
    from ..operators.unigram import unigram_score, unigram_train

    d = load_table(spark, sf_dir, "documents")
    model = unigram_train(
        d, vocab_size=200, seed_size=2000, max_piece_len=6, min_freq=2
    )
    scored = unigram_score(d, model).filter(F.col("n_pieces") > 0)
    doc_ppl = F.exp(
        -(F.col("logprob_ticks") / F.lit(1_000_000.0))
        / F.col("n_pieces")
    )
    return (
        scored.withColumn("_ppl", doc_ppl)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_pieces").alias("total_pieces"),
            F.round(
                F.exp(
                    -(
                        F.sum("logprob_ticks") / F.lit(1_000_000.0)
                    )
                    / F.sum("n_pieces")
                ),
                4,
            ).alias("corpus_perplexity"),
            F.round(F.max("_ppl"), 4).alias("worst_doc_perplexity"),
        )
        .orderBy("source")
    )


QUERIES = {
    "source_scorecard": q_source_scorecard,
    "fuzzy_match": q_fuzzy_match,
    "unigram_surprisal": q_unigram_surprisal,
    "bigram_surprisal": q_bigram_surprisal,
    "bpe_merge_pairs": q_bpe_merge_pairs,
    "bpe_train_merges": q_bpe_train_merges,
    "bpe_token_lengths": q_bpe_token_lengths,
    "unigram_train_pieces": q_unigram_train_pieces,
    "unigram_token_lengths": q_unigram_token_lengths,
    "unigram_perplexity": q_unigram_perplexity,
    "binary_manifest": q_binary_manifest,
    "text_stats": q_text_stats,
    "text_quality_lang": q_text_quality_lang,
    "text_fingerprint": q_text_fingerprint,
    "text_tfidf": q_text_tfidf,
    "token_topk": q_token_topk,
    "heavy_hitters_sketch": q_heavy_hitters_sketch,
}

ORACLE = {
    "source_scorecard": _SOURCE_SCORECARD_SQL,
    "fuzzy_match": _FUZZY_MATCH_SQL,
    "unigram_surprisal": _UNIGRAM_SURPRISAL_SQL,
    "bigram_surprisal": _BIGRAM_SURPRISAL_SQL,
    "bpe_merge_pairs": _BPE_MERGE_PAIRS_SQL,
    "binary_manifest": _BINARY_MANIFEST_SQL,
    "text_stats": _TEXT_STATS_SQL,
    "text_quality_lang": _TEXT_QUALITY_LANG_SQL,
    "text_fingerprint": _TEXT_FINGERPRINT_SQL,
    "text_tfidf": _TEXT_TFIDF_SQL,
    "token_topk": _TOKEN_TOPK_SQL,
}
