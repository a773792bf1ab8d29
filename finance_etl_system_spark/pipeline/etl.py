"""The batch ETL pipeline (SURVEY §3.1) — the reference's flagship path
re-expressed Spark-first.

Reference shape (spark-job/etl_job.py:524-557): per-symbol driver loop
-> Mongo scan with $match watermark pushdown -> clean -> indicators ->
Mongo append + ES upsert -> watermark upsert. Its anti-patterns
(SURVEY §4): sequential per-symbol jobs, repeated count() actions,
append-mode duplicates, truncated-history windows at the watermark
boundary.

This module replaces that with:
- ONE partitioned job over all symbols (no driver loop)
- watermark state as a tiny parquet table, predicate pushed to the scan
- lookback-aware incremental recompute (windows see the history they
  need — fixes the reference's truncated SMA-200 quirk, etl_job.py:289)
- idempotent keyed overwrite via dynamic partition overwrite (the
  engine-level equivalent of ES ``es.mapping.id`` upsert,
  etl_job.py:142-143,457-459; Mongo append-mode duplication at
  etl_job.py:391 is deliberately NOT reproduced)
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .indicators import technical_indicators
from ..functions.confs import partition_overwrite

# Max indicator window — incremental recompute must re-read this many
# trailing rows per symbol so SMA-200/OBV see full history
# (reference recomputes over new rows only: the truncated-window quirk).
LOOKBACK_ROWS = 200

RAW_SCHEMA = T.StructType(
    [
        T.StructField("ticker", T.StringType()),
        T.StructField("date", T.StringType()),  # messy by contract
        T.StructField("open", T.DoubleType()),
        T.StructField("high", T.DoubleType()),
        T.StructField("low", T.DoubleType()),
        T.StructField("close", T.DoubleType()),
        T.StructField("volume", T.LongType()),
        T.StructField("timestamp", T.StringType()),  # ISO-8601 crawl time
        T.StructField("consumed_at", T.TimestampType()),
    ]
)

REQUIRED_COLUMNS = ["ticker", "date", "open", "high", "low", "close", "volume"]
NUMERIC_COLUMNS = ["open", "high", "low", "close", "volume"]


def clean_and_prepare(df: DataFrame) -> DataFrame:
    """The reference's defensive clean step (etl_job.py:200-263), exact
    semantics, one declarative pass:

    - required-column contract (etl_job.py:218-221) — fail fast
    - regex date guard + salvage: rows whose ``date`` doesn't look like
      yyyy-MM-dd get the first embedded date extracted
      (etl_job.py:224-231, crawler.py:86-91)
    - numeric casts to double + NaN scrub (etl_job.py:240-243,444-450)
    - not-null filters on numerics (etl_job.py:245-247)
    - symbol column + deterministic sha2 row key — replaces the
      reference's nondeterministic uuid() (etl_job.py:254-257)
    - dedup on (symbol, trading_date): last timestamp wins — fixes the
      reference's Mongo append duplication (etl_job.py:391)
    """
    missing = [c for c in REQUIRED_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(f"raw frame missing required columns {missing}")

    date_ok = F.col("date").rlike(r"^\d{4}-\d{2}-\d{2}$")
    salvaged = F.regexp_extract(F.col("date"), r"(\d{4}-\d{2}-\d{2})", 1)
    out = df.withColumn(
        "trading_date",
        F.to_date(
            F.when(date_ok, F.col("date")).otherwise(
                F.when(salvaged != "", salvaged)
            ),
            "yyyy-MM-dd",
        ),
    ).filter(F.col("trading_date").isNotNull())

    for c in NUMERIC_COLUMNS:
        cast = F.col(c).cast("double")
        out = out.withColumn(c, F.when(F.isnan(cast), F.lit(None)).otherwise(cast))
    for c in NUMERIC_COLUMNS:
        out = out.filter(F.col(c).isNotNull())

    out = (
        out.withColumn("symbol", F.upper("ticker"))
        .withColumn(
            # try_: a malformed crawl timestamp yields NULL event_time
            # (ANSI mode would otherwise fail the whole job on one row)
            "event_time", F.try_to_timestamp(F.col("timestamp"))
        )
        .withColumn(
            "row_key",
            F.sha2(
                F.concat_ws(
                    "§", F.col("symbol"), F.date_format("trading_date", "yyyy-MM-dd")
                ),
                256,
            ),
        )
    )

    # last-write-wins dedup per (symbol, trading_date)
    from pyspark.sql import Window

    w = Window.partitionBy("symbol", "trading_date").orderBy(
        F.col("event_time").desc_nulls_last(), F.col("row_key")
    )
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "date", "ticker", "timestamp")
    )


def compute_processed(clean: DataFrame, *, semantics: str = "reference") -> DataFrame:
    """clean -> 15 indicator columns (one window family, one shuffle)."""
    out = technical_indicators(
        clean,
        symbol_col="symbol",
        date_col="trading_date",
        close_col="close",
        volume_col="volume",
        semantics=semantics,
    )
    return out.withColumn(
        "symbol_date_key",
        F.concat_ws("_", F.col("symbol"), F.date_format("trading_date", "yyyy-MM-dd")),
    )


# --- watermark state (reference etl_watermarks, etl_job.py:99-120) ---


def read_watermarks(spark: SparkSession, state_dir: str) -> dict[str, dt.datetime]:
    """Per-symbol high-water mark; empty on first run."""
    try:
        rows = spark.read.parquet(f"{state_dir}/watermarks.parquet").collect()
    except Exception:  # noqa: BLE001 — missing state dir on first run
        return {}
    return {r["symbol"]: r["last_processed_ts"] for r in rows}


def write_watermarks(spark: SparkSession, state_dir: str, processed: DataFrame) -> None:
    """Advance each symbol's mark to max(event_time) after success
    (reference etl_job.py:494-495,550-555). Marks of symbols untouched
    by this batch are preserved (merge, not replace)."""
    new_marks = processed.groupBy("symbol").agg(
        F.max("event_time").alias("last_processed_ts")
    )
    path = f"{state_dir}/watermarks.parquet"
    try:
        old = (
            spark.read.parquet(path)
            .select("symbol", "last_processed_ts")
            .localCheckpoint(eager=True)  # about to overwrite this path
        )
        merged = (
            old.unionByName(new_marks)
            .groupBy("symbol")
            .agg(F.max("last_processed_ts").alias("last_processed_ts"))
        )
    except Exception:  # noqa: BLE001 — first run
        merged = new_marks
    merged.withColumn("updated_at", F.current_timestamp()).write.mode(
        "overwrite"
    ).parquet(path)


def write_processed_idempotent(processed: DataFrame, out_dir: str) -> None:
    """Idempotent keyed overwrite (SURVEY §4 upsert pattern).

    Dynamic partition overwrite by symbol: re-running a batch replaces
    exactly the symbol partitions it touches — replay-safe like the
    reference's ES doc-id upsert, without Mongo's append duplicates.
    """
    with partition_overwrite(processed.sparkSession, "dynamic"):
        (
            processed.repartition("symbol")
            .sortWithinPartitions("symbol", "trading_date")
            .write.mode("overwrite")
            .partitionBy("symbol")
            .parquet(out_dir)
        )


def compact_partitions(
    spark: SparkSession,
    table_dir: str,
    *,
    partition_col: str = "symbol",
    sort_cols: tuple[str, ...] = ("trading_date",),
) -> int:
    """Small-files compaction for append-mode sinks.

    Streaming foreachBatch appends one file per partition per batch —
    at 100 TB that's the classic small-files death spiral. Rewrite each
    partition as one sorted file set (sortWithinPartitions restores
    min/max pruning). Returns the file count after compaction.

    Plain-parquet caveat: the rewrite is not atomic; production runs it
    on a quiesced table or via a staging-dir swap.
    """
    import glob

    df = spark.read.parquet(table_dir).localCheckpoint(eager=True)
    (
        df.repartition(F.col(partition_col))
        .sortWithinPartitions(partition_col, *sort_cols)
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(table_dir)
    )
    return len(glob.glob(f"{table_dir}/**/*.parquet", recursive=True))


def incremental_etl(
    spark: SparkSession,
    raw: DataFrame,
    state_dir: str,
    out_dir: str,
    *,
    semantics: str = "reference",
) -> DataFrame:
    """One incremental batch over ALL symbols (no per-symbol loop).

    New rows = event_time > watermark (per symbol). For each AFFECTED
    symbol: its LOOKBACK_ROWS of history is unioned back in so window
    functions see full context, the tail is recomputed, and the
    symbol's partition is rewritten copy-on-write (old rows outside
    the recompute range preserved). Unaffected symbols — data and
    watermarks — are untouched. Replaying a fully-processed batch is a
    no-op. Returns the frame of newly (re)computed rows.

    Scale: the rewrite cost is bounded by the affected symbols'
    partitions, not the table; with a lakehouse table format this
    becomes a MERGE, but plain parquet + dynamic partition overwrite
    gives the same idempotency contract.
    """
    clean = clean_and_prepare(raw)
    marks = read_watermarks(spark, state_dir)

    if marks:
        mark_df = spark.createDataFrame(
            [(s, t) for s, t in marks.items()],
            "symbol STRING, last_processed_ts TIMESTAMP",
        )
        # event_time IS NULL (unparseable crawl timestamp) is an explicit
        # branch: such rows are always treated as new, matching first-run
        # behavior (which includes them). Without it, `null > mark` is
        # null and a watermarked symbol would silently drop bad-timestamp
        # rows that a first run accepts. They re-qualify on every run —
        # harmless, because the keyed overwrite + (symbol, trading_date)
        # dedup make reprocessing idempotent.
        new_rows = clean.join(F.broadcast(mark_df), "symbol", "left").filter(
            F.col("last_processed_ts").isNull()
            | F.col("event_time").isNull()
            | (F.col("event_time") > F.col("last_processed_ts"))
        ).drop("last_processed_ts")
    else:
        new_rows = clean

    try:
        existing = spark.read.parquet(out_dir)
    except Exception:  # noqa: BLE001 — first run, no output yet
        existing = None

    if existing is None or not marks:
        processed = compute_processed(new_rows, semantics=semantics)
        write_processed_idempotent(processed, out_dir)
        write_watermarks(spark, state_dir, processed)
        return processed

    from pyspark.sql import Window

    # restrict to affected symbols; replay of a processed batch = no-op
    affected = new_rows.select("symbol").distinct()
    if affected.isEmpty():
        return spark.createDataFrame([], existing.schema)

    affected_hist = existing.join(
        F.broadcast(affected), "symbol", "left_semi"
    ).localCheckpoint(eager=True)  # materialize before overwriting its files

    w = Window.partitionBy("symbol").orderBy(F.col("trading_date").desc())
    lookback = (
        affected_hist.select(*new_rows.columns)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= LOOKBACK_ROWS)
        .drop("_rn")
    )
    # on (symbol, date) conflict the NEW row wins
    w_pref = Window.partitionBy("symbol", "trading_date").orderBy(F.col("_prio"))
    full = (
        new_rows.withColumn("_prio", F.lit(0))
        .unionByName(lookback.withColumn("_prio", F.lit(1)))
        .withColumn("_rn", F.row_number().over(w_pref))
        .filter(F.col("_rn") == 1)
        .drop("_prio", "_rn")
    )

    processed = compute_processed(full, semantics=semantics)

    # Only genuinely NEW rows may be written: the recomputed lookback
    # rows have truncated windows (their history was clipped at the
    # lookback boundary) — their previously-correct values stay.
    new_keys = new_rows.select("symbol", "trading_date")
    processed_new = processed.join(new_keys, ["symbol", "trading_date"], "left_semi")

    # OBV is an unbounded running sum: the recomputed tail restarts at
    # the lookback boundary. Re-anchor it with the old cumulative value
    # at the last lookback row (increments past the anchor are
    # identical, so one per-symbol offset restores the true series).
    anchor = lookback.groupBy("symbol").agg(
        F.max("trading_date").alias("trading_date")
    )
    old_at_anchor = affected_hist.join(
        anchor, ["symbol", "trading_date"], "inner"
    ).select("symbol", F.col("obv").alias("_old_obv"))
    new_at_anchor = processed.join(
        anchor, ["symbol", "trading_date"], "left_semi"
    ).select("symbol", F.col("obv").alias("_new_obv"))
    offsets = old_at_anchor.join(new_at_anchor, "symbol", "inner").select(
        "symbol", (F.col("_old_obv") - F.col("_new_obv")).alias("_obv_off")
    )
    processed_new = (
        processed_new.join(F.broadcast(offsets), "symbol", "left")
        .withColumn("obv", F.col("obv") + F.coalesce("_obv_off", F.lit(0.0)))
        .drop("_obv_off")
    )

    # copy-on-write: keep old rows not rewritten, add the new tail
    keep_old = affected_hist.join(
        processed_new.select("symbol", "trading_date"),
        ["symbol", "trading_date"],
        "left_anti",
    )
    merged = keep_old.select(*processed_new.columns).unionByName(processed_new)
    write_processed_idempotent(merged, out_dir)
    write_watermarks(spark, state_dir, processed_new)
    return processed_new
