"""Connector glue for the reference's actual stores: MongoDB source
and Elasticsearch upsert sink.

The reference reads raw ticks from Mongo with a ``$match`` watermark
pushdown (reference spark-job/etl_job.py:159-185) and upserts results
into per-symbol ES indexes keyed on the deterministic row id
(etl_job.py:140-143,454-460). The engine's default deployment maps
both to parquet (SURVEY §2.1): predicate-pushdown scans replace the
$match, and the idempotent dynamic-partition-overwrite sink plus the
persistent inverted text index replace the ES pair. This module is
the REAL-STORE glue for deployments that keep Mongo/ES: it builds the
exact reader/writer configurations the connector jars consume, as
pure functions (unit-tested without services), and applies them
behind a load-time gate — the jars
(``org.mongodb.spark:mongo-spark-connector``,
``org.elasticsearch:elasticsearch-spark-30``) ship on the cluster,
not in this repo.

Differences from the reference, on purpose:
- the $match pipeline is built as real JSON (json.dumps), not an
  f-string — the reference's hand-rolled quoting breaks on ISO
  timestamps containing ``'``-adjacent locales and on injection-shaped
  collection names;
- NaN→null scrubbing before the ES write is a single declarative
  select over all double columns (etl_job.py:440-452 loops
  withColumn per column — each adds a projection node);
- the ES doc id defaults to the engine's deterministic sha2 row key
  (P8), so replayed upserts are byte-identical — effectively-once on
  the ES side, same contract as the parquet sink.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def mongo_read_options(
    database: str,
    collection: str,
    *,
    watermark: datetime | None = None,
    watermark_field: str = "timestamp",
    read_preference: str = "primary",
) -> dict[str, str]:
    """Reader options for the Mongo Spark connector, with the
    watermark as a ``$match`` aggregation-pipeline pushdown — the
    filter runs IN MongoDB, so only post-watermark documents ever
    cross the wire (the reference's incremental-load contract,
    etl_job.py:174-183)."""
    opts = {
        "database": database,
        "collection": collection,
        "readPreference.name": read_preference,
    }
    if watermark is not None:
        # BSON extended JSON requires an ISO-8601 string WITH a zone
        # designator — a bare isoformat() of a naive datetime fails
        # BsonDocument.parse (or shifts the watermark on lenient
        # parsers). Naive watermarks are declared UTC, aware ones are
        # converted to it.
        wm = (
            watermark.replace(tzinfo=timezone.utc)
            if watermark.tzinfo is None
            else watermark.astimezone(timezone.utc)
        )
        iso = wm.isoformat().replace("+00:00", "Z")
        match = {"$match": {watermark_field: {"$gt": {"$date": iso}}}}
        opts["aggregation.pipeline"] = json.dumps([match])
    return opts


def read_mongo_history(
    spark: SparkSession,
    database: str,
    collection: str,
    *,
    watermark: datetime | None = None,
    connection_uri: str | None = None,
    fmt: str = "mongodb",
) -> DataFrame:
    """Load a collection through the Mongo Spark connector (v10+
    format name ``mongodb``). Raises a clear error when the connector
    jar is absent — this sandbox has no Mongo; the parquet path
    (catalog.load_table) is the default source."""
    opts = mongo_read_options(database, collection, watermark=watermark)
    if connection_uri is not None:
        opts["connection.uri"] = connection_uri
    try:
        return spark.read.format(fmt).options(**opts).load()
    except Exception as exc:  # noqa: BLE001 — rewrap with deploy hint
        raise RuntimeError(
            f"Mongo connector read failed (format={fmt!r}). On a real "
            "deployment add org.mongodb.spark:mongo-spark-connector to "
            "spark.jars.packages; in this environment use the parquet "
            f"source instead. Cause: {exc}"
        ) from exc


def es_write_options(
    index: str,
    *,
    id_col: str = "row_key",
    write_operation: str = "upsert",
    write_null: bool = True,
) -> dict[str, str]:
    """Writer options for elasticsearch-spark: keyed upsert into
    ``index`` with the deterministic row key as the document id
    (replay-idempotent — the reference's es.mapping.id/upsert pair,
    etl_job.py:140-143,454-460)."""
    return {
        "es.resource": index,
        "es.mapping.id": id_col,
        "es.write.operation": write_operation,
        "es.spark.dataframe.write.null": "true" if write_null else "false",
    }


def scrub_nan_to_null(df: DataFrame) -> DataFrame:
    """NaN → null for every float/double column in ONE projection
    (ES rejects NaN in numeric fields; reference etl_job.py:440-452
    does this with a per-column withColumn loop)."""
    cols = []
    for f in df.schema.fields:
        if f.dataType.typeName() in ("double", "float"):
            c = F.when(F.isnan(F.col(f.name)), F.lit(None)).otherwise(
                F.col(f.name)
            )
            cols.append(c.alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def write_es_upsert(
    df: DataFrame,
    index: str,
    *,
    id_col: str = "row_key",
    fmt: str = "org.elasticsearch.spark.sql",
) -> None:
    """Upsert a frame into Elasticsearch: scrub NaNs, key on the
    deterministic id column, write through the connector. Gated like
    read_mongo_history; the engine-native equivalent is the
    idempotent parquet sink + operators/textindex.py."""
    if id_col not in df.columns:
        raise ValueError(
            f"id column {id_col!r} not in frame (have {df.columns}); "
            "derive one with functions.row_key first"
        )
    out = scrub_nan_to_null(df)
    try:
        (
            out.write.format(fmt)
            .options(**es_write_options(index, id_col=id_col))
            .mode("append")
            .save()
        )
    except Exception as exc:  # noqa: BLE001 — rewrap with deploy hint
        raise RuntimeError(
            f"Elasticsearch connector write failed (format={fmt!r}). On "
            "a real deployment add org.elasticsearch:elasticsearch-spark "
            "to spark.jars.packages; in this environment the equivalent "
            "sinks are write_processed_idempotent + build_text_index. "
            f"Cause: {exc}"
        ) from exc
