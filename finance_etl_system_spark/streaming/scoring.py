"""Streaming model scoring: the engine-side twin of the reference's
serving path (FastAPI ``GET /predict/{symbol}`` loads a pickled model
per request, reference ml-service/prediction_api.py:107-130).

Spark-first, serving is a stream-static plan: the live feature stream
left-joins the (broadcast) model registry and applies coefficients as
COLUMN ARITHMETIC — the same score_ols math as batch (pipeline/ml.py),
no Python model object, no per-request loads. Rows whose key has no
model pass through with NULL prediction (callers route them to a
fallback, mirroring the API's 404 branch).

Scale: the registry is |groups| rows and broadcasts; the stream side
never shuffles and holds no state — throughput is bounded by the sink,
not the scorer. Model refresh requires a query
restart (or a foreachBatch re-read): the registry's file listing is
fixed at planning time — same static-side semantics as
stream_static_enrich.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .ingest import parse_kafka_records


def stream_score(
    spark: SparkSession,
    source_dir: str,
    registry_path: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    feature_cols: list[str] = ("close", "volume"),
):
    """Score a live OHLCV stream against the OLS model registry.

    Registry schema: (group_key, coefficients array<double>, intercept
    double, ...) as written by pipeline/ml.py::save_model_registry.
    Returns the started query (availableNow trigger, append sink).
    """
    models = F.broadcast(
        spark.read.parquet(registry_path).select(
            F.col("group_key").alias("symbol"), "coefficients", "intercept"
        )
    )
    raw = spark.readStream.schema("key STRING, value STRING").json(source_dir)
    feats = parse_kafka_records(raw).select(
        F.upper("ticker").alias("symbol"),
        "event_time",
        *feature_cols,
    )
    scored = feats.join(models, "symbol", "left").withColumn(
        "prediction",
        F.when(
            F.col("intercept").isNotNull(),
            F.round(
                F.col("intercept")
                + sum(
                    F.col("coefficients")[i] * F.col(c)
                    for i, c in enumerate(feature_cols)
                ),
                6,
            ),
        ),
    ).drop("coefficients", "intercept")
    return (
        scored.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
