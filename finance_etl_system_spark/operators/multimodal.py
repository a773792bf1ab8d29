"""Multimodal column support (SURVEY §2.10 X3).

Images/audio/video are opaque ``binary`` columns plus a typed metadata
struct — the lakehouse-standard layout (one row per asset, bytes
inline for small assets or a URI for large ones). The Spark-side
plumbing here is real and tested: schemas, Arrow-batched ``mapInPandas``
decode/feature/resize/frame-sample operators with correct batch
semantics, content-hash dedup, and corrupt-asset quarantine.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container —
each codec call sits behind ``_require_codec`` which raises
``NotImplementedError`` unless a deterministic fake decoder is
injected (tests and fixtures use the fake; production swaps in the
real library without touching the Spark plumbing).

Scale notes: every operator is mapInPandas — embarrassingly parallel,
no shuffle; bytes never pass through the driver. Dedup groups on a
sha2 of the bytes (uniform keys). Batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor memory is
bounded by batch_rows × max_asset_size.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

_FEATURE_DIM = 16


def _require_codec(codec: Callable | None, what: str) -> Callable:
    if codec is None:
        raise NotImplementedError(
            f"{what} requires a real codec (PIL/ffmpeg); none is installed "
            "in this environment — inject `fake_decode` or a library codec."
        )
    return codec


def fake_decode(content: bytes) -> np.ndarray:
    """Deterministic stand-in decoder: bytes -> pseudo-pixel array.
    Derived from the content bytes so tests get stable 'pixels'."""
    arr = np.frombuffer(content, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros((1, 1), dtype=np.float32)
    side = max(int(np.sqrt(arr.size)), 1)
    return np.resize(arr, (side, side)).astype(np.float32)


def add_content_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Real (non-stub) metadata: byte length + sha2 content hash —
    computed JVM-side, the dedup/lineage backbone."""
    return df.withColumn("content_length", F.length(F.col(content_col))).withColumn(
        "content_sha", F.sha2(F.col(content_col), 256)
    )


def dedup_assets(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Exact binary dedup: lowest asset_id survives per content hash."""
    hashed = add_content_metadata(df, content_col)
    w = Window.partitionBy("content_sha").orderBy(F.col("asset_id").asc())
    return (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def extract_features(
    df: DataFrame,
    *,
    decode: Callable[[bytes], np.ndarray] | None = None,
    feature_dim: int = _FEATURE_DIM,
) -> DataFrame:
    """Decode + pooled feature vector per asset via mapInPandas.

    Output schema: asset_id, modality, ok flag, features array — rows
    whose decode raises are quarantined (ok=false, null features), not
    dropped, so bad assets stay auditable.
    """
    dec = _require_codec(decode, "feature extraction")
    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("modality", T.StringType()),
            T.StructField("ok", T.BooleanType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, mods, oks, feats = [], [], [], []
            for _, row in pdf.iterrows():
                ids.append(row["asset_id"])
                mods.append(row["modality"])
                try:
                    px = dec(bytes(row["content"]))
                    pooled = np.resize(px.mean(axis=0), feature_dim)
                    oks.append(True)
                    feats.append([float(x) for x in pooled])
                except Exception:  # noqa: BLE001 — quarantine, don't fail the job
                    oks.append(False)
                    feats.append(None)
            yield pd.DataFrame(
                {"asset_id": ids, "modality": mods, "ok": oks, "features": feats}
            )

    return df.mapInPandas(run, schema=out_schema)


def resize_images(
    df: DataFrame,
    *,
    target: tuple[int, int] = (32, 32),
    decode: Callable[[bytes], np.ndarray] | None = None,
) -> DataFrame:
    """Image resize: decode -> nearest-neighbor resample -> re-encode
    as raw bytes. Codec-gated; plumbing (schema, batching) is real."""
    dec = _require_codec(decode, "image resize")
    th, tw = target
    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"asset_id": [], "content": [], "width": [], "height": []}
            for _, row in pdf.iterrows():
                px = dec(bytes(row["content"]))
                ry = np.linspace(0, px.shape[0] - 1, th).astype(int)
                rx = np.linspace(0, px.shape[1] - 1, tw).astype(int)
                resized = px[np.ix_(ry, rx)]
                rows["asset_id"].append(row["asset_id"])
                rows["content"].append(resized.astype(np.uint8).tobytes())
                rows["width"].append(tw)
                rows["height"].append(th)
            yield pd.DataFrame(rows)

    return df.filter(F.col("modality") == "image").mapInPandas(run, schema=out_schema)


def sample_video_frames(
    df: DataFrame,
    *,
    every_ms: int = 1000,
    decode: Callable[[bytes], np.ndarray] | None = None,
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (row
    explosion inside mapInPandas — the shape a real ffmpeg pipe has)."""
    dec = _require_codec(decode, "video frame sampling")
    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("ts_ms", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"asset_id": [], "frame_no": [], "ts_ms": [], "frame": []}
            for _, row in pdf.iterrows():
                duration = int(row["meta"]["duration_ms"] or 0)
                px = dec(bytes(row["content"]))
                for i, ts in enumerate(range(0, max(duration, 1), every_ms)):
                    frame = np.roll(px, i, axis=0)  # fake per-frame variation
                    rows["asset_id"].append(row["asset_id"])
                    rows["frame_no"].append(i)
                    rows["ts_ms"].append(ts)
                    rows["frame"].append(frame.astype(np.uint8).tobytes())
            yield pd.DataFrame(rows)

    return df.filter(F.col("modality") == "video").mapInPandas(run, schema=out_schema)
