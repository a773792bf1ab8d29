"""Multimodal plumbing tests (SURVEY §2.10 X3): binary columns, typed
metadata, mapInPandas decode/feature/resize/frame-sample, quarantine,
codec gating, binary dedup."""

from __future__ import annotations

import pytest

from finance_etl_system_spark.operators.multimodal import (
    ASSET_SCHEMA,
    dedup_assets,
    extract_features,
    fake_decode,
    resize_images,
    sample_video_frames,
)


def _assets(spark):
    rows = [
        (1, "image", b"A" * 1024, ("png", 32, 32, None, None)),
        (2, "image", b"B" * 4096, ("jpeg", 64, 64, None, None)),
        (3, "image", b"A" * 1024, ("png", 32, 32, None, None)),  # dup of 1
        (4, "audio", b"C" * 2048, ("wav", None, None, 3000, 16000)),
        (5, "video", b"D" * 8192, ("mp4", 128, 128, 3500, None)),
        (6, "image", b"", ("png", 0, 0, None, None)),  # corrupt/empty
    ]
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def test_binary_dedup(spark):
    kept = dedup_assets(_assets(spark))
    ids = {r["asset_id"] for r in kept.select("asset_id").collect()}
    assert 1 in ids and 3 not in ids  # identical bytes collapse
    assert {2, 4, 5, 6} <= ids
    lengths = {r["asset_id"]: r["content_length"] for r in kept.collect()}
    assert lengths[2] == 4096


def test_codec_gating_raises_without_decoder(spark):
    with pytest.raises(NotImplementedError):
        extract_features(_assets(spark))


def test_feature_extraction_with_fake_codec(spark):
    out = extract_features(_assets(spark), decode=fake_decode).collect()
    by_id = {r["asset_id"]: r for r in out}
    assert len(by_id) == 6
    ok_rows = [r for r in out if r["ok"]]
    assert {r["asset_id"] for r in ok_rows} >= {1, 2, 4, 5}
    assert all(len(r["features"]) == 16 for r in ok_rows)
    # deterministic: same bytes → same features
    f1 = by_id[1]["features"]
    f3 = by_id[3]["features"]
    assert f1 == f3


def test_resize_plumbing(spark):
    out = resize_images(_assets(spark), target=(8, 8), decode=fake_decode).collect()
    assert {r["asset_id"] for r in out} == {1, 2, 3, 6}
    for r in out:
        assert r["width"] == 8 and r["height"] == 8
        assert len(r["content"]) == 64  # 8x8 uint8


def test_video_frame_sampling(spark):
    out = sample_video_frames(
        _assets(spark), every_ms=1000, decode=fake_decode
    ).collect()
    assert {r["asset_id"] for r in out} == {5}
    assert [r["frame_no"] for r in sorted(out, key=lambda r: r["frame_no"])] == [
        0,
        1,
        2,
        3,
    ]  # 3500ms at 1000ms stride → 4 frames
