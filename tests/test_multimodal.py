"""Multimodal plumbing tests: schema, batching, fan-out, stub policy."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from dotnetvectorsearch_spark.multimodal.binary_ops import (
    extract_features,
    media_stats,
    sample_frames,
)
from dotnetvectorsearch_spark.schemas import MEDIA_SCHEMA


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        Row(asset_id=1, modality="image", mime_type="image/png",
            payload=b"\x89PNG fake bytes 1", meta={"w": "64"}),
        Row(asset_id=2, modality="image", mime_type="image/png",
            payload=b"\x89PNG fake bytes 22", meta={}),
        Row(asset_id=3, modality="video", mime_type="video/mp4",
            payload=b"\x00\x00ftypmp4 fake" * 20, meta={}),
        Row(asset_id=4, modality="audio", mime_type="audio/wav",
            payload=b"RIFF fake wav", meta=None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_schema_and_determinism(spark, media):
    out = extract_features(media, feat_dim=16)
    rows = {r.asset_id: r for r in out.collect()}
    assert set(out.columns) == {"asset_id", "modality", "width", "height",
                                "n_frames", "feature"}
    assert len(rows) == 4
    assert len(rows[1].feature) == 16
    n = math.sqrt(sum(x * x for x in rows[1].feature))
    assert n == pytest.approx(1.0, abs=1e-5)
    again = {r.asset_id: r for r in extract_features(media, 16).collect()}
    assert list(again[1].feature) == list(rows[1].feature)
    assert rows[1].n_frames == 1          # image -> single frame


def test_sample_frames_video_only_fanout(spark, media):
    frames = sample_frames(media, every_nth=30).collect()
    assert frames, "video should produce at least one sampled frame"
    assert {r.asset_id for r in frames} == {3}
    idxs = [r.frame_idx for r in frames]
    assert idxs == sorted(idxs)
    assert all(i % 30 == 0 for i in idxs)


def test_stub_raise_marks_integration_point(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        extract_features(media, decode_stub="raise").collect()


def test_media_stats_no_python(spark, media):
    stats = {(r.modality, r.mime_type): r.n_assets
             for r in media_stats(media).collect()}
    assert stats[("image", "image/png")] == 2
    plan = media_stats(media)._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" not in plan.lower()


def test_resize_media_images_only(spark, media):
    from dotnetvectorsearch_spark.multimodal.binary_ops import resize_media
    out = resize_media(media, target_width=224, target_height=224)
    rows = {r.asset_id: r for r in out.collect()}
    assert set(rows) == {r.asset_id for r in media.collect()}
    expected_len = (224 * 224) // 1024
    for r in rows.values():
        if r.modality == "image":
            assert (r.width, r.height) == (224, 224)
            assert len(r.payload) == expected_len
        else:
            # non-image rows pass through untouched
            assert r.width is None and r.height is None
    # deterministic: same input -> identical resized bytes
    again = {r.asset_id: bytes(r.payload) for r in
             resize_media(media, 224, 224).collect() if r.modality == "image"}
    for aid, payload in again.items():
        assert bytes(rows[aid].payload) == payload


def test_resize_media_raise_stub(spark, media):
    from dotnetvectorsearch_spark.multimodal.binary_ops import resize_media
    with pytest.raises(Exception, match="integration point"):
        resize_media(media, decode_stub="raise").collect()


def test_media_from_files_maps_binary_scan_into_media_schema(
        spark, tmp_path):
    from dotnetvectorsearch_spark.multimodal.binary_ops import (
        media_from_files, media_stats)
    (tmp_path / "a.png").write_bytes(b"\x89PNG fake")
    (tmp_path / "b.wav").write_bytes(b"RIFF fake audio")
    (tmp_path / "c.unknownext").write_bytes(b"??")
    media = media_from_files(spark, str(tmp_path))
    rows = {bytes(r.payload): r for r in media.collect()}
    assert len(rows) == 3
    png = rows[b"\x89PNG fake"]
    assert (png.modality, png.mime_type) == ("image", "image/png")
    assert png.meta["path"].endswith("a.png")
    assert png.meta["bytes"] == "9"
    wav = rows[b"RIFF fake audio"]
    assert (wav.modality, wav.mime_type) == ("audio", "audio/wav")
    other = rows[b"??"]
    assert (other.modality, other.mime_type) == (
        "binary", "application/octet-stream")
    assert len({r.asset_id for r in rows.values()}) == 3   # stable ids
    stats = {(r.modality, r.mime_type): r.n_assets
             for r in media_stats(media).collect()}
    assert stats[("image", "image/png")] == 1
