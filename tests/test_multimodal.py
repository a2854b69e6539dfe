"""Tests for multimodal binary-column plumbing (operators/multimodal.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.operators.multimodal import (
    extract_media_features,
    fake_resize,
    real_decode,
    resize_images,
    sample_frames,
)


@pytest.fixture()
def media(spark):
    return spark.createDataFrame(
        [
            (1, b"hello world payload", "image/png", 4.9),
            (2, b"x", "image/jpeg", 0.0),
            (3, b"", "video/mp4", 10.0),
        ],
        "id long, payload binary, media_type string, duration_sec double",
    )


def test_feature_extraction_schema_and_determinism(spark, media):
    out = extract_media_features(media).orderBy("id").collect()
    assert [r.id for r in out] == [1, 2, 3]
    assert out[0].n_bytes == 19
    assert out[1].fake_width == 2  # 1 % 640 + 1
    assert out[2].n_bytes == 0 and out[2].byte_mean == 0.0
    again = extract_media_features(media).orderBy("id").collect()
    assert out == again


def test_resize_emits_exact_payload_size(spark, media):
    out = {r.id: r for r in resize_images(media, 8, 4).collect()}
    assert all(r.n_bytes_out == 32 for r in out.values())
    assert all(len(bytes(r.payload)) == 32 for r in out.values())
    assert (out[1].out_width, out[1].out_height) == (8, 4)
    # deterministic kernel
    assert fake_resize(b"hello world payload", 8, 4) == bytes(out[1].payload)


def test_sample_frames_grid_and_expansion(spark, media):
    out = sample_frames(media, every_sec=2.0).collect()
    by_id: dict[int, list] = {}
    for r in out:
        by_id.setdefault(r.id, []).append(r)
    # duration 4.9 → floor(4.9/2)+1 = 3 frames at ts 0,2,4
    assert sorted(r.frame_ts_sec for r in by_id[1]) == [0.0, 2.0, 4.0]
    # duration 0 → 1 frame
    assert len(by_id[2]) == 1
    # duration 10 → 6 frames; empty payload yields empty frames
    assert len(by_id[3]) == 6
    assert all(bytes(r.frame_payload) == b"" for r in by_id[3])


def test_sample_frames_rejects_bad_interval(spark, media):
    with pytest.raises(ValueError, match="positive"):
        sample_frames(media, every_sec=0)


def test_real_decode_is_explicit_stub():
    # PNG gained a real stdlib decoder; MP4 remains the honest stub
    with pytest.raises(NotImplementedError):
        real_decode(b"abc", "video/mp4")
