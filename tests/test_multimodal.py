"""Multimodal plumbing: Arrow round-trip, schema stability, deterministic
stub features, JVM-side frame sampling and resize planning."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from projet_data_engineering_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    MEDIA_SCHEMA,
    N_FEATURES,
    extract_features,
    frame_sample,
    resize_plan,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        Row(media_id=1, kind="image", payload=b"\x89PNG fake bytes", mime="image/png",
            width=640, height=480, duration_ms=None),
        Row(media_id=2, kind="image", payload=b"\xff\xd8 jpeg-ish", mime="image/jpeg",
            width=4000, height=1000, duration_ms=None),
        Row(media_id=3, kind="video", payload=b"\x00\x00ftyp", mime="video/mp4",
            width=1920, height=1080, duration_ms=3500),
        Row(media_id=4, kind="audio", payload=None, mime="audio/wav",
            width=None, height=None, duration_ms=2000),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_schema_and_determinism(media):
    out = extract_features(media)
    assert out.schema == FEATURE_SCHEMA
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 4
    assert rows[1]["n_bytes"] == 15
    assert len(rows[1]["features"]) == N_FEATURES
    assert rows[4]["features"] == [0.0] * N_FEATURES  # null payload path
    again = {r["media_id"]: r for r in extract_features(media).collect()}
    assert rows[1]["features"] == again[1]["features"]


def test_frame_sample_grid(media):
    out = frame_sample(media, every_ms=1000)
    samples = sorted(r["sample_ms"] for r in out.collect())
    assert samples == [0, 1000, 2000, 3000]  # 3500ms video, 1s grid


def test_resize_plan_clamps_long_side(media):
    dims = {
        r["media_id"]: (r["target_width"], r["target_height"])
        for r in resize_plan(media, max_px=256).filter("width is not null").collect()
    }
    assert dims[1] == (256, 192)
    assert dims[2] == (256, 64)
    assert max(dims[3]) == 256
