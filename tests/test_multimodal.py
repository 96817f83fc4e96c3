"""Multimodal plumbing: binary columns, mapInPandas batch shape, stubbed
decode kernels (deterministic fake), frame-sample plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ndap_data_validator_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    return M.synthetic_media(spark, n=30).cache()


def test_media_schema(media):
    assert dict(media.dtypes)["content"] == "binary"
    assert media.count() == 30


def test_extract_features_shape_and_determinism(media):
    out = M.extract_features(media, fake=True)
    rows = out.collect()
    assert len(rows) == 30
    assert all(len(r["features"]) == M.FEATURE_DIM for r in rows)
    assert all(r["n_bytes"] > 0 for r in rows)
    # deterministic across runs
    again = {r["media_id"]: r["features"] for r in M.extract_features(media, fake=True).collect()}
    first = {r["media_id"]: r["features"] for r in rows}
    assert first == again


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"xx")
    with pytest.raises(NotImplementedError):
        M.decode_audio(b"xx")


def test_extract_features_real_kernel_path_fails_loudly(media):
    out = M.extract_features(media, fake=False)
    with pytest.raises(Exception):  # NotImplementedError surfaces via task failure
        out.collect()


def test_frame_sample_plan(media):
    plan = M.frame_sample_plan(media, every_ms=1000)
    rows = plan.collect()
    vids = media.where(F.col("kind") == "video").collect()
    expected = sum((r["duration_ms"] - 1) // 1000 + 1 for r in vids)
    assert len(rows) == expected
    assert all(r["frame_ts_ms"] % 1000 == 0 for r in rows)
