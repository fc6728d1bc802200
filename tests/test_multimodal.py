"""Multimodal plumbing tests: schemas, Arrow batch iteration, stubbed decode."""

import pytest

from dataplatform_cdc_pipeline_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    fake_feature_extractor,
    frame_sample_plan,
    real_decode,
    synthesize_assets,
)


def test_extract_features_plumbing(spark):
    assets = synthesize_assets(spark, n=32)
    feats = extract_features(assets).collect()
    assert len(feats) == 32
    for r in feats:
        assert len(r["features"]) == FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r["features"])
        assert r["n_bytes"] > 0 and len(r["content_hash"]) == 64
    # deterministic: same payload → same features
    again = extract_features(synthesize_assets(spark, n=32)).collect()
    assert sorted(r["content_hash"] for r in feats) == sorted(r["content_hash"] for r in again)


def test_payload_not_in_feature_schema(spark):
    feats = extract_features(synthesize_assets(spark, n=3))
    assert "payload" not in feats.columns  # media bytes never shuffle downstream


def test_frame_sample_plan(spark):
    assets = synthesize_assets(spark, n=9)
    plan = frame_sample_plan(assets, every_ms=1000).collect()
    by_asset = {}
    for r in plan:
        by_asset.setdefault(r["asset_id"], []).append(r["sample_ms"])
    videos = {r["asset_id"]: r["duration_ms"] for r in assets.filter("media_type = 'video'").collect()}
    assert set(by_asset) == set(videos)
    for aid, samples in by_asset.items():
        assert samples == list(range(0, videos[aid], 1000))


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        real_decode(b"bytes", "image")


def test_fake_extractor_deterministic():
    assert fake_feature_extractor(b"abc", "image") == fake_feature_extractor(b"abc", "image")
    assert fake_feature_extractor(b"abc", "image") != fake_feature_extractor(b"abd", "image")
