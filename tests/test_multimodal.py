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


def test_resize_images_geometry_and_determinism(spark):
    """Aspect-preserving integer fit: no upscale, width/height-bound cases,
    null geometry falls back to the target box; payload transform is
    deterministic and media bytes stay in the map stage (image rows only)."""
    from pyspark.sql import types as T

    from dataplatform_cdc_pipeline_spark.operators.multimodal import (
        ASSET_SCHEMA,
        fake_resize,
        resize_images,
    )

    rows = [
        (1, "image", b"aa", 50, 40, None, "png"),     # fits → unchanged
        (2, "image", b"bb", 200, 50, None, "png"),    # width-bound → (96, 24)
        (3, "image", b"cc", 50, 200, None, "png"),    # height-bound → (24, 96)
        (4, "image", b"dd", None, None, None, "png"), # no geometry → target box
        (5, "video", b"ee", None, None, 5000, "h264"),  # filtered out
    ]
    df = spark.createDataFrame(rows, ASSET_SCHEMA)
    out = {r["asset_id"]: r for r in resize_images(df, 96, 96).collect()}

    assert set(out) == {1, 2, 3, 4}
    assert (out[1]["new_width"], out[1]["new_height"]) == (50, 40)
    assert (out[2]["new_width"], out[2]["new_height"]) == (96, 24)
    assert (out[3]["new_width"], out[3]["new_height"]) == (24, 96)
    assert (out[4]["new_width"], out[4]["new_height"]) == (96, 96)
    assert out[2]["payload"] == fake_resize(b"bb", 200, 50, 96, 24)
    assert len(out[2]["payload"]) == 32  # sha256 digest bytes


# ---------------------------------------------------------------------------
# codec seam contract: ANY injected decode/resize callable flows through the
# oracle-checked pipeline shape — same schema, payload never shuffled, and
# adversarial payloads (empty/truncated/None bytes) never kill the stage.
# A real codec drop-in (PIL/pyav) only has to satisfy the callable
# signature; everything Spark-side is pinned here.
# ---------------------------------------------------------------------------


def _subtree_after(plan: str, node: str) -> str:
    """Physical-plan text BELOW (deeper than) the first `node` line —
    executedPlan().toString() prints parents before children, so any
    Exchange in this slice sits upstream of the Python stage's input."""
    assert node in plan, plan
    return plan.split(node, 1)[1]


def test_injected_decode_preserves_schema_and_plan(spark):
    from dataplatform_cdc_pipeline_spark.operators.multimodal import FEATURE_SCHEMA

    def my_decode(payload, media_type):
        return [float(len(payload or b""))] * FEATURE_DIM

    assets = synthesize_assets(spark, n=32)
    feats = extract_features(assets, decode=my_decode)
    assert feats.schema == FEATURE_SCHEMA  # seam does not leak into schema
    rows = feats.collect()
    assert len(rows) == 32
    for r in rows:
        assert r["features"] == [float(r["n_bytes"])] * FEATURE_DIM

    # media bytes must reach the Python stage WITHOUT an upstream shuffle,
    # even when a downstream agg adds exchanges above it
    downstream = feats.groupBy("media_type").count()
    plan = downstream._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in _subtree_after(plan, "MapInPandas")


def test_injected_resize_preserves_schema_and_plan(spark):
    from dataplatform_cdc_pipeline_spark.operators.multimodal import resize_images

    def my_resize(payload, w, h, tw, th):
        return bytes([tw % 256, th % 256])

    assets = synthesize_assets(spark, n=32)
    out = resize_images(assets, 32, 32, resize=my_resize)
    got = out.collect()
    assert got and all(r["payload"] == bytes([r["new_width"] % 256, r["new_height"] % 256]) for r in got)
    plan = out.groupBy("new_width").count()._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in _subtree_after(plan, "MapInPandas")


def test_adversarial_payloads_flow_through(spark):
    """Truncated / empty / None payloads (and null geometry) must produce
    rows, not stage failures — the decode seam sees raw landing bytes."""
    from pyspark.sql import Row

    from dataplatform_cdc_pipeline_spark.operators.multimodal import (
        ASSET_SCHEMA,
        content_hash,
        resize_images,
    )

    rows = [
        (1, "image", b"", 10, 10, None, "png"),          # empty bytes
        (2, "image", b"\x89PN", 10, 10, None, "png"),    # truncated magic
        (3, "image", None, None, None, None, "png"),     # NULL payload
        (4, "audio", b"\x00" * 3, None, None, 100, "pcm"),
    ]
    df = spark.createDataFrame(rows, ASSET_SCHEMA)

    feats = {r["asset_id"]: r for r in extract_features(df).collect()}
    assert set(feats) == {1, 2, 3, 4}
    assert feats[1]["n_bytes"] == 0 and feats[3]["n_bytes"] == 0
    assert feats[3]["content_hash"] == content_hash(None)
    assert all(len(r["features"]) == FEATURE_DIM for r in feats.values())

    resized = {r["asset_id"]: r for r in resize_images(df, 8, 8).collect()}
    assert set(resized) == {1, 2, 3}  # image rows only
    assert (resized[3]["new_width"], resized[3]["new_height"]) == (8, 8)
    assert all(r["payload"] is not None for r in resized.values())


def test_audio_segment_plan_tail_coverage(spark):
    """Overlapping windows cover the full duration: aligned starts plus a
    tail-anchored final window; short audio yields one partial window."""
    from pyspark.sql import types as T

    from dataplatform_cdc_pipeline_spark.operators.multimodal import (
        ASSET_SCHEMA,
        audio_segment_plan,
    )

    rows = [
        (1, "audio", b"x", None, None, 2500, "pcm"),  # tail anchor at 500
        (2, "audio", b"x", None, None, 1000, "pcm"),  # shorter than segment
        (3, "audio", b"x", None, None, 4000, "pcm"),  # aligned: 0,1000,1500
        (4, "image", b"x", 10, 10, None, "png"),      # filtered out
    ]
    df = spark.createDataFrame(rows, ASSET_SCHEMA)
    out = audio_segment_plan(df, segment_ms=2000, hop_ms=1000).collect()
    by_asset = {}
    for r in out:
        by_asset.setdefault(r["asset_id"], []).append((r["start_ms"], r["end_ms"]))
    for v in by_asset.values():
        v.sort()
    assert by_asset[1] == [(0, 2000), (500, 2500)]
    assert by_asset[2] == [(0, 1000)]
    assert by_asset[3] == [(0, 2000), (1000, 3000), (2000, 4000)]
    assert 4 not in by_asset
