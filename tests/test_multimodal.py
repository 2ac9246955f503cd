"""Multimodal plumbing: routing, asset schema, batched feature stage
(decode itself is stubbed — no image libs in this container)."""

import numpy as np
import pytest


def test_decode_stub_raises_without_fake():
    from code_indexer_spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"bytes")


def test_decode_fake_deterministic_unit_norm():
    from code_indexer_spark.operators.multimodal import decode_image

    a = decode_image(b"payload", deterministic_fake=True)
    b = decode_image(b"payload", deterministic_fake=True)
    assert np.array_equal(a, b) and a.dtype == np.float32 and len(a) == 16
    assert abs(float(np.linalg.norm(a)) - 1.0) < 1e-5
    assert not np.array_equal(a, decode_image(b"other", deterministic_fake=True))


def test_routing_and_features(spark, kg_small):
    import pyspark.sql.functions as F

    from code_indexer_spark.operators.extract import extract_stage
    from code_indexer_spark.operators.multimodal import (
        image_features_stage, route_multimodal, synth_assets, validate_assets)

    pages = extract_stage(spark.read.parquet(f"{kg_small}/pages.parquet"))
    text_only, with_imgs = route_multimodal(pages)
    n_img = with_imgs.count()
    assert n_img > 0 and text_only.count() + n_img == pages.count()

    assets = synth_assets(with_imgs)
    assert assets.schema["content"].dataType.typeName() == "binary"

    validated = validate_assets(assets)
    reasons = {r["skip_reason"] for r in validated.collect()}
    assert None in reasons  # valid images exist
    assert "unsupported_format" in reasons  # .svg fixture asset

    feats = image_features_stage(validated.filter("is_valid"))
    row = feats.first()
    assert len(row["features"]) == 16 and row["n_bytes"] == 16

    # same asset path -> same deterministic features everywhere
    two = (feats.groupBy("asset_path")
           .agg(F.countDistinct(F.md5(F.concat_ws(",", F.transform(
               "features", lambda x: F.round(x, 5).cast("string")))))
               .alias("n"))
           .filter(F.col("n") > 1).count())
    assert two == 0


def test_resize_and_frame_sample_stages(spark):
    """Resize (1:1) and video frame-sample (row-expanding) plumbing:
    schemas, deterministic fake decode, expansion arithmetic."""
    import pyspark.sql.functions as F

    from code_indexer_spark.operators.multimodal import (
        resize_images_stage, sample_frames_stage)

    assets = spark.createDataFrame(
        [
            ("u1", "a/x.png", "image", b"imgbytes-1", 10, "png"),
            ("u1", "a/y.jpg", "image", b"imgbytes-22", 11, "jpg"),
            ("u2", "v/clip.mp4", "video", b"Z" * 9, 9, "mp4"),
            ("u3", "v/long.mp4", "video", b"Q" * 119, 119, "mp4"),
            ("u4", "s/track.mp3", "audio", b"audio", 5, "mp3"),
        ],
        ["url", "asset_path", "kind", "content", "content_len", "fmt"])

    resized = resize_images_stage(assets, width=64, height=64)
    rows = resized.collect()
    assert {r.asset_path for r in rows} == {"a/x.png", "a/y.jpg"}
    assert all(r.width == 64 and r.height == 64 and len(r.content) == 16
               for r in rows)
    # deterministic: same input -> same bytes
    again = {r.asset_path: bytes(r.content)
             for r in resize_images_stage(assets, 64, 64).collect()}
    assert {r.asset_path: bytes(r.content) for r in rows} == again

    frames = sample_frames_stage(assets, fps=0.5, max_frames=16)
    by_path = {}
    for r in frames.collect():
        by_path.setdefault(r.asset_path, []).append(r)
    # only video rows expand; fake duration = len%120+1 s at 0.5 fps
    assert set(by_path) == {"v/clip.mp4", "v/long.mp4"}
    assert len(by_path["v/clip.mp4"]) == int((9 % 120 + 1) * 0.5)
    assert len(by_path["v/long.mp4"]) == 16  # capped at max_frames
    fr = sorted(by_path["v/long.mp4"], key=lambda r: r.frame_index)
    assert [r.frame_index for r in fr] == list(range(16))
    assert fr[1].ts_offset_s == 2.0  # 1/fps spacing
    assert len({bytes(r.frame) for r in fr}) == 16  # distinct frames
