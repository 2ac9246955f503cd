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
