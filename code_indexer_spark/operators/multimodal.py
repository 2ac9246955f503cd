"""Multimodal columns: images/audio/video as opaque binary + typed
metadata (E5 routing in SURVEY.md §2.3; reference multimodal pipeline
file_chunking_manager.py:482-778, image validation
image_extractor.py:69-122).

The image/audio decode libraries are NOT in this container, so the
decode kernels are STUBS: `decode_image` raises NotImplementedError
unless `deterministic_fake=True`, in which case it produces a seeded
fake feature tensor from the bytes' md5 — the Spark-side plumbing
(schemas, mapInPandas batch shape, partitioning, routing) is real and
tested either way.

Asset table schema (what a 100 TB crawl would carry):
  assets(url, asset_path, kind, content binary, content_len, fmt)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

ASSET_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("asset_path", StringType()),
        StructField("kind", StringType()),
        StructField("content", BinaryType()),
        StructField("content_len", LongType()),
        StructField("fmt", StringType()),
    ]
)

FEATURE_DIM = 16


def decode_image(content: bytes, deterministic_fake: bool = False) -> np.ndarray:
    """STUB: real impl would decode + resize + feature-extract (PIL /
    torchvision are not installed here). The fake path is deterministic:
    16 floats derived from md5(content), unit-normalized."""
    if not deterministic_fake:
        raise NotImplementedError(
            "image decode requires PIL/torchvision (not in this container); "
            "pass deterministic_fake=True for the plumbing-test path"
        )
    d = hashlib.md5(content or b"").digest()
    v = np.frombuffer(d, dtype=np.uint8).astype(np.float32)
    v = v - v.mean()
    n = float(np.sqrt((v * v).sum()))
    return (v / n if n > 0 else v).astype(np.float32)


def route_multimodal(extracted_pages: DataFrame) -> tuple[DataFrame, DataFrame]:
    """E5 routing: pages with images[] branch to the multimodal pipeline;
    text-only pages stay on the text path (reference:
    file_chunking_manager.py:482-499)."""
    with_imgs = extracted_pages.filter(F.size("images") > 0)
    text_only = extracted_pages.filter(F.size("images") == 0)
    return text_only, with_imgs


def synth_assets(extracted_pages: DataFrame) -> DataFrame:
    """Derive an assets table from extracted image paths: content is a
    deterministic per-path fake payload (md5-seeded) standing in for the
    fetched bytes; real crawls join against a WARC asset store."""
    exploded = extracted_pages.select(
        "url", F.explode("images").alias("asset_path")
    )
    return exploded.select(
        "url",
        "asset_path",
        F.lit("image").alias("kind"),
        F.to_binary(F.md5("asset_path"), F.lit("hex")).alias("content"),
        F.length(F.to_binary(F.md5("asset_path"), F.lit("hex")))
        .cast("long").alias("content_len"),
        F.lower(F.regexp_extract("asset_path", r"\.([A-Za-z0-9]+)$", 1))
        .alias("fmt"),
    )


FEATURES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("asset_path", StringType()),
        StructField("fmt", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def image_features_stage(assets: DataFrame,
                         deterministic_fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary content — the real
    Arrow batch shape a GPU/CPU decode stage would use (batched bytes
    in, fixed-dim float vectors out)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_image(c, deterministic_fake=deterministic_fake).tolist()
                for c in pdf["content"]
            ]
            out = pdf[["url", "asset_path", "fmt"]].copy()
            out["n_bytes"] = [len(c or b"") for c in pdf["content"]]
            out["features"] = feats
            yield out

    return assets.filter(F.col("kind") == "image").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def validate_assets(assets: DataFrame,
                    max_bytes: int = 10 * 1024 * 1024) -> DataFrame:
    """P5 image validation as columns: format allowlist + size cap,
    skip_reason enum per image_extractor.py:69-122 (existence/boundary
    checks are upstream in path resolution)."""
    ok_fmt = F.col("fmt").isin("png", "jpg", "jpeg", "webp", "gif")
    reason = (
        F.when(~ok_fmt, F.lit("unsupported_format"))
        .when(F.col("content_len") > max_bytes, F.lit("oversized"))
        .otherwise(F.lit(None).cast("string"))
    )
    return assets.withColumn("skip_reason", reason).withColumn(
        "is_valid", F.col("skip_reason").isNull()
    )
