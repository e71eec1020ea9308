"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. The decode kernels themselves are STUBBED (the
sandbox has no image/audio libraries): ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, in which case a deterministic
fake decoder (seeded from the payload hash) exercises the full Spark-side
plumbing — schema, batch shapes, partition sizing — which is the part that
matters at 100 TB.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (ArrayType, BinaryType, DoubleType, IntegerType,
                               LongType, StringType, StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),       # image | audio | video
    StructField("payload", BinaryType()),    # opaque encoded bytes
    StructField("mime", StringType()),
    StructField("width", IntegerType()),     # typed metadata (nullable)
    StructField("height", IntegerType()),
    StructField("duration_ms", LongType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("feature", ArrayType(DoubleType())),
    StructField("decode_ok", IntegerType()),
])


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, 128 + (i % 64), dtype=np.uint8).tobytes()
        rows.append((i, kind, payload, f"application/x-fake-{kind}",
                     32 + i % 8 if kind != "audio" else None,
                     24 + i % 8 if kind != "audio" else None,
                     1000 * (i % 30) if kind != "image" else None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """STUB: real deployments plug Pillow/libvips here. ``fake=True`` returns
    a deterministic pseudo-image seeded by the payload digest."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image library not present in this "
            "environment; pass fake=True for the deterministic test decoder")
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.random((8, 8, 3))


def extract_features(media: DataFrame, fake: bool = True,
                     feature_dim: int = 16) -> DataFrame:
    """Arrow-batched decode + feature extraction. Per-batch numpy; failures
    degrade to decode_ok=0 rows (mirroring the reference's parse-failure
    degradation, ``ParseTask.java:68-77``), never exceptions."""

    def feats(it):
        for pdf in it:
            out_feats, ok = [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                try:
                    if kind == "image":
                        img = decode_image(bytes(payload), fake=fake)
                        v = img.mean(axis=(0, 1)).tolist()
                        v = (v * ((feature_dim // len(v)) + 1))[:feature_dim]
                    else:
                        digest = hashlib.sha256(bytes(payload)).digest()
                        v = [b / 255.0 for b in digest[:feature_dim]]
                    out_feats.append([float(x) for x in v])
                    ok.append(1)
                except NotImplementedError:
                    out_feats.append([0.0] * feature_dim)
                    ok.append(0)
            yield pd.DataFrame({"media_id": pdf["media_id"].astype("int64"),
                                "kind": pdf["kind"], "feature": out_feats,
                                "decode_ok": ok})

    return media.mapInPandas(feats, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts) — pure
    built-in ``sequence``/``explode``; the actual frame decode would be the
    stubbed kernel above."""
    vids = media.filter(F.col("kind") == "video")
    return (vids.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)),
                             F.lit(every_ms))).alias("frame_ts_ms")))
