"""Multimodal column operators: decode / feature-extract / resize /
frame-sample over opaque binary or media_ref columns.

The container has no image/audio libraries, so the DECODE step is
stubbed (deterministic fake, clearly marked) — but the Spark-side
plumbing is real and tested: schemas, partitioning, Arrow UDF
signatures, batch shapes. A deployment swaps `_decode_fake` for a
PIL/ffmpeg call without touching anything else.

Media rides through the linkage pipeline untouched inside the spans
array (the per-row invariant); these operators act on the exploded
media_spans view (sources.documents.media_spans).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_META_SCHEMA = ("width int, height int, n_channels int, "
                     "format string, ok boolean")
FEATURE_DIM = 32


def _decode_fake(ref: str) -> tuple[int, int, int, str]:
    """Deterministic stand-in for an image decoder: dimensions derived
    from the media_ref hash. Real impl: PIL.Image.open on fetched bytes.
    STUB — no pixel data exists in this environment."""
    h = hashlib.md5(ref.encode()).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192, 3, ["jpeg", "png", "pdf"][h[2] % 3]


def with_media_metadata(media: DataFrame,
                        ref_col: str = "media_ref") -> DataFrame:
    """Adds width/height/n_channels/format via mapInPandas (batch-shaped
    like a real decode: one Arrow batch in, one out)."""
    def run(it):
        for pdf in it:
            refs = pdf[ref_col].fillna("")
            meta = [_decode_fake(r) if r else (0, 0, 0, "none") for r in refs]
            m = pd.DataFrame(meta, columns=["width", "height",
                                            "n_channels", "format"])
            m["ok"] = refs.to_numpy() != ""
            yield pd.concat([pdf.reset_index(drop=True), m], axis=1)

    schema = ", ".join(f"{n} {t}" for n, t in media.dtypes) + ", " + \
        MEDIA_META_SCHEMA
    return media.mapInPandas(run, schema=schema)


def with_media_features(media: DataFrame, ref_col: str = "media_ref",
                        dim: int = FEATURE_DIM) -> DataFrame:
    """Adds a deterministic feature vector per media item (stand-in for
    a CNN/CLIP embedding; real impl swaps the hash for a model forward
    pass on the decoded tensor). Arrow-batched."""
    def run(it):
        for pdf in it:
            refs = pdf[ref_col].fillna("").to_numpy()
            feats = np.zeros((len(refs), dim), dtype=np.float32)
            for i, r in enumerate(refs):
                if not r:
                    continue
                seed = int.from_bytes(
                    hashlib.md5(r.encode()).digest()[:8], "little") % (2**32)
                feats[i] = np.random.RandomState(seed).standard_normal(dim)
            n = np.linalg.norm(feats, axis=1, keepdims=True)
            feats = feats / np.maximum(n, 1e-12)
            out = pdf.reset_index(drop=True)
            out["media_embedding"] = [row.tolist() for row in feats]
            yield out

    schema = ", ".join(f"{n} {t}" for n, t in media.dtypes) + \
        ", media_embedding array<float>"
    return media.mapInPandas(run, schema=schema)


def resize_spec(media: DataFrame, target_w: int = 224,
                target_h: int = 224) -> DataFrame:
    """Resize planning as column math on decoded metadata (scale factor,
    letterbox padding). The pixel resample itself would live in the same
    mapInPandas as the decode; the plan columns are what downstream
    training shards consume."""
    scale = F.least(F.lit(target_w) / F.greatest("width", F.lit(1)),
                    F.lit(target_h) / F.greatest("height", F.lit(1)))
    return (media
            .withColumn("resize_scale", scale)
            .withColumn("resized_w",
                        F.round(F.col("width") * scale).cast("int"))
            .withColumn("resized_h",
                        F.round(F.col("height") * scale).cast("int"))
            .withColumn("pad_x", (F.lit(target_w) - F.col("resized_w")) / 2)
            .withColumn("pad_y", (F.lit(target_h) - F.col("resized_h")) / 2))


def frame_sample_plan(media: DataFrame, every_n: int = 30,
                      max_frames: int = 8) -> DataFrame:
    """Frame-sampling plan for video refs: frame indices as an exploded
    column (sequence/explode — no UDF). Fake duration derives from the
    metadata width (deterministic stand-in for container probing)."""
    n_frames = F.least(F.lit(max_frames),
                       F.greatest((F.col("width") * 4) / every_n, F.lit(1))
                       .cast("int"))
    return (media
            .withColumn("frame_idx",
                        F.explode(F.sequence(
                            F.lit(0), (n_frames - 1) * every_n,
                            F.lit(every_n)))))
